#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "align.h"
int main(void)
{ int alen, blen, diag, anti, lbord, hbord, prefix, tspace;
  double erate;
  char sa[2000000];
  scanf("%d %d %d %d %d %d %d %d %lf", &alen,&blen,&diag,&anti,&lbord,&hbord,
        &prefix,&tspace,&erate);
  char *ab0 = malloc(alen+2), *bb0 = malloc(blen+2);
  char *ab = ab0+1, *bb2 = bb0+1;
  ab0[0] = bb0[0] = 4;
  ab[alen] = 4; bb2[blen] = 4;
  scanf("%s", sa);
  for (int i = 0; i < alen; i++) ab[i] = (char)(strchr("acgt", sa[i]) - "acgt");
  scanf("%s", sa);
  for (int i = 0; i < blen; i++) bb2[i] = (char)(strchr("acgt", sa[i]) - "acgt");
  float freq[4] = {0.25, 0.25, 0.25, 0.25};
  Align_Spec *spec = New_Align_Spec(1.0 - erate, tspace, freq, 1);
  Work_Data *w = New_Work_Data();
  Path path; Alignment aln;
  memset(&aln,0,sizeof(aln)); memset(&path,0,sizeof(path));
  aln.path=&path; aln.aseq=ab; aln.bseq=bb2; aln.alen=alen; aln.blen=blen;
  int r = Find_Extension(&aln, w, spec, diag, anti, lbord, hbord, prefix);
  if (r) { printf("ERR\n"); return 0; }
  printf("%d %d %d %d %d %d\n", path.abpos, path.aepos, path.bbpos,
         path.bepos, path.diffs, path.tlen);
  uint16 *t = (uint16 *) path.trace;
  for (int i = 0; i < path.tlen; i++) printf("%d ", t[i]);
  printf("\n");
  return 0;
}
