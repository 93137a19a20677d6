#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "align.h"
int main(void)
{ int alen, blen, abpos, aepos, bbpos, bepos, ntp, mode;
  char sa[2000000];
  scanf("%d %d %d %d %d %d %d %d", &alen,&blen,&abpos,&aepos,&bbpos,&bepos,&ntp,&mode);
  uint16 *tp = malloc(sizeof(uint16)*2*(ntp+1));
  for (int i = 0; i < ntp; i++)
    { int a, b; scanf("%d %d", &a, &b); tp[2*i] = a; tp[2*i+1] = b; }
  char *ab0 = malloc(alen+64), *bb0 = malloc(blen+64);
  char *ab = ab0+32, *bb2 = bb0+32;
  memset(ab0, 4, 32); memset(bb0, 4, 32);
  memset(ab+alen, 4, 32); memset(bb2+blen, 4, 32);
  scanf("%s", sa);
  for (int i = 0; i < alen; i++) ab[i] = (char)(strchr("acgt", sa[i]) - "acgt");
  scanf("%s", sa);
  for (int i = 0; i < blen; i++) bb2[i] = (char)(strchr("acgt", sa[i]) - "acgt");
  Work_Data *w = New_Work_Data();
  Path path; Alignment aln;
  memset(&aln,0,sizeof(aln)); memset(&path,0,sizeof(path));
  path.abpos=abpos; path.aepos=aepos; path.bbpos=bbpos; path.bepos=bepos;
  path.trace = tp; path.tlen = 2*ntp;
  aln.path=&path; aln.aseq=ab; aln.bseq=bb2; aln.alen=alen; aln.blen=blen;
  if (Compute_Trace_IRR(&aln, w, mode, 1, -1)) { printf("ERR\n"); return 0; }
  printf("%d %d\n", path.diffs, path.tlen);
  int *t = (int *) path.trace;
  for (int i = 0; i < path.tlen; i++) printf("%d ", t[i]);
  printf("\n");
  return 0;
}
