#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "align.h"
int main(void)
{ int alen, blen, abpos, aepos, bbpos, bepos, task, tspace;
  char sa[2000000];
  scanf("%d %d %d %d %d %d %d %d", &alen,&blen,&abpos,&aepos,&bbpos,&bepos,
        &task,&tspace);
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
  aln.path=&path; aln.aseq=ab; aln.bseq=bb2; aln.alen=alen; aln.blen=blen;
  if (task == 0 || task == 1)   /* PLUS: run DIFF_ONLY first */
    { if (Compute_Alignment(&aln, w, 2, tspace)) { printf("ERR\n"); return 0; }
      printf("D %d\n", path.diffs);
    }
  if (Compute_Alignment(&aln, w, task, tspace)) { printf("ERR\n"); return 0; }
  printf("%d %d\n", path.diffs, path.tlen);
  if (task == 0 || task == 3)
    { int *t = (int *) path.trace;
      for (int i = 0; i < path.tlen; i++) printf("%d ", t[i]);
    }
  else if (task == 1 || task == 4)
    { uint16 *t = (uint16 *) path.trace;
      for (int i = 0; i < path.tlen; i++) printf("%d ", t[i]);
    }
  printf("\n");
  return 0;
}
