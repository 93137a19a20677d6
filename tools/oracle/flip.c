#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "align.h"
int main(void)
{ int alen, blen, abpos, aepos, bbpos, bepos, comp, full, tlen;
  while (scanf("%d %d %d %d %d %d %d %d %d", &alen,&blen,&abpos,&aepos,
               &bbpos,&bepos,&comp,&full,&tlen) == 9)
    { Path path; Alignment aln;
      int *tr = malloc(sizeof(int)*(tlen+1));
      for (int i = 0; i < tlen; i++) scanf("%d", tr+i);
      memset(&aln,0,sizeof(aln)); memset(&path,0,sizeof(path));
      path.abpos=abpos; path.aepos=aepos; path.bbpos=bbpos; path.bepos=bepos;
      path.trace = tr; path.tlen = tlen;
      aln.path=&path; aln.alen=alen; aln.blen=blen;
      aln.flags = comp ? COMP_FLAG : 0;
      Flip_Alignment(&aln, full);
      printf("%d %d %d %d %d %d\n", path.abpos, path.aepos, path.bbpos,
             path.bepos, aln.alen, aln.blen);
      for (int i = 0; i < tlen; i++) printf("%d ", tr[i]);
      printf("\n###\n");
      free(tr);
    }
  return 0;
}
