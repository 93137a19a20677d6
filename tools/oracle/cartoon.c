#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "align.h"
int main(void)
{ int alen, blen, abpos, aepos, bbpos, bepos, diffs, comp, indent, coord;
  while (scanf("%d %d %d %d %d %d %d %d %d %d", &alen,&blen,&abpos,&aepos,
               &bbpos,&bepos,&diffs,&comp,&indent,&coord) == 10)
    { Path path; Alignment aln;
      memset(&aln,0,sizeof(aln)); memset(&path,0,sizeof(path));
      path.abpos=abpos; path.aepos=aepos; path.bbpos=bbpos; path.bepos=bepos;
      path.diffs=diffs;
      aln.path=&path; aln.alen=alen; aln.blen=blen;
      aln.flags = comp ? COMP_FLAG : 0;
      Alignment_Cartoon(stdout,&aln,indent,coord);
      printf("###\n");
    }
  return 0;
}
