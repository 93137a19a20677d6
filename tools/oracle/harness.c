/* Oracle harness over reference align.c Compute_Trace_X / middle paths.
   stdin: mode line "MID|PTS tspace mode dlow dhgh"
          then: alen blen abpos aepos bbpos bepos ntp
          then ntp lines: "d b"
          then A bases (alen chars of acgt), B bases
   stdout: diffs, tlen, trace ints */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "align.h"

int main(void)
{ char kind[8];
  int tspace, mode, dlow, dhgh;
  int alen, blen, abpos, aepos, bbpos, bepos, ntp;
  scanf("%7s %d %d %d %d", kind, &tspace, &mode, &dlow, &dhgh);
  scanf("%d %d %d %d %d %d %d", &alen, &blen, &abpos, &aepos, &bbpos, &bepos, &ntp);
  uint16 *tp = malloc(sizeof(uint16)*2*(ntp+1));
  for (int i = 0; i < ntp; i++)
    { int d, b; scanf("%d %d", &d, &b); tp[2*i] = d; tp[2*i+1] = b; }
  char *ab = malloc(alen+2), *bb2 = malloc(blen+2);
  char sa[2000000];
  scanf("%s", sa);
  for (int i = 0; i < alen; i++) ab[i] = (char)(strchr("acgt", sa[i]) - "acgt");
  scanf("%s", sa);
  for (int i = 0; i < blen; i++) bb2[i] = (char)(strchr("acgt", sa[i]) - "acgt");

  Work_Data *w = New_Work_Data();
  Path path;
  Alignment aln;
  memset(&aln, 0, sizeof(aln));
  path.trace = tp; path.tlen = 2*ntp; path.diffs = 0;
  path.abpos = abpos; path.aepos = aepos; path.bbpos = bbpos; path.bepos = bepos;
  aln.path = &path; aln.aseq = ab; aln.bseq = bb2; aln.alen = alen; aln.blen = blen;
  int r;
  if (strcmp(kind, "MID") == 0)
    r = Compute_Trace_MID(&aln, w, tspace, mode, dlow, dhgh);
  else
    r = Compute_Trace_PTS(&aln, w, tspace, mode, dlow, dhgh);
  if (r) { printf("ERR\n"); return 0; }
  printf("%d %d\n", path.diffs, path.tlen);
  int *t = (int *) path.trace;
  for (int i = 0; i < path.tlen; i++) printf("%d ", t[i]);
  printf("\n");
  return 0;
}
