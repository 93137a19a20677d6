#!/bin/sh
# Build the C oracle harnesses against the read-only reference checkout.
# Each harness is a tiny stdin/stdout driver linking the reference's
# align.c + gene_core.c so fastga_tpu goldens can be (re)captured at will.
#
#   REF=/root/reference sh tools/oracle/build.sh [outdir]
#
# Produces: harness extharness wrapharness caharness irrharness cartoon flip
set -e
REF=${REF:-/root/reference}
OUT=${1:-$(dirname "$0")/bin}
SRC=$(dirname "$0")
mkdir -p "$OUT"
for h in harness extharness wrapharness caharness irrharness cartoon flip; do
  gcc -O1 -Wno-unused-result -fno-strict-aliasing -I"$REF" \
      "$SRC/$h.c" "$REF/align.c" "$REF/gene_core.c" \
      -lpthread -lm -lz -o "$OUT/$h"
  echo "built $OUT/$h"
done
