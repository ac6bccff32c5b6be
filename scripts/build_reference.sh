#!/bin/bash
# Build the reference C binaries out-of-tree (for golden-output comparison
# and baseline benchmarking only; never linked into this framework).
set -e
REF=${1:-/root/reference}
OUT=${2:-/root/repo/.ref_build}
mkdir -p "$OUT/src"
cp "$REF"/src/*.c "$REF"/src/*.h "$OUT/src/"
cd "$OUT/src"
CFLAGS="-O3 -Wall"
gcc $CFLAGS -o "$OUT/shmr_mkseqdb" shmr_mkseqdb.c shmr_utils.c kalloc.c -lz
gcc $CFLAGS -o "$OUT/shmr_index" shmr_index.c shmr_utils.c mm_sketch.c shmr_reduce.c shmr_end_filter.c kalloc.c -lz
gcc $CFLAGS -o "$OUT/shmr_overlap" shmr_overlap.c shmr_utils.c DWmatch.c kalloc.c -lz
gcc $CFLAGS -o "$OUT/shmr_dedup" shmr_dedup.c shmr_utils.c kalloc.c -lz
gcc $CFLAGS -o "$OUT/shmr_map" shmr_map.c shmr_utils.c kalloc.c -lz
echo "built into $OUT"
