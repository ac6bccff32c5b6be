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

# reference python package (cffi modules + graph scripts) for the
# head-to-head harness (scripts/ref_vs_mine.py); --with-py to enable.
# The copy's setup.py needs three mechanical fixes for this image:
# versioneer breaks on py3.12 (SafeConfigParser), docopt has no wheel in
# the zero-egress image, and peregrine_base must point at the reference
# tree (the copy has no falcon/ sources).
if [ "$3" = "--with-py" ]; then
  rm -rf "$OUT/py"
  cp -r "$REF/py" "$OUT/py"
  python - "$OUT/py/setup.py" <<'PYEOF'
import sys
p = sys.argv[1]
s = open(p).read()
s = s.replace("import versioneer\n", "")
s = s.replace('os.environ["peregrine_base"] = os.path.abspath(os.path.pardir)',
              'os.environ.setdefault("peregrine_base", "/root/reference")')
s = s.replace("version=versioneer.get_version(),", 'version="0.1.6",')
s = s.replace("cmdclass=versioneer.get_cmdclass(),", "")
s = s.replace('"versioneer==0.18"', "")
s = s.replace('"docopt>=0.6.2",', "")
open(p, "w").write(s)
PYEOF
  (cd "$OUT/py" && peregrine_base="$REF" \
     pip install . --no-build-isolation -q)
  echo "reference python package installed (peregrine)"
fi
