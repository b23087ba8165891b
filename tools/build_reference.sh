#!/bin/bash
# Build the reference agc binary (/root/reference) for cross-tool interop
# tests, against SYSTEM zstd/zlib/libdeflate (the 3rd_party submodules are
# not vendored in this environment). raduls is stubbed via the reference's
# own NO_RADULS flag (std::sort fallback, agc_compressor.cpp:24-38).
#
# Output: /tmp/refbuild/bin/agc  (the default $AGC_REF_BIN the tests probe).
# Usage: tools/build_reference.sh   (idempotent; object files are cached)
set -e
SRC=/root/reference/src
TP=/root/reference/3rd_party
OUT=${REFBUILD_DIR:-/tmp/refbuild}
mkdir -p "$OUT/bin" "$OUT/obj" "$OUT/shim/zstd/lib"
# the reference includes <zstd/lib/zstd.h>; point it at the system header
echo '#include <zstd.h>' > "$OUT/shim/zstd/lib/zstd.h"
FLAGS="-O2 -std=c++20 -DNO_RADULS -I$OUT/shim -I$TP -I$SRC -pthread"
cd "$OUT/obj"
# bounded parallelism: an unbounded `&` fan-out (~20 g++ at ~1 GB each)
# can OOM on small boxes, silently killing compiles and failing the link
JOBS=${REFBUILD_JOBS:-2}
n=0
for f in $SRC/core/*.cpp $SRC/common/*.cpp $SRC/app/*.cpp; do
  o=$(basename "$f" .cpp).o
  if [ ! -f "$o" ] || [ "$f" -nt "$o" ]; then
    g++ $FLAGS -c "$f" -o "$o" &
    n=$((n + 1))
    if [ "$n" -ge "$JOBS" ]; then wait -n; n=$((n - 1)); fi
  fi
done
wait
g++ $FLAGS "$OUT"/obj/*.o -o "$OUT/bin/agc" -lzstd -lz -ldeflate
"$OUT/bin/agc" 2>&1 | head -1
echo "built: $OUT/bin/agc"
