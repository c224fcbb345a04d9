#!/bin/bash
# Build the reference pbrt-v4 oracle binaries (pbrt, imgtool, pbrt_test)
# from /root/reference, whose src/ext submodules are EMPTY in this image.
# System OpenEXR/Imath/zlib/libdeflate plus the API shims in ./shims
# replace them (each shim header documents exactly what it covers; lodepng
# is a real zlib-backed PNG codec, ptex/stb/qoi/nanovdb error at runtime).
#
# Usage:   tools/refbuild/build_reference.sh [BUILD_DIR] [REF_DIR]
# Output:  BUILD_DIR/pbrt, BUILD_DIR/imgtool  (default /tmp/pbrt_ref_build)
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-/tmp/pbrt_ref_build}"
REF="${2:-/root/reference}"

mkdir -p "$BUILD"
cmake -G Ninja -S "$HERE" -B "$BUILD" -DREF="$REF" \
      -DCMAKE_BUILD_TYPE=Release
ninja -C "$BUILD" pbrt imgtool
echo "oracle binaries: $BUILD/pbrt  $BUILD/imgtool"
