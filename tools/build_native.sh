#!/bin/bash
# Build the native data-loading library (native/fastload.cpp → libfastload.so).
set -e
HERE=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$HERE/native/build"
g++ -O3 -shared -fPIC -std=c++17 \
    "$HERE/native/fastload.cpp" -o "$HERE/native/build/libfastload.so"
echo "built $HERE/native/build/libfastload.so"
