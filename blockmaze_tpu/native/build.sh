#!/bin/bash
# Build the native key parser. The image ships libgmp.so.10 but no -dev
# package, so the header comes from reference_harness/shims/gmp.h and the
# runtime library is linked by absolute path.
set -e
cd "$(dirname "$0")"
g++ -std=c++17 -O2 -fPIC -shared keyparse.cpp -o libbmtpu_native.so \
    -I ../../reference_harness/shims \
    /usr/lib/x86_64-linux-gnu/libgmp.so.10 -Wl,--no-undefined
echo "built $(pwd)/libbmtpu_native.so"
