#!/bin/bash
# Build the reference libsnark-vnt circuit libraries and standalone binaries
# WITHOUT the reference CMake build (the image lacks gmp/boost/procps dev
# packages). We compile the read-only sources at /root/reference directly,
# using our shim headers (reference_harness/shims) and linking the system
# libgmp.so.10.
#
# Outputs (in reference_harness/build/):
#   libzk_{mint,send,deposit,redeem}.so  — C ABI proof gen/verify (ctypes-able)
#   {mint,send,deposit,redeem}_key       — keygen binaries (write pk/vk .txt)
#   {mint,send,deposit,redeem}_test      — standalone Setup/prove/verify timers
set -e
cd "$(dirname "$0")"
REF=/root/reference/libsnark-vnt
SHIMS=$PWD/shims
OUT=$PWD/build
mkdir -p "$OUT"

GMPLIB=/usr/lib/x86_64-linux-gnu/libgmp.so.10

build_oracles() {
  # bit-exactness oracles (our own harness code linking the reference stack);
  # each needs its circuit's include dir (Note.h etc.)
  for spec in oracle:mint oracle_send:send oracle_redeem:redeem \
              oracle_deposit:deposit; do
    o=${spec%%:*}; d=${spec##*:}
    if [ ! -f "$OUT/$o" ] || [ "$o.cpp" -nt "$OUT/$o" ]; then
      echo "CXX $o"
      g++ $CXXFLAGS -I"$REF/src/$d" "$o.cpp" "${common_objs[@]}" "$GMPLIB" \
        /lib/x86_64-linux-gnu/libcrypto.so.3 -o "$OUT/$o"
    fi
  done
}

INC="-I$SHIMS -I$REF/src -I$REF/depends/libsnark -I$REF/depends/libsnark/depends/libff -I$REF/depends/libsnark/depends/libfqfft"
DEFS="-DCURVE_ALT_BN128 -DNO_PROCPS"
CXXFLAGS="-std=c++17 -O2 -march=native -w -fPIC $DEFS $INC"

LIBFF=$REF/depends/libsnark/depends/libff/libff

# --- common objects ---
common_objs=()
for src in \
  "$LIBFF/algebra/curves/alt_bn128/alt_bn128_init.cpp" \
  "$LIBFF/algebra/curves/alt_bn128/alt_bn128_g1.cpp" \
  "$LIBFF/algebra/curves/alt_bn128/alt_bn128_g2.cpp" \
  "$LIBFF/algebra/curves/alt_bn128/alt_bn128_pairing.cpp" \
  "$LIBFF/algebra/curves/alt_bn128/alt_bn128_pp.cpp" \
  "$LIBFF/common/profiling.cpp" \
  "$LIBFF/common/utils.cpp" \
  "$LIBFF/common/double.cpp" \
  "$SHIMS/gmp_iostream_shim.cpp" \
  ; do
  obj=$OUT/$(basename "${src%.cpp}").o
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    g++ $CXXFLAGS -c "$src" -o "$obj"
  fi
  common_objs+=("$obj")
done

build_circuit() {
  c=$1
  echo "=== $c ==="
  # shared lib with the cgo C ABI
  if [ ! -f "$OUT/libzk_$c.so" ]; then
    g++ $CXXFLAGS -shared "$REF/src/$c/${c}cgo.cpp" "${common_objs[@]}" \
      "$GMPLIB" /lib/x86_64-linux-gnu/libcrypto.so.3 -o "$OUT/libzk_$c.so"
  fi
  # keygen binary
  if [ ! -f "$OUT/${c}_key" ]; then
    g++ $CXXFLAGS "$REF/src/$c/getpvk.cpp" "${common_objs[@]}" \
      "$GMPLIB" /lib/x86_64-linux-gnu/libcrypto.so.3 -o "$OUT/${c}_key"
  fi
  # standalone test binary
  if [ ! -f "$OUT/${c}_test" ]; then
    g++ $CXXFLAGS "$REF/src/$c/main.cpp" "${common_objs[@]}" \
      "$GMPLIB" /lib/x86_64-linux-gnu/libcrypto.so.3 -o "$OUT/${c}_test"
  fi
}

for c in mint redeem send deposit; do
  build_circuit $c &
done
wait
build_oracles
echo "BUILD OK"
