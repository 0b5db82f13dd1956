#!/bin/bash
set -e
cd "$(dirname "$0")"
./build_reference.sh
cd prfKey
for c in mint redeem send deposit; do
  if [ ! -f ${c}pk.txt ]; then ../build/${c}_key; fi
done
echo KEYS_DONE
