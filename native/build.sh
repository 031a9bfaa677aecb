#!/bin/sh
# Build the native host bitstream codec -> lc3jax/data/liblc3bitstream.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    lc3_bitstream.cc -o ../lc3jax/data/liblc3bitstream.so
echo "built ../lc3jax/data/liblc3bitstream.so"
