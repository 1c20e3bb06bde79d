#!/bin/sh
# Build the native fast loader into the package.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 fastloader.cpp -o ../im23d_tpu/data/_fastloader.so -lz -lpthread
echo "built im23d_tpu/data/_fastloader.so"
