#!/bin/sh
# Build the native data-pipeline library next to this script.
set -e
cd "$(dirname "$0")"
# -ffast-math: required for gcc to vectorize the float reductions (mel
# dot products) and sqrt loops; parity vs the numpy path stays <1e-6.
g++ -O3 -march=native -ffast-math -shared -fPIC -std=c++17 -o libflowtron_native.so mel.cpp -lpthread
echo "built $(pwd)/libflowtron_native.so"
