#!/bin/sh
# Build the native data-pipeline library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libflowtron_native.so mel.cpp -lpthread
echo "built $(pwd)/libflowtron_native.so"
