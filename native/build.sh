#!/bin/sh
# Build the native mesh kernels shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    mesh_kernels.cpp -o libmeshkernels.so
echo "built $(pwd)/libmeshkernels.so"
