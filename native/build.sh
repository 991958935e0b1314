#!/bin/bash
# Build the native data-pipeline kernels into a ctypes-loadable .so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 pt_native.cpp -o libpt_native.so
echo "built $(pwd)/libpt_native.so"
