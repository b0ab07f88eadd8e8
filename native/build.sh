#!/usr/bin/env bash
# Build the native host-runtime library (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    gsorb_native.cpp -o libgsorb_native.so
echo "built native/libgsorb_native.so"
