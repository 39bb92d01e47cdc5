#!/bin/sh
# Build the native IO runtime: native/libo3r_io.so
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -fPIC -shared -pthread -o libo3r_io.so src/o3r_io.cpp \
    -lpng -ljpeg -lz
echo "built $(pwd)/libo3r_io.so"
