#!/bin/sh
# Build the native data loader: produces native/libvctloader.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libvctloader.so loader.cpp \
    -ljpeg -lpthread
echo "built $(pwd)/libvctloader.so"
