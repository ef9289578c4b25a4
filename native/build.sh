#!/bin/sh
# Build the native front end shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -Wall -shared -fPIC -std=c++17 dftpav_native.cpp -o libdftpav_native.so
echo "built $(pwd)/libdftpav_native.so"
