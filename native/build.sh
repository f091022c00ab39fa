#!/bin/sh
# Build the native host-runtime library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -fPIC -shared -o lib/libosf_native.so src/osf_native.cc
echo "built native/lib/libosf_native.so"
