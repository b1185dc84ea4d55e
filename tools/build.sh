#!/bin/bash
# Build the native C++ rigid-body runtime (native/rbd.cpp -> librbd.so).
# The python package also builds it lazily on first import
# (gato_tpu/native/__init__.py); this script just does it ahead of time.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 -o native/librbd.so native/rbd.cpp
echo "built native/librbd.so"
