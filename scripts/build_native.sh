#!/usr/bin/env bash
# Build the native DSP library (native/fastdsp.cpp -> native/libfastdsp.so).
# Loaded lazily via ctypes (utils/audio/native.py); everything falls back to
# the numpy path when the .so is absent.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    native/fastdsp.cpp -o native/libfastdsp.so
echo "built native/libfastdsp.so"
