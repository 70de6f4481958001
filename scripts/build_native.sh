#!/bin/sh
# Build the native batch-ops shared library.
set -e
cd "$(dirname "$0")/.."
mkdir -p ddpm_tpu/native/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    ddpm_tpu/native/batchops.cpp -o ddpm_tpu/native/lib/libbatchops.so
echo "built ddpm_tpu/native/lib/libbatchops.so"
