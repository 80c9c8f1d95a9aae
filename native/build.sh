#!/bin/sh
# Build the native audio module into csm_mlx_tpu/utils/_audio_native.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o ../csm_mlx_tpu/utils/_audio_native.so audio_native.cpp
echo "built ../csm_mlx_tpu/utils/_audio_native.so"
