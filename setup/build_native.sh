#!/usr/bin/env bash
# Build the native host-side data-pipeline library.
# (The reference's setup/install_flownet2_deps.sh built its CUDA extensions;
# the TPU compute kernels here need no build — they are XLA/Pallas — this
# is the C++ input-pipeline runtime.)
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fopenmp -shared -fPIC \
    understanding_flow_robustness_tpu/native/src/ufr_native.cpp \
    -o understanding_flow_robustness_tpu/native/_ufr_native.so
echo "built understanding_flow_robustness_tpu/native/_ufr_native.so"
