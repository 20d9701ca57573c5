#!/usr/bin/env bash
# Pre-build the native host-side data-pipeline libraries into the hash-keyed
# cache that native/__init__.py and native/loader.py load from (they also
# auto-build lazily on first use; this script just warms the cache, e.g. in
# a container image).  Portable codegen — no -march=native — because the
# cached .so may outlive the host it was built on.
# (The reference's setup/install_flownet2_deps.sh built its CUDA extensions;
# the TPU compute kernels here need no build — they are XLA/Pallas — this
# is the C++ input-pipeline runtime.)
set -e
cd "$(dirname "$0")/.."
python3 - <<'EOF'
from understanding_flow_robustness_tpu import native
from understanding_flow_robustness_tpu.native import loader

ok1 = native.load() is not None
ok2 = loader.load() is not None
print(f"ufr_native kernels: {'built' if ok1 else 'FAILED (numpy fallbacks active)'}")
print(f"ufr_loader decode pipeline: {'built' if ok2 else 'FAILED (PIL fallbacks active)'}")
EOF
