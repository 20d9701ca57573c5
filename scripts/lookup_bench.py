"""alt_lookup standalone at the RAFT KITTI geometry: current cost + the
share of each kernel phase (corr dot, selector hats, selector dots),
estimated by timing variant kernels with phases ablated.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lookup_bench.py
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from understanding_flow_robustness_tpu.ops.pallas.alt_corr import alt_lookup
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W, C = 8, 48, 160, 256
N = H * W
R = 4
rng = np.random.RandomState(0)

f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
levels = []
h, w = H, W
for _ in range(4):
    levels.append(jnp.asarray(
        rng.randn(B, h, w, C).astype(np.float32)).astype(jnp.bfloat16))
    h, w = h // 2, w // 2
levels = tuple(levels)
coords = jnp.asarray(
    np.stack([rng.rand(B, N) * W, rng.rand(B, N) * H], -1).astype(np.float32))

for tile in (128, 256, 512):
    dt = timed_loop(
        lambda f, c: alt_lookup(f, levels, c, R, tile=tile), (f1, coords),
        n=30)
    print(f"alt_lookup tile={tile}: {dt*1000:.3f} ms/iter", flush=True)
