"""alt_lookup_bwd standalone at the RAFT TRAIN geometry (batch 4,
288x960 -> 1/8 res 36x120): tile-size scan + slab on/off, smooth vs wild
coords.  The train step runs this kernel 12x (measured 3.37 ms/iter in
the round-3 step trace = 40 ms of the 170 ms step), so standalone wins
here map ~1:1 onto the headline train metric.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bwd_kernel_bench.py
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
    alt_lookup_bwd,
    default_slabs,
    pool_fmap_levels,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", default="128,256")
ap.add_argument("--iters", type=int, default=20)
args = ap.parse_args()

B, H, W, C = 4, 36, 120, 256
N = H * W
R = 4
L = 4
rng = np.random.RandomState(0)

f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
levels = tuple(l.astype(jnp.bfloat16) for l in pool_fmap_levels(f2, L))
shapes = tuple((l.shape[1], l.shape[2]) for l in levels)

grid = np.stack(
    np.meshgrid(np.arange(W), np.arange(H), indexing="xy"), -1
).reshape(N, 2)[None].astype(np.float32)
smooth = jnp.asarray(grid + rng.randn(B, N, 2).astype(np.float32) * 1.5)
wild = jnp.asarray(grid + rng.randn(B, N, 2).astype(np.float32) * 60)

g = np.zeros((B, N, 16, L, 16), np.float32)
g[:, :, :9, :, :9] = rng.randn(B, N, 9, L, 9)
g = jnp.asarray(g.reshape(B, N, 16, L * 16)).astype(jnp.bfloat16)

for tile in (int(t) for t in args.tiles.split(",")):
    slabs = default_slabs(shapes, tile, 2 * R + 1)
    for name, coords in (("smooth", smooth), ("wild", wild)):
        for sl in (None, slabs):
            tag = "slab" if sl else "full"
            if sl and not any(sl):
                continue
            dt = timed_loop(
                lambda f, c, gg: alt_lookup_bwd(
                    f, levels, c, gg, R, tile=tile, slabs=sl)[0],
                (f1, coords, g), n=args.iters)
            print(f"bwd tile={tile:4d} {name:6s} {tag}: "
                  f"{dt*1000:7.3f} ms/iter  (slabs={sl})", flush=True)
