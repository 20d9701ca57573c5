"""TPU bench: tiled warp kernel vs gather warp, standalone + e2e zoo.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/warp_bench.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.ops.interp import (
    bilinear_sample, bilinear_sample_auto, coords_grid, warp_backward,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
H, W = 384, 1280
rng = np.random.RandomState(0)

for B in (1, 8):
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32) * 20)
    base = coords_grid(H, W)[None]
    sx = jnp.clip(base[..., 0] + flow[..., 0], 0, W - 1)
    sy = jnp.clip(base[..., 1] + flow[..., 1], 0, H - 1)

    dt = timed_loop(
        lambda i, x, y: bilinear_sample_auto(i, x, y, "border"),
        (img, sx, sy), n=20,
    )
    print(f"tiled warp b{B}: {dt*1000:.2f} ms", flush=True)
    out = jax.jit(
        lambda i, x, y: bilinear_sample_auto(i, x, y, "border")
    )(img, sx, sy)
    ref = jax.jit(
        lambda i, x, y: bilinear_sample(i, x, y, "border")
    )(img, sx, sy)
    print(f"  maxdiff vs gather: {float(jnp.abs(out - ref).max()):.2e}",
          flush=True)
    dt = timed_loop(
        lambda i, f: warp_backward(i, f, "border"), (img, flow), n=20
    )
    print(f"warp_backward(auto) b{B}: {dt*1000:.2f} ms", flush=True)

# e2e zoo: SPyNet + FlowNet2 forward
from understanding_flow_robustness_tpu.models import fetch_model

for name in ("SpyNet", "FlowNet2"):
    m = fetch_model(name, pretrained_path=None, init_size=(128, 128))
    a = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    dt = timed_loop(
        lambda x, y, v: m.predict_fn(v, x, y), (a, b, m.variables), n=10
    )
    print(f"{name} fwd b8: {dt*1000:.2f} ms = {8/dt:.1f} pairs/s", flush=True)
print("done", flush=True)
