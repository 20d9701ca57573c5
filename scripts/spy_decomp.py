"""SpyNet + FlowNet2 residual cost decomposition.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/spy_decomp.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models.flownet2 import FlowNet2
from understanding_flow_robustness_tpu.ops.interp import resize_bilinear
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)

# resize_bilinear at SpyNet per-level geometries (flow C=2, x2 upsample)
for (h, w) in ((192, 640), (96, 320), (48, 160)):
    x = jnp.asarray(rng.rand(8, h, w, 2).astype(np.float32))
    dt = timed_loop(
        lambda v: resize_bilinear(v, 2 * h, 2 * w, align_corners=True),
        (x,), n=20,
    )
    print(f"resize x2 {h}x{w} C2 b8: {dt*1000:.2f} ms", flush=True)

# FlowNetC x4 final upsample geometry (C=2, 96x320 -> 384x1280)
x = jnp.asarray(rng.rand(8, 96, 320, 2).astype(np.float32))
dt = timed_loop(lambda v: resize_bilinear(v, 384, 1280, align_corners=False),
                (x,), n=20)
print(f"resize x4 96x320 C2 b8: {dt*1000:.2f} ms", flush=True)

# SpyNet Basic conv stack standalone at full res (input 8ch)
from flax import linen as nn


class Basic(nn.Module):
    @nn.compact
    def __call__(self, x):
        for cout, name in ((32, "c1"), (64, "c2"), (32, "c3"), (16, "c4"),
                           (2, "c5")):
            x = nn.Conv(cout, (7, 7), padding=3, name=name)(x)
            if name != "c5":
                x = nn.relu(x)
        return x


basic = Basic()
x = jnp.asarray(rng.rand(8, 384, 1280, 8).astype(np.float32))
v = jax.jit(basic.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 8)))
dt = timed_loop(lambda a, vv: basic.apply(vv, a), (x, v), n=10)
print(f"SpyNet Basic stack 384x1280 b8: {dt*1000:.2f} ms", flush=True)
xb = x.astype(jnp.bfloat16)


class BasicBf16(nn.Module):
    @nn.compact
    def __call__(self, x):
        for cout, name in ((32, "c1"), (64, "c2"), (32, "c3"), (16, "c4"),
                           (2, "c5")):
            x = nn.Conv(cout, (7, 7), padding=3, name=name,
                        dtype=jnp.bfloat16)(x)
            if name != "c5":
                x = nn.relu(x)
        return x


bb = BasicBf16()
dt = timed_loop(lambda a, vv: bb.apply(vv, a), (x, v), n=10)
print(f"SpyNet Basic stack bf16 384x1280 b8: {dt*1000:.2f} ms", flush=True)

# FlowNet2 bf16 cascade
for d in (None, jnp.bfloat16):
    mod = FlowNet2(dtype=d)
    vv = jax.jit(mod.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    a = jnp.asarray(rng.rand(8, 384, 1280, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(8, 384, 1280, 3).astype(np.float32))
    dt = timed_loop(lambda p, q, w: mod.apply(w, p, q), (a, b, vv), n=10)
    print(f"FlowNet2 dtype={d} b8: {dt*1000:.2f} ms = {8/dt:.1f} pairs/s",
          flush=True)
print("done", flush=True)
