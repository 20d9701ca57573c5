"""Decompose FlowNet2 cascade cost + SpyNet bf16 re-check.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fn2_decomp.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models.flownet2 import (
    FlowNet2CS, FlowNetSD, FlowNetFusion,
)
from understanding_flow_robustness_tpu.models.spynet import SpyNet
from understanding_flow_robustness_tpu.ops import channel_norm, warp_backward
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
H, W = 384, 1280
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))

# warp kernel standalone with moderate flows (no violations expected)
flow = jnp.asarray(rng.randn(8, H, W, 2).astype(np.float32) * 6)
dt = timed_loop(lambda i, f: warp_backward(i, f, "border"), (a, flow), n=20)
print(f"warp(auto,sigma6) b8: {dt*1000:.2f} ms", flush=True)

dt = timed_loop(lambda x: channel_norm(x), (a,), n=20)
print(f"channel_norm b8 3ch: {dt*1000:.2f} ms", flush=True)

for mod, name in ((FlowNet2CS(stages=1), "FlowNet2CS"),
                  (FlowNet2CS(stages=2), "FlowNet2CSS")):
    v = jax.jit(mod.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    dt = timed_loop(lambda x, y, vv: mod.apply(vv, x, y), (a, b, v), n=10)
    print(f"{name} fwd b8: {dt*1000:.2f} ms", flush=True)

# FlowNetSD + Fusion standalone (the two full-res stride-1 heavy nets)
sd = FlowNetSD()
x6 = jnp.concatenate([a, b], axis=-1)
v = jax.jit(sd.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
dt = timed_loop(lambda x, vv: sd.apply(vv, x), (x6, v), n=10)
print(f"FlowNetSD fwd b8: {dt*1000:.2f} ms", flush=True)
fu = FlowNetFusion()
x11 = jnp.asarray(rng.rand(8, H, W, 11).astype(np.float32))
v = jax.jit(fu.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 11)))
dt = timed_loop(lambda x, vv: fu.apply(vv, x), (x11, v), n=10)
print(f"FlowNetFusion fwd b8: {dt*1000:.2f} ms", flush=True)

# SpyNet bf16 now that gathers are gone
for dt_ in (None, jnp.bfloat16):
    mod = SpyNet(nlevels=6) if dt_ is None else SpyNet(nlevels=6, dtype=dt_)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    t = timed_loop(lambda x, y, vv: mod.apply(vv, x, y), (a, b, v), n=10)
    print(f"SpyNet dtype={dt_} fwd b8: {t*1000:.2f} ms = {8/t:.1f} pairs/s",
          flush=True)
print("done", flush=True)
