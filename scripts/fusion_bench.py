"""FlowNetFusion standalone: plain vs s2d path at the bench geometry,
then FlowNet2 end-to-end.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fusion_bench.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models.flownet2 import FlowNetFusion
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W = 8, 384, 1280
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, H, W, 11).astype(np.float32))

m0 = FlowNetFusion(use_s2d=False)
v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)

for s2d in (False, True):
    m = FlowNetFusion(use_s2d=s2d)
    dt = timed_loop(lambda xx, vv: m.apply(vv, xx), (x, v), n=20)
    print(f"fusion use_s2d={s2d}: {dt*1000:.2f} ms", flush=True)

# value check on-chip
o0 = np.asarray(FlowNetFusion(use_s2d=False).apply(v, x))
o1 = np.asarray(FlowNetFusion(use_s2d=True).apply(v, x))
rel = np.abs(o0 - o1).max() / (np.abs(o0).max() + 1e-9)
print(f"s2d-vs-plain rel err: {rel:.2e}", flush=True)

# FlowNet2 end-to-end
from understanding_flow_robustness_tpu.models.registry import fetch_model

fn2 = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128))
a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
dt = timed_loop(lambda aa, bb, vv: fn2.predict_fn(vv, aa, bb),
                (a, b, fn2.variables), n=20)
print(f"FlowNet2 e2e: {dt*1000:.2f} ms = {B/dt:.1f} pairs/s", flush=True)
