"""Zoo throughput after the tuple-split/no-concat change: the models whose
graphs changed (FlowNet2, PWC-Net, RAFT, FlowNetC, FlowNetS, fusion
standalone).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/zoo_remeasure.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.models.flownet2 import FlowNetFusion
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W = 8, 384, 1280
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

xf = jnp.asarray(rng.rand(B, H, W, 11).astype(np.float32))
mf = FlowNetFusion(use_s2d=True)
vf = jax.jit(FlowNetFusion(use_s2d=False).init)(jax.random.PRNGKey(0), xf)
dt = timed_loop(lambda xx, vv: mf.apply(vv, xx), (xf, vf), n=20)
print(f"fusion s2d+split: {dt*1000:.2f} ms (was 30.1)", flush=True)

for name, note in (("FlowNet2", "was 121.1"), ("PWCNet", "was 59.7"),
                   ("RAFT", "was 146.8"), ("FlowNetC", "was 18.7"),
                   ("FlowNetS", "was 10.0")):
    m = fetch_model(name, pretrained_path=None, init_size=(128, 128))
    dt = timed_loop(lambda x, y, v: m.predict_fn(v, x, y),
                    (a, b, m.variables), n=10)
    print(f"{name}: {dt*1000:.2f} ms = {B/dt:.1f} pairs/s ({note})",
          flush=True)
