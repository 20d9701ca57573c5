"""FlowNet2 end-to-end at the bench geometry (fresh process).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fn2_e2e.py
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models.registry import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W = 8, 384, 1280
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

fn2 = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128))
dt = timed_loop(lambda aa, bb, vv: fn2.predict_fn(vv, aa, bb),
                (a, b, fn2.variables), n=10)
print(f"FlowNet2 e2e: {dt*1000:.2f} ms = {B/dt:.1f} pairs/s", flush=True)
