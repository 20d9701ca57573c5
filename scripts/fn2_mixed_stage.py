"""FlowNet2 staged mixed precision: drift + throughput vs f32.

Stages C and S1 run bf16 compute (their errors are refined by S2 before
reaching the fused output); S2/SD/Fusion stay f32.  Compares against the
blanket-bf16 policy that measured 3.57 % drift (PERF.md) and against f32
throughput.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fn2_mixed_stage.py
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
H, W = 384, 1280
B = 8
a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

m32 = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128))
mmx = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128),
                  mixed_precision=True)

f32 = np.asarray(jax.jit(m32.predict_fn)(m32.variables, a[:2], b[:2]),
                 np.float32)
fmx = np.asarray(jax.jit(mmx.predict_fn)(m32.variables, a[:2], b[:2]),
                 np.float32)
d = np.sqrt(((f32 - fmx) ** 2).sum(-1))
mag = np.sqrt((f32 ** 2).sum(-1))
print(json.dumps({
    "policy": "staged (C+S1 bf16)",
    "epe_drift_mean": round(float(d.mean()), 5),
    "epe_drift_max": round(float(d.max()), 4),
    "rel_drift_mean_pct": round(100 * float(d.mean() / mag.mean()), 3),
    "flow_mag_mean": round(float(mag.mean()), 3),
}), flush=True)

dt = timed_loop(lambda x, y, v: m32.predict_fn(v, x, y),
                (a, b, m32.variables), n=10)
print(json.dumps({"policy": "f32", "ms_per_batch8": round(dt * 1e3, 1),
                  "pairs_per_s": round(B / dt, 1)}), flush=True)
dt = timed_loop(lambda x, y, v: mmx.predict_fn(v, x, y),
                (a, b, m32.variables), n=10)
print(json.dumps({"policy": "staged", "ms_per_batch8": round(dt * 1e3, 1),
                  "pairs_per_s": round(B / dt, 1)}), flush=True)
print("done", flush=True)
