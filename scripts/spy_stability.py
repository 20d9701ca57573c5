"""SPyNet throughput stability probe (VERDICT round-4 weak #1).

The round-4 builder bench recorded SPyNet at 163.8 pairs/s while the
driver's end-of-round run (same commit) measured 123.1 — a 25-33% swing on
an *inference* metric that PERF.md's measurement-window section claimed is
window-stable within 1%.  This script measures SPyNet repeatedly inside one
process (fresh timed_loop each time) plus a RAFT control, so running it a
few times across processes/windows separates the hypotheses:

  (a) bimodal XLA plan between compiles  -> cross-process spread >> in-process
  (b) chip-weather drift hits SPyNet too -> in-process samples drift together
      with the RAFT control
  (c) harness artifact (differencing)    -> isolated outlier samples

  PYTHONPATH=/root/repo python scripts/spy_stability.py [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = np.random.RandomState(0)
B, H, W = 8, 384, 1280
img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

spy = fetch_model("SpyNet", pretrained_path=None, init_size=(128, 128))
fnc = fetch_model("FlowNetC", pretrained_path=None, init_size=(128, 128))

print(f"backend={jax.default_backend()} t0={time.strftime('%H:%M:%S')}",
      flush=True)
for r in range(reps):
    dt_s = timed_loop(lambda a, b, v: spy.predict_fn(v, a, b),
                      (img1, img2, spy.variables), n=10)
    dt_c = timed_loop(lambda a, b, v: fnc.predict_fn(v, a, b),
                      (img1, img2, fnc.variables), n=30)
    print(f"[{time.strftime('%H:%M:%S')}] rep {r}: "
          f"spynet {B/dt_s:7.2f} pairs/s ({dt_s*1e3:6.2f} ms)   "
          f"flownetc-control {B/dt_c:7.2f} pairs/s ({dt_c*1e3:5.2f} ms)",
          flush=True)
