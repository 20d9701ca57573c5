"""Same-process A/B: deferred-sort corr lookup in the RAFT train step and
wild-flow inference (VERDICT r4 item #5; PERF.md "sorted-tile slab rescue").

Measures, in ONE session (PERF.md's same-process rule for backward-path
claims):
  train_off / train_defer   - bench train step, corr_sort off vs defer
  wild_off  / wild_defer    - inference with raw random-init (wild) flows
  cal_defer                 - calibrated inference with defer (overhead
                              check: sorted mode on already-smooth flows)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sorted_corr_ab.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.models.raft_model import (
    scale_flow_head,
)
from understanding_flow_robustness_tpu.training import (
    fetch_optimizer,
    make_train_step,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)

# --- train step A/B (batch 4 @ 288x960, the bench geometry) ---
tb, th, tw = 4, 288, 960
tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
targs = (
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
    jnp.ones((tb, th, tw), jnp.float32),
)

for mode in ("off", "defer"):
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       batch_pad_encoders=True, corr_sort=mode)
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    topt = tx.init(tparams)
    tstep = jax.jit(make_train_step(raft.module, tx, loss_type="sequence",
                                    is_raft=True))

    def train_once(i1, i2, fl, va, p, o, s):
        batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
        np_, no_, _, m = tstep(p, o, s, batch)
        return np_, m["loss"]

    dt = timed_loop(train_once, targs + (tparams, topt, tstats), n=6)
    print(f"train_{mode:5s}: {dt*1e3:7.2f} ms/step ({tb/dt:6.2f} frames/s)",
          flush=True)

# --- inference A/B (batch 8 @ 384x1280) ---
B, H, W = 8, 384, 1280
img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
for mode in ("off", "defer"):
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       corr_sort=mode)
    dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                    (img1, img2, raft.variables), n=12)
    print(f"wild_{mode:6s}: {dt*1e3:7.2f} ms/batch ({B/dt:6.2f} pairs/s)",
          flush=True)
    if mode == "defer":
        vcal = scale_flow_head(raft.variables, 0.05)
        dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                        (img1, img2, vcal), n=12)
        print(f"cal_defer  : {dt*1e3:7.2f} ms/batch ({B/dt:6.2f} pairs/s)",
              flush=True)
