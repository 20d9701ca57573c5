"""Same-process A/B: remat variants of the RAFT train step (round 5).

The unrolled 12-iteration refinement stores every update-block internal
across the unroll for the backward; rematerializing trades HBM traffic
for VPU/MXU recompute.  Variants:

  base           - the bench train step as shipped
  remat_update   - nn.remat(BasicUpdateBlock) (RAFT.remat_update)
  remat_upsample - jax.checkpoint on upsample_flow_packed (monkeypatch)
  remat_both

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/remat_ab.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import understanding_flow_robustness_tpu.models.raft_model as rm
from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.training import (
    fetch_optimizer,
    make_train_step,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
tb, th, tw = 4, 288, 960
tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
targs = (
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
    jnp.ones((tb, th, tw), jnp.float32),
)

orig_up = rm.upsample_flow_packed


def measure(name, remat_update=False, remat_upsample=False):
    rm.upsample_flow_packed = (
        jax.checkpoint(orig_up) if remat_upsample else orig_up
    )
    try:
        raft = fetch_model("RAFT", pretrained_path=None,
                           init_size=(128, 128), batch_pad_encoders=True,
                           remat_update=remat_update)
        tparams = raft.variables["params"]
        tstats = raft.variables.get("batch_stats", {})
        topt = tx.init(tparams)
        tstep = jax.jit(make_train_step(raft.module, tx,
                                        loss_type="sequence", is_raft=True))

        def train_once(i1, i2, fl, va, p, o, s):
            batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
            np_, no_, _, m = tstep(p, o, s, batch)
            return np_, m["loss"]

        dt = timed_loop(train_once, targs + (tparams, topt, tstats), n=6)
        print(f"{name:16s}: {dt*1e3:7.2f} ms/step ({tb/dt:6.2f} frames/s)",
              flush=True)
    finally:
        rm.upsample_flow_packed = orig_up


measure("base")
measure("remat_update", remat_update=True)
measure("remat_upsample", remat_upsample=True)
measure("remat_both", remat_update=True, remat_upsample=True)
