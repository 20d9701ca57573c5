"""Backward bisection of the RAFT train step (batch 4 @ 288x960).

Monkeypatches stop_gradients into raft_model's module globals to knock
out individual backward segments, then differences against the full
fwd+bwd time:

  bwd_full       - fwd+bwd, nothing knocked out
  no_corr_bwd    - stop_gradient on every corr lookup output (kills the
                   12 alt-corr backward kernels + f1/f2 grads through corr)
  no_enc_bwd     - stop_gradient on fmap1/fmap2/cnet (kills encoder bwds)
  no_upmask_bwd  - stop_gradient on the upsample mask (kills mask-head bwd)
  last_pred_loss - sequence loss on the last prediction only (kills 11 of
                   12 upsample bwds AND their loss accumulation)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_decomp2.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import understanding_flow_robustness_tpu.models.raft_model as rm
from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.training.losses import sequence_loss
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="all")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    parts = set(args.parts.split(","))

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    tb, th, tw = 4, 288, 960
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128))
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    targs = (
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        jnp.ones((tb, th, tw), jnp.float32),
    )

    orig_alt = rm.alt_corr_features
    orig_up = rm.upsample_flow_convex

    def report(name, dt):
        print(f"{name:22s} {dt*1e3:8.2f} ms  ({tb/dt:6.2f} frames/s)",
              flush=True)

    def fwd_loss(p, s, i1, i2, fl, va, last_only=False):
        variables = {"params": p, "batch_stats": s}
        preds, _ = raft.module.apply(
            variables, i1 * 255.0, i2 * 255.0, mutable=["batch_stats"],
            train=True, test_mode=False)
        preds = list(preds)
        if last_only:
            preds = preds[-1:]
        loss, _ = sequence_loss(preds, fl, va)
        return loss

    def measure(name, last_only=False):
        g = jax.jit(lambda i1, i2, fl, va, p, s: jax.grad(
            lambda pp: fwd_loss(pp, s, i1, i2, fl, va, last_only))(p))
        dt = timed_loop(
            lambda i1, i2, fl, va, p, s: (g(i1, i2, fl, va, p, s),
                                          jnp.float32(0)),
            targs + (tparams, tstats), n=args.iters)
        report(name, dt)

    try:
        if "bwd_full" in parts or "all" in parts:
            measure("bwd_full")

        if "no_corr_bwd" in parts or "all" in parts:
            rm.alt_corr_features = lambda *a, **k: jax.lax.stop_gradient(
                orig_alt(*a, **k))
            measure("no_corr_bwd")
            rm.alt_corr_features = orig_alt

        if "no_upmask_bwd" in parts or "all" in parts:
            rm.upsample_flow_convex = lambda f, m: orig_up(
                f, jax.lax.stop_gradient(m))
            measure("no_upmask_bwd")
            rm.upsample_flow_convex = orig_up

        if "last_pred_loss" in parts or "all" in parts:
            measure("last_pred_loss", last_only=True)
    finally:
        rm.alt_corr_features = orig_alt
        rm.upsample_flow_convex = orig_up


if __name__ == "__main__":
    main()
