"""Decomposition of the CURRENT (packed + batch-padded) RAFT train step.

bench.py's train recipe: RAFT(batch_pad_encoders=True) + make_train_step
(packed_raft auto-on), batch 4 @ 288x960, AdamW + OneCycle.  This script
measures the same program and then knocks out one backward segment at a
time (stop_gradient monkeypatches, like train_decomp2.py, but through the
packed path) to attribute the step budget:

  full           - the bench train step (fwd+bwd+optimizer)
  fwd_only       - forward + loss only (no grad): lower bound
  no_corr_bwd    - stop_gradient on the 12 corr-lookup outputs
  no_fnet_bwd    - stop_gradient on fmap1/fmap2 (kills fnet bwd + corr
                   feature grads)
  no_cnet_bwd    - stop_gradient on net/inp after the split
  no_upsample_bwd- stop_gradient on the packed mask (mask-head bwd dead)
  last_pred_loss - loss on the last prediction only
  no_opt         - grads computed but optimizer update skipped

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_decomp3.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import understanding_flow_robustness_tpu.models.raft_model as rm
from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.training import (
    fetch_optimizer,
    make_train_step,
)
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
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       batch_pad_encoders=True)
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
    topt = tx.init(tparams)
    targs = (
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        jnp.ones((tb, th, tw), jnp.float32),
    )

    def report(name, dt):
        print(f"{name:16s} {dt*1e3:8.2f} ms  ({tb/dt:6.2f} frames/s)",
              flush=True)

    orig_alt = rm.alt_corr_features
    orig_up = rm.upsample_flow_packed

    def fwd_loss(p, s, i1, i2, fl, va, last_only=False):
        variables = {"params": p, "batch_stats": s}
        preds, _ = raft.module.apply(
            variables, i1 * 255.0, i2 * 255.0, mutable=["batch_stats"],
            train=True, test_mode=False, packed_train=True)
        preds = list(preds)
        if last_only:
            preds = preds[-1:]
        loss, _ = sequence_loss(preds, fl, va, packed=True)
        return loss

    def measure_grad(name, last_only=False):
        g = jax.jit(lambda i1, i2, fl, va, p, s: jax.grad(
            lambda pp: fwd_loss(pp, s, i1, i2, fl, va, last_only))(p))
        dt = timed_loop(
            lambda i1, i2, fl, va, p, s: (g(i1, i2, fl, va, p, s),
                                          jnp.float32(0)),
            targs + (tparams, tstats), n=args.iters)
        report(name, dt)

    def on(name):
        return name in parts or "all" in parts

    try:
        if on("full"):
            tstep = jax.jit(make_train_step(
                raft.module, tx, loss_type="sequence", is_raft=True))

            def full(i1, i2, fl, va, p, o, s):
                batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
                np_, no_, _, m = tstep(p, o, s, batch)
                return np_, m["loss"]

            dt = timed_loop(full, targs + (tparams, topt, tstats),
                            n=args.iters)
            report("full", dt)

        if on("no_opt"):
            measure_grad("no_opt")

        if on("fwd_only"):
            f = jax.jit(lambda i1, i2, fl, va, p, s: fwd_loss(
                p, s, i1, i2, fl, va))
            dt = timed_loop(
                lambda i1, i2, fl, va, p, s: (f(i1, i2, fl, va, p, s),),
                targs + (tparams, tstats), n=args.iters)
            report("fwd_only", dt)

        if on("no_corr_bwd"):
            rm.alt_corr_features = lambda *a, **k: jax.lax.stop_gradient(
                orig_alt(*a, **k))
            measure_grad("no_corr_bwd")
            rm.alt_corr_features = orig_alt

        if on("no_upsample_bwd"):
            rm.upsample_flow_packed = lambda f, m: orig_up(
                f, jax.lax.stop_gradient(m))
            measure_grad("no_upsample_bwd")
            rm.upsample_flow_packed = orig_up

        if on("last_pred_loss"):
            measure_grad("last_pred_loss", last_only=True)
    finally:
        rm.alt_corr_features = orig_alt
        rm.upsample_flow_packed = orig_up


if __name__ == "__main__":
    main()
