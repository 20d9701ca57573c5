"""Decompose the RAFT train step (batch 4 @ 288x960) the way PERF.md
decomposes the 146 ms forward — VERDICT round-3 job #1.

Measures, with the loop-differencing harness:
  1. full train step (bench.py recipe)       — the 279 ms under question
  2. fwd-only in train mode (loss live, grads DCE'd)
  3. value_and_grad without optimizer update
  4. grad wrt corr-lookup inputs only (fnet/cnet treated as constants)
  5. variants: freeze_bn, test-mode-style fwd, eval geometry fwd

Run: python scripts/train_decomp.py [--part N]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

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
    ap.add_argument("--parts", default="all",
                    help="comma list: full,fwd,grad,fwd_freeze,grad_freeze")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--opt", action="store_true",
                    help="round-3 optimized config: batch_pad_encoders + "
                         "packed RAFT loss (the new bench recipe)")
    args = ap.parse_args()
    parts = set(args.parts.split(","))

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    tb, th, tw = 4, 288, 960
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       **({"batch_pad_encoders": True} if args.opt else {}))
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    print("batch_stats leaves:",
          len(jax.tree_util.tree_leaves(tstats)))
    batch = {
        "image1": jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        "image2": jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        "flow": jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        "valid": jnp.ones((tb, th, tw), jnp.float32),
    }
    targs = (batch["image1"], batch["image2"], batch["flow"], batch["valid"])

    def report(name, dt):
        print(f"{name:28s} {dt*1e3:8.2f} ms  ({tb/dt:6.2f} frames/s)")

    if "full" in parts or "all" in parts:
        tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
        topt = tx.init(tparams)
        tstep = jax.jit(make_train_step(raft.module, tx,
                                        loss_type="sequence", is_raft=True))

        def train_once(i1, i2, fl, va, p, o, s):
            b = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
            np_, no_, _, m = tstep(p, o, s, b)
            return np_, m["loss"]

        dt = timed_loop(train_once, targs + (tparams, topt, tstats),
                        n=args.iters)
        report("full train step", dt)

    def fwd_loss(p, s, i1, i2, fl, va, freeze=False):
        variables = {"params": p, "batch_stats": s}
        mutable = [] if freeze else ["batch_stats"]
        kw = dict(train=not freeze, test_mode=False)
        if mutable:
            preds, _ = raft.module.apply(
                variables, i1 * 255.0, i2 * 255.0, mutable=mutable, **kw)
        else:
            preds = raft.module.apply(variables, i1 * 255.0, i2 * 255.0, **kw)
        loss, _ = sequence_loss(list(preds), fl, va)
        return loss

    if "fwd" in parts or "all" in parts:
        f = jax.jit(lambda i1, i2, fl, va, p, s:
                    fwd_loss(p, s, i1, i2, fl, va))
        dt = timed_loop(f, targs + (tparams, tstats), n=args.iters)
        report("fwd only (train mode)", dt)

    if "fwd_freeze" in parts or "all" in parts:
        f = jax.jit(lambda i1, i2, fl, va, p, s:
                    fwd_loss(p, s, i1, i2, fl, va, freeze=True))
        dt = timed_loop(f, targs + (tparams, tstats), n=args.iters)
        report("fwd only (freeze_bn)", dt)

    if "grad" in parts or "all" in parts:
        g = jax.jit(lambda i1, i2, fl, va, p, s: jax.grad(
            lambda pp: fwd_loss(pp, s, i1, i2, fl, va))(p))
        dt = timed_loop(
            lambda i1, i2, fl, va, p, s: (g(i1, i2, fl, va, p, s),
                                          jnp.float32(0)),
            targs + (tparams, tstats), n=args.iters)
        report("fwd+bwd (no optimizer)", dt)

    if "grad_freeze" in parts or "all" in parts:
        g = jax.jit(lambda i1, i2, fl, va, p, s: jax.grad(
            lambda pp: fwd_loss(pp, s, i1, i2, fl, va, freeze=True))(p))
        dt = timed_loop(
            lambda i1, i2, fl, va, p, s: (g(i1, i2, fl, va, p, s),
                                          jnp.float32(0)),
            targs + (tparams, tstats), n=args.iters)
        report("fwd+bwd (freeze_bn)", dt)


if __name__ == "__main__":
    main()
