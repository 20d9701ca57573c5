"""Profile the (already-compiled) RAFT train fwd+bwd on the chip.

Captures a jax.profiler trace of a few executions of the exact grad
program train_decomp.py measures at 270.9 ms, so the 200 ms backward can
be decomposed per-op instead of paying a ~25 min remote compile per
knockout variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_profile.py
Then: python scripts/trace_summarize.py /tmp/raft_train_trace
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.training.losses import sequence_loss
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.profiling import profile_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", action="store_true",
                    help="profile the optimized FULL train step (the new "
                         "bench recipe) instead of the plain grad program")
    ap.add_argument("--out", default="/tmp/raft_train_trace")
    args = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    tb, th, tw = 4, 288, 960
    raft = fetch_model(
        "RAFT", pretrained_path=None, init_size=(128, 128),
        **({"batch_pad_encoders": True} if args.opt else {}))
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    targs = (
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        jnp.ones((tb, th, tw), jnp.float32),
    )

    if args.opt:
        from understanding_flow_robustness_tpu.training import (
            fetch_optimizer,
            make_train_step,
        )

        tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
        topt = tx.init(tparams)
        tstep = jax.jit(make_train_step(raft.module, tx,
                                        loss_type="sequence", is_raft=True))

        def g(i1, i2, fl, va, p, s):
            batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
            np_, _, _, m = tstep(p, topt, s, batch)
            return np_, m["loss"]
    else:
        def fwd_loss(p, s, i1, i2, fl, va):
            variables = {"params": p, "batch_stats": s}
            preds, _ = raft.module.apply(
                variables, i1 * 255.0, i2 * 255.0, mutable=["batch_stats"],
                train=True, test_mode=False)
            loss, _ = sequence_loss(list(preds), fl, va)
            return loss

        g = jax.jit(lambda i1, i2, fl, va, p, s: jax.grad(
            lambda pp: fwd_loss(pp, s, i1, i2, fl, va))(p))

    # compile (cache hit from train_decomp.py)
    out = g(*targs, tparams, tstats)
    jax.block_until_ready(out)
    print("compiled; tracing...", flush=True)

    with profile_trace(args.out):
        for _ in range(3):
            out = g(*targs, tparams, tstats)
        jax.block_until_ready(out)
        # force true completion on the async tunnel
        print("sum:", float(sum(jnp.sum(l.astype(jnp.float32))
                                for l in jax.tree_util.tree_leaves(out))))
    print("trace written to", args.out, flush=True)


if __name__ == "__main__":
    main()
