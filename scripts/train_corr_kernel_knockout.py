"""Price the 12 corr BWD KERNEL invocations alone inside the train step.

train_decomp3's `no_corr_bwd` knockout (stop_gradient on the lookup
output) kills the backward kernel AND the fnet backward behind it.  This
script monkeypatches ops.pallas.alt_corr.alt_lookup_bwd with a cheap
stand-in whose outputs still depend on the inputs (nothing upstream is
DCE'd), so `no_opt` here minus train_decomp3's `no_opt` prices the
kernels alone; the remainder of the no_corr_bwd gap is fnet backward +
per-iteration glue (g packing, pool_vjp).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_corr_kernel_knockout.py
"""
from __future__ import annotations

import sys

import jax.numpy as jnp

import understanding_flow_robustness_tpu.ops.pallas.alt_corr as ac
from train_decomp3 import main  # noqa: E402  (scripts/ on sys.path)


def fake_bwd(f1, f2_levels, coords, g, radius, tile=128,
             interpret=False, slabs=None, sort_fallback=False,
             fallback_tile=None):
    s = jnp.sum(g.astype(jnp.float32)) * 1e-30
    df1 = jnp.broadcast_to(s + jnp.float32(1e-30), f1.shape).astype(
        jnp.float32)
    dlv = [jnp.broadcast_to(s, l.shape).astype(jnp.float32)
           for l in f2_levels]
    return df1, dlv


if __name__ == "__main__":
    ac.alt_lookup_bwd = fake_bwd
    sys.argv = [sys.argv[0], "--parts", "no_opt"]
    main()
