"""Reliable on-device benchmarking.

The tunneled TPU backend is fully asynchronous — ``block_until_ready`` does
NOT wait for device execution, and repeated identical calls can be served
from a cache — so naive host timing measures RPC overhead (a 8192^3 matmul
appeared to run at 38 PFLOP/s).  Methodology that measures reality (and
reproduces the v5e's ~197 TFLOP/s bf16 peak at 192 TFLOP/s):

  1. run the function N times inside ONE jitted ``lax.fori_loop`` with a
     data dependency chained between iterations (a denormal-scaled output
     summary perturbs the next input — unfoldable, value-preserving);
  2. force completion by TRANSFERRING the scalar carry to host (float());
  3. difference the wall time of an n=1 and an n=1+N loop to cancel the
     ~30 ms per-call RPC/sync overhead;
  4. give every call a unique eps argument so nothing is deduped.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def timed_loop(fn: Callable, args: Sequence, n: int = 10,
               repeats: int = 3) -> float:
    """Median seconds per on-device evaluation of fn(*args).

    Median, not min: each sample is a DIFFERENCE of two wall times, so
    runtime jitter can make a sample arbitrarily *small* as easily as
    large (a min once reported a 19 ms FlowNetC batch as 0.75 ms)."""

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(steps, eps, *args):
        def body(_, carry):
            first = args[0] + carry.astype(args[0].dtype)
            out = fn(first, *args[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return s * 1e-37

        return lax.fori_loop(0, steps, body, eps)

    # compile both loop lengths (float() transfer = true sync)
    float(run(1, jnp.float32(0.0), *args))
    float(run(1 + n, jnp.float32(0.0), *args))

    samples = []
    for r in range(repeats):
        eps1 = jnp.float32(1e-12 * (r + 1))
        epsn = jnp.float32(1e-12 * (r + 101))
        t0 = time.perf_counter()
        float(run(1, eps1, *args))
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(1 + n, epsn, *args))
        dtn = time.perf_counter() - t0
        samples.append((dtn - dt1) / n)
    samples.sort()
    return max(samples[len(samples) // 2], 1e-9)
