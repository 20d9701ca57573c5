"""Trace-time switch that disables Pallas fast paths.

A ``pallas_call`` has no SPMD partitioning rule, so a program that is
auto-partitioned over a spatial mesh axis (parallel/spatial.py) must not
contain one.  Path selection for the hot ops happens at trace time
(``jax.default_backend()`` + shape checks), so a contextvar consulted at
the same point is enough: ``spatial_predict`` traces the model body under
``no_pallas_kernels()`` and every op falls back to its exact pure-XLA
formulation, which the partitioner knows how to shard.

Caveat: JAX's tracing caches are keyed on function identity + avals, not
on this contextvar — a function traced once OUTSIDE the gate returns its
cached (kernel-bearing) jaxpr when re-traced inside it.  Every gated
entry point must therefore wrap the computation in a FRESH function
object per gate state (``spatial_predict``/``make_spatial_attack`` build
a new closure per call, which is sufficient).
"""

from __future__ import annotations

import contextlib
import contextvars

_DISABLED = contextvars.ContextVar("ufr_pallas_disabled", default=False)


def pallas_disabled() -> bool:
    return _DISABLED.get()


@contextlib.contextmanager
def no_pallas_kernels():
    token = _DISABLED.set(True)
    try:
        yield
    finally:
        _DISABLED.reset(token)
