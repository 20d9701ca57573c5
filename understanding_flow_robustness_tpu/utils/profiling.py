"""Profiling + determinism utilities (SURVEY §5 aux subsystems).

The reference's observability is wall-clock AverageMeters
(patch_attacks/main.py:356-366) and per-frame timing logs
(global_attacks/perturb_main.py:543,589,814); its determinism knobs are
cudnn.deterministic + manual seeds (perturb_main.py:149-154).  TPU-native
equivalents: jax.profiler traces (TensorBoard-viewable), per-step host
timers, and seed plumbing (XLA is deterministic by construction on TPU for
a fixed program — the only nondeterminism sources are host RNG and
jax.random keys, both seeded here).
"""

from __future__ import annotations

import contextlib
import random
import time

import numpy as np


def seed_everything(seed: int) -> "np.random.RandomState":
    """Seed host RNGs (perturb_main.py:149-154 equivalent).  Device-side
    randomness must flow through jax.random keys derived from this seed."""
    random.seed(seed)
    np.random.seed(seed)
    return np.random.RandomState(seed)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context; view in TensorBoard's profile plugin.
    No-ops gracefully if the backend doesn't support tracing."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Per-step wall-clock tracking (batch_time / data_time meters,
    patch_attacks/main.py:356-366)."""

    def __init__(self):
        self.t_last = time.time()
        self.data_time = 0.0
        self.batch_time = 0.0
        self.n = 0
        self.total_data = 0.0
        self.total_batch = 0.0

    def data_loaded(self):
        now = time.time()
        self.data_time = now - self.t_last
        self.total_data += self.data_time
        self.t_last = now

    def step_done(self):
        now = time.time()
        self.batch_time = now - self.t_last
        self.total_batch += self.batch_time
        self.t_last = now
        self.n += 1

    def summary(self) -> dict:
        n = max(self.n, 1)
        return {
            "avg_data_time": self.total_data / n,
            "avg_batch_time": self.total_batch / n,
            "steps": self.n,
        }
