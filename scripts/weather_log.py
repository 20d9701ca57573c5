"""Chip "weather" logger — one timestamped sample per invocation.

Round 4 discovered the tunneled chip's BACKWARD throughput drifts ~20%
between measurement windows with no code change while inference stays
within 1%.  Hypothesis (round 5): the drift is HBM-bandwidth contention
(the backward Pallas kernels are bandwidth-bound; inference is MXU-bound),
so a pure-bandwidth probe measured in the SAME session should co-vary with
the train step and can normalize it — turning the 35%-tolerance train
guard into a tight weather-immune ratio guard (VERDICT r4 item #4).

Each run appends one JSON line to ``scripts/weather_log.jsonl``:
  hbm_gbps      - big-array copy bandwidth (pure HBM traffic)
  train_fps     - the bench train step, frames/s
  fwd_fps       - forward+loss only at train geometry, frames/s
  raft_pairs    - calibrated RAFT inference (control: window-stable)

Run it opportunistically across the day; a few samples in different
windows decide whether hbm_gbps explains the train drift.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/weather_log.py
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop


def measure_hbm_gbps(mb=512, n=30):
    """Copy bandwidth of a big f32 array (read + write, GB/s)."""
    x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
    dt = timed_loop(lambda v: v + 1.0, (x,), n=n)
    return 2 * mb / 1024 / dt


def measure_fwd_fps(n=8):
    """Forward+loss only at the train geometry (bench.measure_train_fwd,
    shared with the guard's backward-multiple bound)."""
    return bench.measure_train_fwd(n=n)


def main():
    enable_compilation_cache()
    sample = {
        "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "backend": jax.default_backend(),
        "hbm_gbps": round(measure_hbm_gbps(), 1),
        "fwd_fps": round(measure_fwd_fps(), 2),
        "train_fps": round(bench.measure_train_step(n=5), 2),
        "raft_pairs": round(bench.measure_raft(n=10)[0], 2),
    }
    path = os.path.join(os.path.dirname(__file__), "weather_log.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(sample) + "\n")
    print(json.dumps(sample), flush=True)


if __name__ == "__main__":
    main()
