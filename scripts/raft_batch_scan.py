"""Scan RAFT-12 inference throughput vs batch size @ 384x1280.

bench.py's headline metric is frame-pairs/s/chip with the batch size a
free parameter (the GPU denominator is per-frame).  Larger batches
amortize per-dispatch overhead and give XLA fatter convs, at the cost of
VMEM/HBM pressure in the fused corr-lookup kernel.

Run on the real chip: python scripts/raft_batch_scan.py [batches...]

Measured (v5e, production mixed precision, 2026-08):

  batch  8:  141.4 ms/batch   56.6 pairs/s
  batch 12:  242.0 ms/batch   49.6 pairs/s
  batch 16:  291.0 ms/batch   55.0 pairs/s

CLOSED: batch 8 wins.  The fused corr-lookup kernel's grid is already
saturated at batch 8 (each (batch, tile) program fills VMEM with its
pooled-level slabs); larger batches only add HBM pressure and at 12 the
odd batch splits the conv tiling.  bench.py stays at BATCH=8.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop


def main():
    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 12, 16]
    H, W = 384, 1280
    rng = np.random.RandomState(0)
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128))
    for b in batches:
        img1 = jnp.asarray(rng.rand(b, H, W, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(b, H, W, 3).astype(np.float32))
        try:
            dt = timed_loop(lambda a, c, v: raft.predict_fn(v, a, c),
                            (img1, img2, raft.variables), n=15)
        except Exception as e:  # OOM etc.
            print(f"batch {b:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"batch {b:3d}: {dt*1e3:8.2f} ms/batch  "
              f"{b/dt:7.2f} pairs/s")


if __name__ == "__main__":
    main()
