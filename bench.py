"""Benchmark: KITTI-resolution inference throughput on one TPU chip.

Timing uses the loop-differencing on-device harness
(understanding_flow_robustness_tpu.utils.benchmark) — the tunneled backend
is async and dedupes identical calls, so naive host loops are meaningless.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: RAFT (12 GRU iterations) frame-pairs/sec at 384x1280 — the
reference's flagship config (BASELINE.md).  The vs_baseline factor compares
against a PyTorch-GPU single-image estimate for RAFT-12 at this resolution
(~10 pairs/s on a V100-class card; the reference repo publishes no
end-to-end numbers, BASELINE.md §published).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# PyTorch-GPU reference throughput estimate for RAFT-12 @ 384x1280, pairs/s.
PYTORCH_GPU_RAFT_BASELINE = 10.0

BATCH = 8
H, W = 384, 1280
WARMUP = 3
ITERS = 20


def main():
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    model = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128))

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32))

    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    dt = timed_loop(lambda a, b: model.predict(a, b), (img1, img2), n=ITERS)
    pairs_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "raft_kitti_384x1280_frame_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 2),
                "unit": "frame-pairs/s",
                "vs_baseline": round(pairs_per_sec / PYTORCH_GPU_RAFT_BASELINE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
