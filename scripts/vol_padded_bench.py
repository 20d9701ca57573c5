"""TPU value-check + bench for the padded volume lookup (VERDICT item 9).

1. Op-level f32 parity: corr_lookup_padded vs corr_lookup("mxu") on the
   real chip (compiled Mosaic kernel, not interpret mode).
2. End-to-end RAFT corr_impl="volume": padded-lookup path (TPU default)
   vs the compact mxu path (forced by monkeypatching the backend gate).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/vol_padded_bench.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from understanding_flow_robustness_tpu.models import registry
from understanding_flow_robustness_tpu.ops import (
    all_pairs_correlation, corr_lookup, corr_lookup_padded, corr_pyramid,
)
from understanding_flow_robustness_tpu.ops.interp import coords_grid
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def op_check():
    rng = np.random.RandomState(3)
    B, H, W, C, L, r = 1, 48, 64, 16, 4, 4
    n = 2 * r + 1
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pyramid = corr_pyramid(all_pairs_correlation(f1, f2), L)
    coords = jnp.asarray(coords_grid(H, W))[None] + jnp.asarray(
        rng.randn(B, H, W, 2).astype(np.float32) * 3
    )
    padded = np.asarray(corr_lookup_padded(tuple(pyramid), coords, r, None))
    compact = np.asarray(corr_lookup(pyramid, coords, r, impl="mxu"))
    p6 = padded.reshape(B, H, W, 16, L, 16)
    c5 = compact.reshape(B, H, W, L, n, n)  # [l, s, t]
    worst = 0.0
    for l in range(L):
        d = np.abs(p6[..., :n, l, :n]
                   - c5[:, :, :, l].transpose(0, 1, 2, 4, 3)).max()
        worst = max(worst, float(d))
    print(f"op-level f32 parity: max |padded - mxu| = {worst:.3e}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    op_check()

    rng = np.random.RandomState(0)
    H, W = 384, 512
    x1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    import understanding_flow_robustness_tpu.models.raft_model as rm

    m_pad = registry.fetch_model("RAFT", pretrained_path=None,
                                 corr_impl="volume")
    f_pad = jax.jit(m_pad.predict_fn)
    out_pad = jax.block_until_ready(f_pad(m_pad.variables, x1, x2))

    orig = rm.jax.default_backend
    rm.jax.default_backend = lambda: "cpu"
    try:
        m_mxu = registry.fetch_model("RAFT", pretrained_path=None,
                                     corr_impl="volume")
        f_mxu = jax.jit(m_mxu.predict_fn)
        out_mxu = jax.block_until_ready(f_mxu(m_mxu.variables, x1, x2))
    finally:
        rm.jax.default_backend = orig

    a, b = np.asarray(out_pad), np.asarray(out_mxu)
    print("e2e (bf16, random weights, 12 unrolled iters) max |pad - mxu|:",
          float(np.abs(a - b).max()), " mean:", float(np.abs(a - b).mean()),
          flush=True)

    dt = timed_loop(lambda u, v, w: f_pad(w, u, v),
                    (x1, x2, m_pad.variables))
    print(f"volume padded lookup: {dt*1000:.2f} ms "
          f"({1.0/dt:.2f} pairs/s)", flush=True)
    dt = timed_loop(lambda u, v, w: f_mxu(w, u, v),
                    (x1, x2, m_mxu.variables))
    print(f"volume mxu lookup:    {dt*1000:.2f} ms "
          f"({1.0/dt:.2f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
