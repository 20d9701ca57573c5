"""Which update-block conv's backward is pathological at train geometry?

ub_batch_bench measured update-block fwd+bwd at 4.09 ms vs 0.405 fwd
(B4 36x120) — a 9x fwd->fwd+bwd blowup where 3x is normal.  Times each
constituent conv shape fwd and fwd+bwd (param+input grads) to find the
offender, plus an im2col-matmul reference for 3x3 wgrad/dgrad.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ub_bwd_decomp.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
B, H, W = 4, 36, 120

SHAPES = [
    ("convc1 1x1 1024->256", 1024, 256, (1, 1)),
    ("convc2 3x3 256->192", 256, 192, (3, 3)),
    ("convf1 7x7 2->128", 2, 128, (7, 7)),
    ("convf2 3x3 128->64", 128, 64, (3, 3)),
    ("enc conv 3x3 256->126", 256, 126, (3, 3)),
    ("gru 1x5 384->128", 384, 128, (1, 5)),
    ("gru 5x1 384->128", 384, 128, (5, 1)),
    ("flowhead 3x3 128->256", 128, 256, (3, 3)),
    ("mask0 3x3 128->256", 128, 256, (3, 3)),
    ("mask2 1x1 256->1152", 256, 1152, (1, 1)),
]

for name, ci, co, (kh, kw) in SHAPES:
    x = jnp.asarray(rng.randn(B, H, W, ci).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32)).astype(
        jnp.bfloat16)

    def conv(xx, ww):
        return lax.conv_general_dilated(
            xx, ww, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt_f = timed_loop(lambda xx, ww: (conv(xx, ww),), (x, w), n=40)

    def loss(xx, ww):
        return jnp.sum(conv(xx, ww).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1))
    dt_b = timed_loop(lambda xx, ww: g(xx, ww), (x, w), n=40)
    gf = 2 * B * H * W * ci * co * kh * kw / 1e9
    print(f"{name:24s} fwd {dt_f*1e3:7.3f} ms ({gf/dt_f/1e3:6.1f} TF/s)   "
          f"fwd+bwd {dt_b*1e3:7.3f} ms (x{dt_b/dt_f:5.1f},"
          f" {3*gf/dt_b/1e3:6.1f} TF/s)", flush=True)
