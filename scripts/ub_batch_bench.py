"""Update-block conv efficiency: batch 4 vs batch 8 at train geometry.

Round 3 found XLA's conv strategy pathological at batch 2-4 for the
ENCODER geometry on v5e (9.4 vs 1.5 ms/img) — hence batch_pad_encoders.
The refinement stack (motion encoder + SepConvGRU + heads) still runs at
the raw train batch 4 at 1/8 resolution (36x120); if batch 4 is
pathological there too, padding the iteration path would be the next
train-step lever.  Also times the packed mask head + packed upsample
forward at both batches.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ub_batch_bench.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from understanding_flow_robustness_tpu.models.raft_model import (
    BasicUpdateBlock,
    upsample_flow_packed,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
H, W = 36, 120
L, r = 4, 4
cor_planes = L * (2 * r + 1) ** 2

block = BasicUpdateBlock(cor_planes, 128, dtype=jnp.bfloat16,
                         padded_corr_levels=L, packed_mask=True)

for B in (4, 8):
    net = jnp.asarray(rng.randn(B, H, W, 128).astype(np.float32))
    inp = jnp.asarray(rng.randn(B, H, W, 128).astype(np.float32))
    corr = jnp.asarray(
        rng.randn(B, H, W, 16 * L * 16).astype(np.float32)
    ).astype(jnp.bfloat16)
    flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32))
    v = block.init(jax.random.PRNGKey(0), net, inp, corr, flow)

    def fwd(n_, i_, c_, f_, vv):
        out_net, mask, dflow, _ = block.apply(vv, n_, i_, c_, f_)
        return out_net, mask, dflow

    dt = timed_loop(fwd, (net, inp, corr, flow, v), n=30)
    print(f"B{B}: update block fwd {dt*1e3:7.3f} ms "
          f"({dt*1e3/B*4:6.3f} ms per 4 samples)", flush=True)

    # fwd+bwd (the training cost): grad w.r.t. params and inputs
    def loss(vv, n_, i_, c_, f_):
        out_net, mask, dflow, _ = block.apply(vv, n_, i_, c_, f_)
        up = upsample_flow_packed(f_ + dflow.astype(jnp.float32), mask)
        return (jnp.sum(out_net.astype(jnp.float32) ** 2)
                + jnp.sum(up.astype(jnp.float32) ** 2))

    g = jax.grad(loss, argnums=(0, 1, 3))
    dt = timed_loop(
        lambda n_, i_, c_, f_, vv: (g(vv, n_, i_, c_, f_), jnp.float32(0)),
        (net, inp, corr, flow, v), n=15)
    print(f"B{B}: update block fwd+bwd (incl packed upsample) "
          f"{dt*1e3:7.3f} ms ({dt*1e3/B*4:6.3f} ms per 4 samples)",
          flush=True)
