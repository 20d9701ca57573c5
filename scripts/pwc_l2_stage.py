"""Bisect PWC's level-2 stage (the 27 ms in-graph block from
scripts/pwc_cut.py) with the exact in-graph structure: warp -> corr ->
barrier -> progressive-concat decoder -> predict_flow (+ context).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_l2_stage.py
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from understanding_flow_robustness_tpu.ops import (
    spatial_correlation,
    warp_backward,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

B, H, W, C = 8, 96, 320, 32
rng = np.random.RandomState(0)


def rnd(*s):
    return jnp.asarray((rng.randn(*s) * 0.05).astype(np.float32))


def conv(x, w, dilation=1):
    p = ((w.shape[0] - 1) // 2) * dilation
    return lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)), rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


CHAIN = (128, 128, 96, 64, 32)


def make_stage(do_warp=True, do_corr=True, barrier=True, decoder="concat",
               context=False):
    cum = 117
    ws = []
    for co in CHAIN:
        ws.append(rnd(3, 3, cum, co))
        cum += co
    wf = rnd(3, 3, cum, 2)
    ctx_ws = [rnd(3, 3, ci, co) for ci, co in
              ((565, 128), (128, 128), (128, 128), (128, 96), (96, 64),
               (64, 32), (32, 2))]
    ctx_dil = (1, 2, 4, 8, 16, 1, 1)

    @jax.jit
    def stage(c1, c2, up_flow, up_feat):
        if do_warp:
            warped = warp_backward(c2, up_flow * 5.0, mode="zeros_mask")
        else:
            warped = c2
        if do_corr:
            corr = lrelu(spatial_correlation(c1, warped, patch_size=9) / C)
        else:
            corr = jnp.broadcast_to(
                jnp.mean(warped, -1, keepdims=True), c1.shape[:3] + (81,)
            )
        parts = (corr, c1, up_flow, up_feat)
        if barrier:
            parts = lax.optimization_barrier(parts)
        if decoder == "concat":
            x = jnp.concatenate(parts, -1)
            for w in ws:
                x = jnp.concatenate([lrelu(conv(x, w)), x], -1)
            flow = conv(x, wf)
        else:
            srcs = parts
            for w in ws:
                off = 0
                y = None
                for s in srcs:
                    k = w[:, :, off:off + s.shape[-1]]
                    yk = conv(s, k)
                    y = yk if y is None else y + yk
                    off += s.shape[-1]
                srcs = (lrelu(y),) + srcs
            off = 0
            flow = None
            for s in srcs:
                k = wf[:, :, off:off + s.shape[-1]]
                fk = conv(s, k)
                flow = fk if flow is None else flow + fk
                off += s.shape[-1]
            x = jnp.concatenate(srcs, -1)
        if context:
            y = x
            for w, d in zip(ctx_ws, ctx_dil):
                y = conv(y, w, dilation=d)
                if w is not ctx_ws[-1]:
                    y = lrelu(y)
            flow = flow + y
        return flow

    return stage


def main():
    enable_compilation_cache()
    c1 = rnd(B, H, W, C)
    c2 = rnd(B, H, W, C)
    uf = rnd(B, H, W, 2)
    ue = rnd(B, H, W, 2)
    variants = [
        ("full concat", dict()),
        ("full split", dict(decoder="split")),
        ("no warp", dict(do_warp=False)),
        ("no corr", dict(do_corr=False)),
        ("no barrier", dict(barrier=False)),
        ("decoder only", dict(do_warp=False, do_corr=False)),
        ("+context", dict(context=True)),
    ]
    for name, kw in variants:
        fn = make_stage(**kw)
        dt = timed_loop(fn, (c1, c2, uf, ue), n=20)
        print(f"{name:14s}: {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
