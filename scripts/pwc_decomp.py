"""PWC-Net cost decomposition at b8 384x1280 (shape-matched pieces).

Times standalone jitted stand-ins for each stage (XLA conv cost depends
only on shapes/dtype, so random weights are fine):
  * siamese pyramid (x2 images)
  * per-level dense decoder chain, tuple-split vs concat forms
  * context network, real dilations vs dilation=1 ablation
  * per-level correlation + warp

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_decomp.py
"""
from __future__ import annotations

import functools

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

B = 8
rng = np.random.RandomState(0)


def rnd(*s):
    return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)


def conv(x, w, stride=1, dilation=1):
    p = ((w.shape[0] - 1) // 2) * dilation
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


# ---- pyramid ----
PYR = [(3, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]


@jax.jit
def pyramid(x, ws):
    feats = []
    for i, (ci, co) in enumerate(PYR):
        x = lrelu(conv(x, ws[3 * i], stride=2))
        x = lrelu(conv(x, ws[3 * i + 1]))
        x = lrelu(conv(x, ws[3 * i + 2]))
        feats.append(x)
    return feats


# ---- decoder chains ----
CHAIN = (128, 128, 96, 64, 32)
LVL_DIMS = {6: (6, 20, 81), 5: (12, 40, 213), 4: (24, 80, 181),
            3: (48, 160, 149), 2: (96, 320, 117)}


@functools.partial(jax.jit, static_argnames=("split",))
def decoder(x, ws, split):
    srcs = (x,)
    for i, co in enumerate(CHAIN):
        if split:
            y = None
            off = 0
            for s in srcs:
                ck = s.shape[-1]
                yk = conv(s, ws[i][:, :, off:off + ck, :])
                y = yk if y is None else y + yk
                off += ck
        else:
            y = conv(jnp.concatenate(srcs, -1) if len(srcs) > 1 else srcs[0],
                     ws[i])
        srcs = (lrelu(y),) + srcs
    if split:
        f = None
        off = 0
        for s in srcs:
            ck = s.shape[-1]
            fk = conv(s, ws[5][:, :, off:off + ck, :])
            f = fk if f is None else f + fk
            off += ck
        return f
    return conv(jnp.concatenate(srcs, -1), ws[5])


# ---- context net ----
CTX = [(565, 128, 1), (128, 128, 2), (128, 128, 4), (128, 96, 8),
       (96, 64, 16), (64, 32, 1), (32, 2, 1)]


@functools.partial(jax.jit, static_argnames=("dil",))
def context(x, ws, dil):
    for i, (ci, co, d) in enumerate(CTX):
        x = conv(x, ws[i], dilation=(d if dil else 1))
        if i < 6:
            x = lrelu(x)
    return x


def main():
    enable_compilation_cache()
    img = rnd(B, 384, 1280, 3)
    pw = []
    for ci, co in PYR:
        pw += [rnd(3, 3, ci, co), rnd(3, 3, co, co), rnd(3, 3, co, co)]
    dt = timed_loop(lambda a, b: (pyramid(a, pw), pyramid(b, pw)),
                    (img, img + 0.1), n=20)
    print(f"pyramid x2:          {dt*1000:7.2f} ms", flush=True)

    total_dec = 0.0
    for lvl, (h, w, cin) in LVL_DIMS.items():
        x = rnd(B, h, w, cin)
        cum = cin
        ws = []
        for co in CHAIN:
            ws.append(rnd(3, 3, cum, co))
            cum += co
        ws.append(rnd(3, 3, cum, 2))
        for split in (True, False):
            dtm = timed_loop(
                lambda xx: decoder(xx, tuple(ws), split), (x,), n=20)
            tag = "split" if split else "concat"
            print(f"decoder L{lvl} {tag:6s}:   {dtm*1000:7.2f} ms",
                  flush=True)
            if split:
                total_dec += dtm
    print(f"decoders total (split): {total_dec*1000:7.2f} ms", flush=True)

    x = rnd(B, 96, 320, 565)
    cw = [rnd(3, 3, ci, co) for ci, co, _ in CTX]
    for dil in (True, False):
        dtm = timed_loop(lambda xx: context(xx, cw, dil), (x,), n=20)
        print(f"context dil={str(dil):5s}:   {dtm*1000:7.2f} ms", flush=True)

    # corr + warp per level
    tot = 0.0
    for lvl, (h, w, _) in LVL_DIMS.items():
        cfeat = {6: 196, 5: 128, 4: 96, 3: 64, 2: 32}[lvl]
        f1 = rnd(B, h, w, cfeat)
        f2 = rnd(B, h, w, cfeat)
        corr_fn = jax.jit(lambda a, b: spatial_correlation(a, b, patch_size=9))
        dtm = timed_loop(corr_fn, (f1, f2), n=20)
        print(f"corr L{lvl} ({h}x{w}x{cfeat}): {dtm*1000:7.2f} ms",
              flush=True)
        tot += dtm
        if lvl < 6:
            fl = rnd(B, h, w, 2) * 3.0
            warp_fn = jax.jit(
                lambda f, ff: warp_backward(f, ff, mode="zeros_mask"))
            dtm = timed_loop(warp_fn, (f2, fl), n=20)
            print(f"warp L{lvl}:           {dtm*1000:7.2f} ms", flush=True)
            tot += dtm
    print(f"corr+warp total:     {tot*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
