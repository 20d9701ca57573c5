"""Microbench: output-channel fusion of same-input convs in RAFT's update
block (reference: models/raft/update.py:35-73,139-162).

Two exact trace-time fusions, both pure output-channel concats of kernels
over an IDENTICAL input (no float reassociation of any output element):

  1. SepConvGRU gates: convz + convr consume the same (h,)+x sources with
     the same kernel size -> one conv with 2*hd output channels, split.
  2. FlowHead.conv1 + mask_0: both 3x3/256 over `net` -> one 3x3/512.

Run at RAFT KITTI-eval 1/8-res geometry (batch 8, 48x160), bf16 compute.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop  # noqa: E402

B, H, W = 8, 48, 160
HD = 128
DT = jnp.bfloat16


def conv(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_srcs(srcs, w, pad):
    y = None
    off = 0
    for s in srcs:
        c = s.shape[-1]
        yk = conv(s, w[:, :, off:off + c, :], pad)
        y = yk if y is None else y + yk
        off += c
    return y


def make_weights(rng, fused):
    ws = {}
    cin = HD + 128 + 126 + 2  # h + inp + out + flow
    for ks, pad, sfx in (((1, 5), (0, 2), "1"), ((5, 1), (2, 0), "2")):
        if fused:
            ws[f"zr{sfx}"] = jnp.asarray(
                rng.randn(*ks, cin, 2 * HD).astype(np.float32) * 0.05, DT)
        else:
            ws[f"z{sfx}"] = jnp.asarray(
                rng.randn(*ks, cin, HD).astype(np.float32) * 0.05, DT)
            ws[f"r{sfx}"] = jnp.asarray(
                rng.randn(*ks, cin, HD).astype(np.float32) * 0.05, DT)
        ws[f"q{sfx}"] = jnp.asarray(
            rng.randn(*ks, cin, HD).astype(np.float32) * 0.05, DT)
    return ws


def gru(h, xs, ws, fused):
    for ks, pad, sfx in (((1, 5), (0, 2), "1"), ((5, 1), (2, 0), "2")):
        hx = (h,) + xs
        if fused:
            zr = conv_srcs(hx, ws[f"zr{sfx}"], pad)
            z = jax.nn.sigmoid(zr[..., :HD])
            r = jax.nn.sigmoid(zr[..., HD:])
        else:
            z = jax.nn.sigmoid(conv_srcs(hx, ws[f"z{sfx}"], pad))
            r = jax.nn.sigmoid(conv_srcs(hx, ws[f"r{sfx}"], pad))
        q = jnp.tanh(conv_srcs((r * h,) + xs, ws[f"q{sfx}"], pad))
        h = (1 - z) * h + z * q
    return h


def heads(net, wf, wm, fused):
    if fused:
        y = jax.nn.relu(conv(net, jnp.concatenate([wf, wm], -1), (1, 1)))
        return y[..., :256], y[..., 256:]
    return (jax.nn.relu(conv(net, wf, (1, 1))),
            jax.nn.relu(conv(net, wm, (1, 1))))


def main():
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(B, H, W, HD).astype(np.float32), DT)
    inp = jnp.asarray(rng.randn(B, H, W, 128).astype(np.float32), DT)
    out = jnp.asarray(rng.randn(B, H, W, 126).astype(np.float32), DT)
    flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32), DT)
    net = jnp.asarray(rng.randn(B, H, W, HD).astype(np.float32), DT)
    wf = jnp.asarray(rng.randn(3, 3, HD, 256).astype(np.float32) * .05, DT)
    wm = jnp.asarray(rng.randn(3, 3, HD, 256).astype(np.float32) * .05, DT)

    for fused in (False, True):
        ws = make_weights(np.random.RandomState(1), fused)
        wlist = list(ws.values())
        keys = list(ws.keys())

        def run_gru(h_, *wl):
            return gru(h_, (inp, out, flow), dict(zip(keys, wl)), fused)

        dt = timed_loop(run_gru, (h, *wlist), n=40)
        print(f"gru fused={fused}: {dt*1e3:.3f} ms")

        def run_heads(n_, a, b):
            x, y = heads(n_, a, b, fused)
            return x + 0.0 * jnp.pad(y, ((0,)*2,)*3 + ((0, 0),))[..., :256]

        dt = timed_loop(run_heads, (net, wf, wm), n=60)
        print(f"heads fused={fused}: {dt*1e3:.3f} ms")

    # value check: fused == separate exactly (same channel computations)
    ws = make_weights(np.random.RandomState(1), False)
    wsf = dict(ws)
    for sfx in ("1", "2"):
        wsf[f"zr{sfx}"] = jnp.concatenate(
            [ws[f"z{sfx}"], ws[f"r{sfx}"]], -1)
    a = gru(h, (inp, out, flow), ws, False)
    b = gru(h, (inp, out, flow), wsf, True)
    print("maxdiff:", float(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)).max()))


if __name__ == "__main__":
    main()
