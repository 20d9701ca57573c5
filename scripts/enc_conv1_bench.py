"""Microbench: RAFT encoder conv1 (7x7 stride-2, 3->64) formulations.

The BasicEncoder's conv1 is MXU-starved (3 input channels -> contraction
dim 147 with mostly-dead lanes; measured 2.8 ms for the 16-image fnet at
384x1280, PERF.md "Where the RAFT budget goes").  Candidates:

  plain    lax.conv stride-2 as shipped
  s2d_in   space_to_depth input + packed stride-1 (4,4,12,64) kernel
           (ops/s2d.py::s2_conv_s2d_in_kernel) — the transform that won
           for FlowNetSD/Fusion heads
  im2col   explicit patch extraction + matmul (XLA sometimes picks a
           worse conv strategy than a hand-rolled GEMM at tiny Ci)

Run on the real chip: python scripts/enc_conv1_bench.py

Measured (v5e, bf16, B=16 @ 384x1280, 2026-08):

  plain     2.781 ms
  s2d_in    3.843 ms
  im2col   47.209 ms

CLOSED: plain lax.conv wins.  Unlike FlowNetSD/Fusion's stride-1 3x3
heads (where s2d packs 4 spatial positions into one contraction), a
7x7 stride-2 kernel smears across s2d cells: the packed kernel becomes
4x4x12 = 192-deep with 75% structural zeros, so the relayout cost buys
no MXU utilization.  im2col's 49 strided slices are pure HBM traffic.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from understanding_flow_robustness_tpu.ops.s2d import (
    s2_conv_s2d_in_kernel,
    space_to_depth,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    B, H, W = 16, 384, 1280  # fnet geometry: batch 8 pairs -> 16 images
    for dtype in (jnp.bfloat16,):
        x = jnp.asarray(rng.rand(B, H, W, 3), dtype)
        w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, dtype)

        def plain(x, w):
            return lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def s2d_in(x, w):
            xs = space_to_depth(x)
            k2, (plo, phi) = s2_conv_s2d_in_kernel(w, 3)
            return lax.conv_general_dilated(
                xs, k2.astype(x.dtype), (1, 1),
                ((plo, phi), (plo, phi)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def im2col(x, w):
            # stride-2 7x7: gather 7x7 patches at even positions via
            # 4 phase convs is awkward; do conv_general with rhs as GEMM:
            # extract patches with conv against identity is as expensive.
            # Instead: pad + stack 49 shifted slices (cheap relayout) then
            # one (49*3, 64) matmul.
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            Ho, Wo = H // 2, W // 2
            cols = []
            for dy in range(7):
                for dx in range(7):
                    cols.append(lax.slice(
                        xp, (0, dy, dx, 0),
                        (B, dy + H, dx + W, 3), (1, 2, 2, 1)))
            patches = jnp.concatenate(cols, axis=-1)  # (B,Ho,Wo,147)
            return patches.reshape(-1, 147) @ w.transpose(
                0, 1, 2, 3).reshape(147, 64)

        outs = {}
        for name, fn in [("plain", plain), ("s2d_in", s2d_in),
                         ("im2col", im2col)]:
            f = jax.jit(fn)
            y = np.asarray(f(x, w), np.float32)
            outs[name] = y.reshape(-1, 64)
            dt = timed_loop(fn, (x, w), n=30)
            print(f"{name:8s} {dt*1e3:7.3f} ms")
        for name in ("s2d_in", "im2col"):
            err = np.abs(outs[name] - outs["plain"]).max()
            print(f"maxerr {name} vs plain: {err:.2e}")


if __name__ == "__main__":
    main()
