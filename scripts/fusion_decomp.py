"""Per-layer cost decomposition of FlowNetFusion at the bench geometry
(b8, 384x1280) + space-to-depth candidates for the lane-starved pieces.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fusion_decomp.py
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from understanding_flow_robustness_tpu.ops.s2d import (
    conv_s2d,
    s2d_conv_kernel,
    space_to_depth,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W = 8, 384, 1280
rng = np.random.RandomState(0)


def t_conv(ci, co, k, s, h, w, name):
    x = jnp.asarray(rng.rand(B, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.01)
    pad = (k - 1) // 2

    def f(x, wt):
        return lax.conv_general_dilated(
            x, wt, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = timed_loop(f, (x, wt), n=20)
    print(f"{name}: conv {ci}->{co} k{k} s{s} @{h}x{w}: {dt*1000:.2f} ms",
          flush=True)
    if s == 1 and k % 2 == 1 and (k // 2) % 2 == 1 and co <= 64:
        dts = timed_loop(lambda a, b: conv_s2d(a, b), (x, wt), n=20)
        # also: s2d conv with input/output ALREADY in s2d space (stack cost)
        xs = space_to_depth(x)
        w2 = s2d_conv_kernel(wt)
        kp = k // 2 + 2
        pp = kp // 2

        def fs(a, b):
            return lax.conv_general_dilated(
                a, b, (1, 1), ((pp, pp), (pp, pp)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        dti = timed_loop(fs, (xs, w2), n=20)
        print(f"   s2d (bracketed): {dts*1000:.2f} ms; in-stack: "
              f"{dti*1000:.2f} ms", flush=True)
    return dt


def t_deconv(ci, co, h, w, name):
    """k4 s2 p1 transpose conv from (h, w) -> (2h, 2w)."""
    x = jnp.asarray(rng.rand(B, h, w, ci).astype(np.float32))
    wt = jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.01)

    def f(x, wt):
        return lax.conv_general_dilated(
            x, wt[::-1, ::-1], (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = timed_loop(f, (x, wt), n=20)
    print(f"{name}: deconv {ci}->{co} k4 s2 @{h}x{w}->: {dt*1000:.2f} ms",
          flush=True)

    # s2d-output formulation: (3,3,ci,4co) masked conv at (h, w), output
    # stays in 2x2 depth space. Build masked kernel:
    # out[2Y+py, 2X+px, o] = sum_{dy,dx in {-1,0,1}} x[Y+dy, X+dx] *
    #   w[ky, kx, :, o] with ky = py + 1 - 2*dy valid in [0,4)
    dyo = np.arange(-1, 2)
    ky = 1 + np.arange(2)[None, :] - 2 * dyo[:, None]  # (dy, py)
    vy = (ky >= 0) & (ky < 4)
    kyc = np.clip(ky, 0, 3)
    wy = wt[jnp.asarray(kyc.reshape(-1))].reshape(3, 2, 4, ci, co)
    wy = wy * jnp.asarray(vy.reshape(3, 2, 1, 1, 1), wt.dtype)
    wyx = wy[:, :, jnp.asarray(kyc.reshape(-1))].reshape(3, 2, 3, 2, ci, co)
    wyx = wyx * jnp.asarray(vy.reshape(1, 1, 3, 2, 1, 1), wt.dtype)
    # (dy, py, dx, px, i, o) -> (dy, dx, i, [py, px, o])
    w2 = jnp.transpose(wyx, (0, 2, 4, 1, 3, 5)).reshape(3, 3, ci, 4 * co)

    def fs(x, w2):
        return lax.conv_general_dilated(
            x, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dts = timed_loop(fs, (x, w2), n=20)
    print(f"   s2d-output form: {dts*1000:.2f} ms", flush=True)
    # value check
    a = np.asarray(f(x, wt))
    bps = np.asarray(fs(x, w2)).reshape(B, h, w, 2, 2, co)
    bfull = bps.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, co)
    err = np.abs(a - bfull).max() / (np.abs(a).max() + 1e-9)
    print(f"   s2d-output rel err: {err:.2e}", flush=True)
    return dt


total = 0.0
total += t_conv(11, 64, 3, 1, H, W, "conv0")
total += t_conv(64, 64, 3, 2, H, W, "conv1")
total += t_conv(64, 128, 3, 1, H // 2, W // 2, "conv1_1")
total += t_conv(128, 128, 3, 2, H // 2, W // 2, "conv2")
total += t_conv(128, 128, 3, 1, H // 4, W // 4, "conv2_1")
total += t_conv(128, 2, 3, 1, H // 4, W // 4, "predict_flow2")
total += t_deconv(128, 32, H // 4, W // 4, "deconv1")
total += t_deconv(2, 2, H // 4, W // 4, "upflow2to1")
total += t_conv(162, 32, 3, 1, H // 2, W // 2, "inter_conv1")
total += t_conv(32, 2, 3, 1, H // 2, W // 2, "predict_flow1")
total += t_deconv(162, 16, H // 2, W // 2, "deconv0")
total += t_deconv(2, 2, H // 2, W // 2, "upflow1to0")
total += t_conv(82, 16, 3, 1, H, W, "inter_conv0")
total += t_conv(16, 2, 3, 1, H, W, "predict_flow0")
print(f"sum of measured layers: {total*1000:.2f} ms (model: 39)",
      flush=True)
