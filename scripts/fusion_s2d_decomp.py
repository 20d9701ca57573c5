"""Per-piece cost of the s2d-path FlowNetFusion at b8 384x1280.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fusion_s2d_decomp.py
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from understanding_flow_robustness_tpu.ops.s2d import (
    deconv4s2p1_s2d_out_kernel, s2_conv_s2d_in_kernel, s2d_concat_perm,
    s2d_conv_kernel, space_to_depth,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
B, H, W = 8, 384, 1280
H2, W2, H4, W4 = H // 2, W // 2, H // 4, W // 4
rng = np.random.RandomState(0)


def arr(*shape):
    return jnp.asarray(rng.rand(*shape).astype(np.float32))


def wt(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)


def conv(x, w, pad, name, n=20):
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), (pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dt = timed_loop(f, (x, w), n=n)
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


total = 0.0
# conv0 s2d: (3,3,44,256) @ H2
total += conv(arr(B, H2, W2, 44), wt(3, 3, 44, 256), (1, 1), "conv0 s2d")
# conv1 s2d_in: transform of (3,3,64,64) s2 -> (2,2,256,64), pad (1,0)
k2, (plo, phi) = s2_conv_s2d_in_kernel(wt(3, 3, 64, 64), 1)
total += conv(arr(B, H2, W2, 256), k2, (plo, phi), "conv1 s2d_in")
# conv1_1 plain: 64->128 @ H2
total += conv(arr(B, H2, W2, 64), wt(3, 3, 64, 128), (1, 1), "conv1_1")
# conv2 s2: 128->128 @ H2 -> H4
def conv2f(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
dt = timed_loop(conv2f, (arr(B, H2, W2, 128), wt(3, 3, 128, 128)), n=20)
print(f"conv2 s2: {dt*1000:.2f} ms", flush=True)
total += dt
# conv2_1: 128->128 @ H4
total += conv(arr(B, H4, W4, 128), wt(3, 3, 128, 128), (1, 1), "conv2_1")
# predict_flow2: 128->2 @ H4
total += conv(arr(B, H4, W4, 128), wt(3, 3, 128, 2), (1, 1), "predict_flow2")
# deconv1 plain transpose: 128->32 @ H4 -> H2
wd = wt(4, 4, 128, 32)
def dc1(x, w):
    return lax.conv_general_dilated(
        x, w[::-1, ::-1], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
dt = timed_loop(dc1, (arr(B, H4, W4, 128), wd), n=20)
print(f"deconv1 plain: {dt*1000:.2f} ms", flush=True)
total += dt
# upflow2to1 plain transpose: 2->2 @ H4 -> H2
wu = wt(4, 4, 2, 2)
dt = timed_loop(dc1, (arr(B, H4, W4, 2), wu), n=20)
print(f"upflow2to1 plain: {dt*1000:.2f} ms", flush=True)
total += dt
# inter_conv1 plain: 162->32 @ H2
total += conv(arr(B, H2, W2, 162), wt(3, 3, 162, 32), (1, 1), "inter_conv1")
# predict_flow1 plain: 32->2 @ H2
total += conv(arr(B, H2, W2, 32), wt(3, 3, 32, 2), (1, 1), "predict_flow1")
# deconv0 s2d_out: (3,3,162,64) @ H2
total += conv(arr(B, H2, W2, 162),
              deconv4s2p1_s2d_out_kernel(wt(4, 4, 162, 16)), (1, 1),
              "deconv0 s2d_out")
# upflow1to0 s2d_out: (3,3,2,8) @ H2
total += conv(arr(B, H2, W2, 2),
              deconv4s2p1_s2d_out_kernel(wt(4, 4, 2, 2)), (1, 1),
              "upflow1to0 s2d_out")
# inter_conv0 s2d+perm: (3,3,328,64) @ H2
k2 = s2d_conv_kernel(wt(3, 3, 82, 16))
k2 = k2[:, :, jnp.asarray(s2d_concat_perm((64, 16, 2))), :]
total += conv(arr(B, H2, W2, 328), k2, (1, 1), "inter_conv0 s2d")
# predict_flow0 s2d: (3,3,64,8) @ H2
total += conv(arr(B, H2, W2, 64), s2d_conv_kernel(wt(3, 3, 16, 2)), (1, 1),
              "predict_flow0 s2d")
# brackets
xi = arr(B, H, W, 11)
dt = timed_loop(lambda x: space_to_depth(x), (xi,), n=20)
print(f"space_to_depth 11ch full: {dt*1000:.2f} ms", flush=True)
total += dt
print(f"sum: {total*1000:.2f} ms (model standalone: 30.1)", flush=True)
