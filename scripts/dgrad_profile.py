"""Isolate FlowNetC encoder conv input-gradients (the attack bwd sink).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dgrad_profile.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)


def conv(x, w, stride):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# (name, in_shape, cout, k, stride) — FlowNetC encoder at 384x1280, b2
LAYERS = [
    ("conv1 7x7s2 3->64", (2, 384, 1280, 3), 64, 7, 2),
    ("conv2 5x5s2 64->128", (2, 192, 640, 64), 128, 5, 2),
    ("conv3 5x5s2 128->256", (2, 96, 320, 128), 256, 5, 2),
    ("conv_redir etc 3x3s1 256->256", (2, 48, 160, 256), 256, 3, 1),
]

for name, ishape, cout, k, s in LAYERS:
    x = jnp.asarray(rng.rand(*ishape).astype(np.float32))
    w = jnp.asarray(
        rng.randn(k, k, ishape[-1], cout).astype(np.float32) * 0.01
    )

    def loss(x, w):
        return jnp.sum(conv(x, w, s) ** 2)

    dt_f = timed_loop(lambda a, b: loss(a, b), (x, w), n=20)
    g = jax.grad(loss, argnums=0)
    dt_g = timed_loop(lambda a, b: g(a, b), (x, w), n=20)
    print(f"{name}: fwd-ish {dt_f*1000:.2f} ms, dgrad {dt_g*1000:.2f} ms",
          flush=True)

# dgrad of conv1 with a channel-padded input (3 -> 32): does N-padding to a
# larger channel count improve the MXU tiling of the input-gradient conv?
x = jnp.asarray(rng.rand(2, 384, 1280, 32).astype(np.float32))
w = jnp.asarray(rng.randn(7, 7, 32, 64).astype(np.float32) * 0.01)
def loss32(x, w):
    return jnp.sum(conv(x, w, 2) ** 2)
g32 = jax.grad(loss32, argnums=0)
dt = timed_loop(lambda a, b: g32(a, b), (x, w), n=20)
print(f"conv1-pad32 dgrad: {dt*1000:.2f} ms", flush=True)

# crop-restricted dgrad: only a 128x128 patch region of the image gradient
# is needed (the patch update masks everything else).  Cone at conv1 input
# of a 128x128 patch ~ 140x140; dgrad on the cropped cotangent:
xs = jnp.asarray(rng.rand(2, 200, 200, 3).astype(np.float32))
ws = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.01)
def loss_s(x, w):
    return jnp.sum(conv(x, w, 2) ** 2)
gs = jax.grad(loss_s, argnums=0)
dt = timed_loop(lambda a, b: gs(a, b), (xs, ws), n=20)
print(f"conv1-crop200 dgrad: {dt*1000:.2f} ms", flush=True)
print("done", flush=True)
