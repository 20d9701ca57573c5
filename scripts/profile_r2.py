"""Round-2 profiling: patch-attack decomposition + warp wall measurements.

Run on the TPU chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_r2.py \
      > /tmp/profile_r2.out 2>&1
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.ops.interp import warp_backward
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
H, W = 384, 1280
rng = np.random.RandomState(0)


def report(name, dt, unit_scale=1.0):
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


def imgs(batch, h=H, w=W, c=3, dtype=np.float32):
    return (jnp.asarray(rng.rand(batch, h, w, c).astype(dtype)),
            jnp.asarray(rng.rand(batch, h, w, c).astype(dtype)))


print("== warp_backward (border mode, Resample2d semantics) ==", flush=True)
for B in (1, 8):
    img, _ = imgs(B)
    flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32) * 30)
    dt = timed_loop(lambda i, f: warp_backward(i, f, "border"), (img, flow), n=10)
    report(f"warp border b{B} {H}x{W}x3 f32", dt)
    dt = timed_loop(lambda i, f: warp_backward(i, f, "border"),
                    (img.astype(jnp.bfloat16), flow), n=10)
    report(f"warp border b{B} {H}x{W}x3 bf16", dt)

print("== FlowNetC batch-1 attack decomposition ==", flush=True)
fnc = fetch_model("FlowNetC", pretrained_path=None, init_size=(128, 128))
for B in (1, 2, 4, 8):
    a, b = imgs(B)
    dt = timed_loop(lambda x, y, v: fnc.predict_fn(v, x, y),
                    (a, b, fnc.variables), n=20)
    report(f"fnc fwd b{B}", dt)

a1, b1 = imgs(1)
tgt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))


def loss_fn(x, y, v, t):
    flow = fnc.predict_fn(v, x, y)
    return jnp.mean(jnp.sqrt(jnp.sum((flow - t) ** 2, axis=-1) + 1e-8))


grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))
dt = timed_loop(lambda x, y, v, t: grad_fn(x, y, v, t),
                (a1, b1, fnc.variables, tgt), n=10)
report("fnc fwd+bwd(imgs) b1", dt)

a4 = jnp.tile(a1, (4, 1, 1, 1))
b4 = jnp.tile(b1, (4, 1, 1, 1))
tgt4 = jnp.tile(tgt, (4, 1, 1, 1))
dt = timed_loop(lambda x, y, v, t: grad_fn(x, y, v, t),
                (a4, b4, fnc.variables, tgt4), n=10)
report("fnc fwd+bwd(imgs) b4 (tiled)", dt)

print("== FlowNet2 / SPyNet totals ==", flush=True)
for name in ("FlowNet2", "SpyNet"):
    m = fetch_model(name, pretrained_path=None, init_size=(128, 128))
    a, b = imgs(8)
    dt = timed_loop(lambda x, y, v: m.predict_fn(v, x, y), (a, b, m.variables), n=5)
    report(f"{name} fwd b8", dt)

print("done", flush=True)
