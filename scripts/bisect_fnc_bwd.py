"""Bisect the FlowNetC batch-1 backward (fwd 3.75 ms vs fwd+bwd 22.6 ms).

Times grad-wrt-images of losses at increasing depth via return_features.
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bisect_fnc_bwd.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models.flownet_family import FlowNetC
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
H, W = 384, 1280
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
tgt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))

mod = FlowNetC(return_features=True)
variables = jax.jit(mod.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))


def run(v, x1, x2):
    return mod.apply(v, x1, x2)


def fwd_only(x1, x2, v, t):
    flow, _ = run(v, x1, x2)
    return jnp.mean(jnp.sqrt(jnp.sum((flow - t) ** 2, -1) + 1e-8))


TAPS = ["conv2a", "conv3a", "corr", "conv3_1"]


def make_loss(tap):
    def loss(x1, x2, v, t):
        flow, feats = run(v, x1, x2)
        if tap == "flow":
            return jnp.mean(jnp.sqrt(jnp.sum((flow - t) ** 2, -1) + 1e-8))
        f = feats[tap]
        if tap in ("conv2a", "conv3a"):
            f = f + feats[tap.replace("a", "b")]
        return jnp.sum(f.astype(jnp.float32) * 1e-6)
    return loss


print("fwd-only loss eval:", flush=True)
dt = timed_loop(lambda x1, x2, v, t: fwd_only(x1, x2, v, t),
                (a, b, variables, tgt), n=20)
print(f"  fwd: {dt*1000:.2f} ms", flush=True)

for tap in TAPS + ["flow"]:
    g = jax.grad(make_loss(tap), argnums=(0, 1))
    dt = timed_loop(lambda x1, x2, v, t: g(x1, x2, v, t),
                    (a, b, variables, tgt), n=10)
    print(f"  grad(imgs) of {tap}: {dt*1000:.2f} ms", flush=True)

print("done", flush=True)
