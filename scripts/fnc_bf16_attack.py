"""Time FlowNetC b1 fwd+bwd(imgs) with f32 vs bf16 compute dtype.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fnc_bf16_attack.py
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

f32 = FlowNetC()
variables = jax.jit(f32.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)),
                              jnp.zeros((1, 64, 64, 3)))
bf16 = FlowNetC(dtype=jnp.bfloat16)


def make(mod):
    def loss(x1, x2, v, t):
        flow = mod.apply(v, x1, x2)
        return jnp.mean(jnp.sqrt(jnp.sum(
            (flow.astype(jnp.float32) - t) ** 2, -1) + 1e-8))
    return loss


for name, mod in (("f32", f32), ("bf16", bf16)):
    loss = make(mod)
    dt = timed_loop(lambda x1, x2, v, t: loss(x1, x2, v, t),
                    (a, b, variables, tgt), n=20)
    print(f"{name} fwd: {dt*1000:.2f} ms", flush=True)
    g = jax.value_and_grad(loss, argnums=(0, 1))
    dt = timed_loop(lambda x1, x2, v, t: g(x1, x2, v, t),
                    (a, b, variables, tgt), n=10)
    print(f"{name} fwd+bwd(imgs): {dt*1000:.2f} ms", flush=True)
    val, (g1, g2) = jax.jit(g)(a, b, variables, tgt)
    print(f"{name} loss={float(val):.4f} |g1|={float(jnp.abs(g1).mean()):.3e}",
          flush=True)
print("done", flush=True)
