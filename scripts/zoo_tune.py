"""SpyNet s2d + FlowNet2 radius/bf16 tuning on TPU.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/zoo_tune.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import understanding_flow_robustness_tpu.ops.interp as interp
from understanding_flow_robustness_tpu.models.flownet2 import FlowNet2
from understanding_flow_robustness_tpu.models.spynet import SpyNet
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(8, 384, 1280, 3).astype(np.float32))
b = jnp.asarray(rng.rand(8, 384, 1280, 3).astype(np.float32))

for d in (None, jnp.bfloat16):
    mod = SpyNet(nlevels=6, dtype=d)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    t = timed_loop(lambda x, y, vv: mod.apply(vv, x, y), (a, b, v), n=10)
    print(f"SpyNet s2d dtype={d} b8: {t*1000:.2f} ms = {8/t:.1f} pairs/s",
          flush=True)

for ry in (32, 56):
    interp._WARP_TILED_DEFAULT_RY = ry
    interp._make_sample_exact.cache_clear()
    for d in (None, jnp.bfloat16):
        mod = FlowNet2(dtype=d)
        v = jax.jit(mod.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )
        t = timed_loop(lambda x, y, vv: mod.apply(vv, x, y), (a, b, v), n=10)
        print(f"FlowNet2 ry={ry} dtype={d} b8: {t*1000:.2f} ms "
              f"= {8/t:.1f} pairs/s", flush=True)
print("done", flush=True)
