"""Patch-attack timing with packed dgrad."""
import numpy as np, jax, jax.numpy as jnp
from understanding_flow_robustness_tpu.models.flownet_family import FlowNetC
from understanding_flow_robustness_tpu.attacks.patch_attack import (
    PatchAttackConfig,
    make_patch_attack_step,
)
from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop
enable_compilation_cache()
H, W = 384, 1280
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
tgt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))
mod = FlowNetC()
variables = jax.jit(mod.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
def loss(x1, x2, v, t):
    flow = mod.apply(v, x1, x2)
    return jnp.mean(jnp.sqrt(jnp.sum((flow - t) ** 2, -1) + 1e-8))
g = jax.value_and_grad(loss, argnums=(0, 1))
dt = timed_loop(lambda x1, x2, v, t: g(x1, x2, v, t), (a, b, variables, tgt), n=10)
print(f"fnc fwd+bwd(imgs) packed-dgrad b1: {dt*1000:.2f} ms", flush=True)

fnc = fetch_model("FlowNetC", pretrained_path=None, init_size=(128, 128))
n_steps = 8
cfg = PatchAttackConfig(max_count=n_steps, loss_threshold=0.0)
attack = make_patch_attack_step(fnc.predict_fn, cfg, takes_variables=True)
mask = np.zeros((1, H, W, 3), np.float32); mask[:, 100:200, 100:200] = 1.0
mask = jnp.asarray(mask)
patch = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)) * mask
target = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))
dt = timed_loop(lambda t, r, v: attack(t, r, patch, mask, patch, target, v)[:3],
                (a, b, fnc.variables), n=5)
print(f"patch attack: {n_steps/dt:.2f} iters/s "
      f"(vs 9.0 GPU -> {n_steps/dt/9.0:.2f}x)", flush=True)
print("done", flush=True)
