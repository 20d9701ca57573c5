"""PWC pyramid: two b8 siamese passes vs one batched b16 pass, with the
real TorchConv modules (in-graph pyramid measured 16.9 ms vs 11.5 for the
plain-lax standalone — find out what the module layer adds and whether
batch-concatenating the two streams pays).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_pyramid_bench.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from understanding_flow_robustness_tpu.models.layers import (
    TorchConv,
    leaky_relu,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

B, H, W = 8, 384, 1280
SPECS = [
    (16, "1a", "1aa", "1b"), (32, "2a", "2aa", "2b"),
    (64, "3a", "3aa", "3b"), (96, "4a", "4aa", "4b"),
    (128, "5a", "5aa", "5b"), (196, "6aa", "6a", "6b"),
]


class Pyr(nn.Module):
    batched: bool = False

    @nn.compact
    def __call__(self, im1, im2):
        def conv(feat, name, stride=1):
            c = TorchConv(feat, 3, stride, name=name)
            return lambda x: leaky_relu(c(x))

        stages = []
        for feat, a, aa, b in SPECS:
            stages.append(
                (conv(feat, f"conv{a}", stride=2), conv(feat, f"conv{aa}"),
                 conv(feat, f"conv{b}"))
            )

        def pyramid(x):
            feats = []
            for s2, s1, s1b in stages:
                x = s1b(s1(s2(x)))
                feats.append(x)
            return feats

        if self.batched:
            feats = pyramid(jnp.concatenate([im1, im2], axis=0))
            n = im1.shape[0]
            c1 = [f[:n] for f in feats]
            c2 = [f[n:] for f in feats]
        else:
            c1 = pyramid(im1)
            c2 = pyramid(im2)
        # keep every level live (sum of means), mimicking in-graph liveness
        return sum(jnp.mean(f) for f in c1) + sum(jnp.mean(f) for f in c2)


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    for name, batched in (("2x b8 siamese", False), ("1x b16 batched", True)):
        mod = Pyr(batched=batched)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), a[:1, :128, :128],
                              b[:1, :128, :128])
        fn = jax.jit(mod.apply)
        dt = timed_loop(lambda x, y, vv: fn(vv, x, y), (a, b, v), n=20)
        print(f"{name:15s}: {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
