"""col2im-matmul conv input-gradient: parity with AD (the attack-backward
fast path, models/layers.py::conv2d_fast_dgrad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from understanding_flow_robustness_tpu.models.layers import conv2d_fast_dgrad

RNG = np.random.RandomState(5)


@pytest.mark.parametrize(
    "B,H,W,Ci,Co,k,s,p",
    [
        (2, 40, 56, 3, 16, 7, 2, 3),   # FlowNetC conv1 geometry class
        (1, 33, 47, 6, 8, 5, 2, 2),    # odd sizes
        (2, 24, 24, 4, 8, 3, 1, 1),    # stride 1
    ],
)
def test_fast_dgrad_matches_ad(B, H, W, Ci, Co, k, s, p):
    x = jnp.asarray(RNG.randn(B, H, W, Ci).astype(np.float32))
    w = jnp.asarray(RNG.randn(k, k, Ci, Co).astype(np.float32) * 0.1)
    out_shape = jax.eval_shape(
        lambda a, b: conv2d_fast_dgrad(a, b, (s, s), (p, p)), x, w
    ).shape
    g_out = jnp.asarray(RNG.randn(*out_shape).astype(np.float32))

    def loss_fast(a, b):
        return jnp.sum(conv2d_fast_dgrad(a, b, (s, s), (p, p)) * g_out)

    def loss_ref(a, b):
        return jnp.sum(
            lax.conv_general_dilated(
                a, b, (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) * g_out
        )

    np.testing.assert_allclose(
        np.asarray(loss_fast(x, w)), np.asarray(loss_ref(x, w)), rtol=1e-5
    )
    gf = jax.grad(loss_fast, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-5, rtol=1e-5)


def test_flownetc_attack_grad_matches_plain_path():
    """FlowNetC image-gradients with fast_dgrad forced on == auto-off."""
    from understanding_flow_robustness_tpu.models.flownet_family import (
        FlowNetC,
    )

    a = jnp.asarray(RNG.rand(1, 64, 128, 3).astype(np.float32))
    b = jnp.asarray(RNG.rand(1, 64, 128, 3).astype(np.float32))
    t = jnp.asarray(RNG.randn(1, 64, 128, 2).astype(np.float32))
    mod = FlowNetC()
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), a, b)

    def loss(x1, x2):
        flow = mod.apply(v, x1, x2)
        return jnp.mean(jnp.sqrt(jnp.sum((flow - t) ** 2, -1) + 1e-8))

    g_plain = jax.grad(loss, argnums=(0, 1))(a, b)

    import understanding_flow_robustness_tpu.models.layers as layers_mod

    orig = layers_mod.TorchConv.fast_dgrad
    # force the fast path on (the auto gate is TPU-only; tests run on CPU)
    try:
        layers_mod.TorchConv.__dataclass_fields__["fast_dgrad"].default = True
        mod2 = FlowNetC()
        g_fast = jax.grad(
            lambda x1, x2: jnp.mean(jnp.sqrt(jnp.sum(
                (mod2.apply(v, x1, x2) - t) ** 2, -1) + 1e-8)),
            argnums=(0, 1),
        )(a, b)
    finally:
        layers_mod.TorchConv.__dataclass_fields__["fast_dgrad"].default = orig

    for gp, gf in zip(g_plain, g_fast):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gf),
                                   atol=2e-5, rtol=1e-4)
