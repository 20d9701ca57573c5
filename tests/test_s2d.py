"""Space-to-depth conv transform: exactness vs the plain conv path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from understanding_flow_robustness_tpu.ops.s2d import (
    conv_s2d,
    depth_to_space,
    space_to_depth,
)

RNG = np.random.RandomState(11)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(RNG.rand(2, 16, 24, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


@pytest.mark.parametrize("k,ci,co", [(7, 8, 32), (7, 32, 64), (7, 16, 2),
                                     (3, 6, 16)])
def test_conv_s2d_matches_plain(k, ci, co):
    x = jnp.asarray(RNG.randn(2, 24, 40, ci).astype(np.float32))
    w = jnp.asarray(RNG.randn(k, k, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    out = conv_s2d(x, w, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_conv_s2d_rejects_k5():
    w = jnp.zeros((5, 5, 4, 8), jnp.float32)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    with pytest.raises(AssertionError):
        conv_s2d(x, w)


def test_spynet_s2d_path_matches_plain():
    from understanding_flow_robustness_tpu.models.spynet import SpyNet

    a = jnp.asarray(RNG.rand(1, 64, 96, 3).astype(np.float32))
    b = jnp.asarray(RNG.rand(1, 64, 96, 3).astype(np.float32))
    m0 = SpyNet(nlevels=4, use_s2d=False)
    m1 = SpyNet(nlevels=4, use_s2d=True)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), a, b)
    out0 = np.asarray(m0.apply(v, a, b))
    out1 = np.asarray(m1.apply(v, a, b))
    np.testing.assert_allclose(out0, out1, atol=5e-5, rtol=1e-4)
