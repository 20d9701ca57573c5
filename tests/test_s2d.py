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


@pytest.mark.parametrize("norm,train", [
    ("instance", False), ("instance", True),
    ("batch", False), ("batch", True), ("none", False),
])
def test_basic_encoder_s2d_matches_plain(norm, train):
    """RAFT BasicEncoder's s2d layer1 stage (round 5: the 26 ms/step
    half-res 64-channel hotspot) is a value-identical kernel/stat
    rearrangement: identical params, outputs to float reassociation, and
    identical batch-stats updates (the phase-grouped reduction sums the
    same elements as the full-res one)."""
    from understanding_flow_robustness_tpu.models.raft_model import (
        BasicEncoder,
    )

    x = jnp.asarray(RNG.randn(2, 64, 96, 3).astype(np.float32))
    enc0 = BasicEncoder(256, norm, None, train, s2d=False)
    enc1 = BasicEncoder(256, norm, None, train, s2d=True)
    v = jax.jit(enc0.init)(jax.random.PRNGKey(0), x)
    kw = dict(mutable=["batch_stats"]) if norm == "batch" else {}
    y0 = enc0.apply(v, x, **kw)
    y1 = enc1.apply(v, x, **kw)
    if norm == "batch":
        (y0, s0), (y1, s1) = y0, y1
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            s0, s1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("k,ci,co", [(3, 64, 64), (3, 5, 16), (7, 8, 12)])
def test_s2_conv_s2d_in_matches_plain(k, ci, co):
    from understanding_flow_robustness_tpu.ops.s2d import s2_conv_s2d_in_kernel

    x = jnp.asarray(RNG.randn(2, 24, 40, ci).astype(np.float32))
    w = jnp.asarray(RNG.randn(k, k, ci, co).astype(np.float32) * 0.1)
    r = (k - 1) // 2
    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((r, r), (r, r)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    k2, (plo, phi) = s2_conv_s2d_in_kernel(w, r)
    out = lax.conv_general_dilated(
        space_to_depth(x), k2, (1, 1), ((plo, phi), (plo, phi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("ci,co", [(162, 16), (2, 2), (7, 5)])
def test_deconv4s2p1_s2d_out_matches_plain(ci, co):
    from understanding_flow_robustness_tpu.ops.s2d import (
        deconv4s2p1_s2d_out_kernel,
    )

    x = jnp.asarray(RNG.randn(2, 12, 20, ci).astype(np.float32))
    w = jnp.asarray(RNG.randn(4, 4, ci, co).astype(np.float32) * 0.1)
    ref = lax.conv_general_dilated(
        x, w[::-1, ::-1], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    k2 = deconv4s2p1_s2d_out_kernel(w)
    out = lax.conv_general_dilated(
        x, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(out)), np.asarray(ref),
        atol=2e-5, rtol=1e-5,
    )


def test_s2d_concat_perm():
    from understanding_flow_robustness_tpu.ops.s2d import (
        s2d_concat_perm, s2d_conv_kernel,
    )

    chans = (6, 3, 2)
    srcs = [jnp.asarray(RNG.randn(1, 8, 12, c).astype(np.float32))
            for c in chans]
    cat = jnp.concatenate(srcs, axis=-1)
    w = jnp.asarray(
        RNG.randn(3, 3, sum(chans), 4).astype(np.float32) * 0.1
    )
    ref = lax.conv_general_dilated(
        space_to_depth(cat), s2d_conv_kernel(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    cat_s2d = jnp.concatenate([space_to_depth(s) for s in srcs], axis=-1)
    k2 = s2d_conv_kernel(w)[:, :, jnp.asarray(s2d_concat_perm(chans)), :]
    out = lax.conv_general_dilated(
        cat_s2d, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("batch_norm", [False, True])
def test_flownetfusion_s2d_path_matches_plain(batch_norm):
    from understanding_flow_robustness_tpu.models.flownet2 import (
        FlowNetFusion,
    )

    x = jnp.asarray(RNG.rand(1, 32, 48, 11).astype(np.float32))
    m0 = FlowNetFusion(batch_norm=batch_norm, use_s2d=False)
    m1 = FlowNetFusion(batch_norm=batch_norm, use_s2d=True)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    out0 = np.asarray(m0.apply(v, x))
    out1 = np.asarray(m1.apply(v, x))
    assert out0.shape == out1.shape
    np.testing.assert_allclose(out0, out1, atol=5e-5, rtol=1e-4)


def test_flownetsd_s2d_path_matches_plain():
    from understanding_flow_robustness_tpu.models.flownet2 import FlowNetSD

    x = jnp.asarray(RNG.rand(1, 64, 128, 6).astype(np.float32))
    m0 = FlowNetSD(use_s2d=False)
    m1 = FlowNetSD(use_s2d=True)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    out0 = m0.apply(v, x)
    out1 = m1.apply(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(out0),
                    jax.tree_util.tree_leaves(out1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_torchconv_tuple_input_matches_concat():
    from understanding_flow_robustness_tpu.models.layers import TorchConv

    srcs = [jnp.asarray(RNG.randn(2, 12, 16, c).astype(np.float32))
            for c in (7, 3, 2)]
    cat = jnp.concatenate(srcs, axis=-1)
    m = TorchConv(9, 3, 1)
    v = m.init(jax.random.PRNGKey(0), cat)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, tuple(srcs))), np.asarray(m.apply(v, cat)),
        atol=2e-5, rtol=1e-5,
    )


def test_torchconvtranspose_tuple_input_matches_concat():
    from understanding_flow_robustness_tpu.models.layers import (
        TorchConvTranspose,
    )

    srcs = [jnp.asarray(RNG.randn(2, 8, 10, c).astype(np.float32))
            for c in (5, 4)]
    cat = jnp.concatenate(srcs, axis=-1)
    m = TorchConvTranspose(6, 4, 2, 1)
    v = m.init(jax.random.PRNGKey(0), cat)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, tuple(srcs))), np.asarray(m.apply(v, cat)),
        atol=2e-5, rtol=1e-5,
    )


def test_torchconv_tuple_s2d_matches_concat():
    from understanding_flow_robustness_tpu.models.layers import TorchConv
    from understanding_flow_robustness_tpu.ops.s2d import space_to_depth

    srcs = [jnp.asarray(RNG.randn(1, 8, 12, c).astype(np.float32))
            for c in (6, 3, 2)]
    cat = jnp.concatenate(srcs, axis=-1)
    m0 = TorchConv(5, 3, 1)
    v = m0.init(jax.random.PRNGKey(1), cat)
    ref = m0.apply(v, cat)
    m1 = TorchConv(5, 3, 1, s2d=True)
    out = m1.apply(v, tuple(space_to_depth(s) for s in srcs))
    from understanding_flow_robustness_tpu.ops.s2d import depth_to_space

    np.testing.assert_allclose(
        np.asarray(depth_to_space(out)), np.asarray(ref),
        atol=2e-5, rtol=1e-5,
    )
