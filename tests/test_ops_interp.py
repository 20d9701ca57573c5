"""Parity tests for sampling/warping/resizing ops against torch oracles.

torch (CPU) ships in the environment, so instead of porting the reference's
CPU-vs-CUDA ``check.py`` pattern we compare the JAX ops directly against the
equivalent torch functional ops the reference models call.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from understanding_flow_robustness_tpu import ops

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


def to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode):
    img = _rand(2, 7, 9, 3)
    grid = (RNG.rand(2, 5, 6, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB

    ours = ops.grid_sample(
        jnp.asarray(img), jnp.asarray(grid),
        align_corners=align_corners, padding_mode=padding_mode,
    )
    ref = F.grid_sample(
        to_nchw(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    )
    np.testing.assert_allclose(np.asarray(ours), from_nchw(ref), atol=1e-5)


def test_warp_border_matches_resample2d_semantics():
    """Resample2d (resample2d_kernel.cu:49-66) == border-clamped bilinear
    sampling at pixel coords; check against a literal numpy transcription of
    the kernel's index math."""
    img = _rand(1, 6, 8, 2)
    flow = (_rand(1, 6, 8, 2) * 3.0)

    ours = np.asarray(ops.warp_backward(jnp.asarray(img), jnp.asarray(flow), "border"))

    B, H, W, C = img.shape
    ref = np.zeros_like(img)
    for y in range(H):
        for x in range(W):
            xf = x + flow[0, y, x, 0]
            yf = y + flow[0, y, x, 1]
            a = xf - np.floor(xf)
            b = yf - np.floor(yf)
            xl = int(np.clip(np.floor(xf), 0, W - 1))
            xr = int(np.clip(np.floor(xf) + 1, 0, W - 1))
            yt = int(np.clip(np.floor(yf), 0, H - 1))
            yb = int(np.clip(np.floor(yf) + 1, 0, H - 1))
            ref[0, y, x] = (
                (1 - a) * (1 - b) * img[0, yt, xl]
                + a * (1 - b) * img[0, yt, xr]
                + (1 - a) * b * img[0, yb, xl]
                + a * b * img[0, yb, xr]
            )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_zeros_mask_matches_pwc_warp():
    """PWC warp (models/PWCNet.py:164-204) oracle re-expressed in torch."""
    img = _rand(2, 6, 8, 3)
    flow = _rand(2, 6, 8, 2) * 2.5

    ours = np.asarray(
        ops.warp_backward(jnp.asarray(img), jnp.asarray(flow), "zeros_mask")
    )

    x_t = to_nchw(img)
    flo = to_nchw(flow)
    B, C, H, W = x_t.shape
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    grid = torch.cat(
        (xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
         yy.view(1, 1, H, W).repeat(B, 1, 1, 1)), 1
    ).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    out = F.grid_sample(x_t, vgrid, align_corners=False)
    mask = F.grid_sample(torch.ones_like(x_t), vgrid, align_corners=False)
    ref = out * (mask >= 1e-4).float()
    np.testing.assert_allclose(ours, from_nchw(ref), atol=1e-5)


def test_warp_spynet_matches_backward_module():
    """SPyNet Backward (models/spynet.py:133-180) oracle in torch."""
    img = _rand(2, 6, 8, 3)
    flow = _rand(2, 6, 8, 2) * 2.5

    ours = np.asarray(ops.warp_backward(jnp.asarray(img), jnp.asarray(flow), "spynet"))

    x_t = to_nchw(img)
    flo = to_nchw(flow)
    B, C, H, W = x_t.shape
    hor = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, 1, H, W)
    ver = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([hor, ver], 1)
    flo = torch.cat(
        [flo[:, 0:1] / ((W - 1.0) / 2.0), flo[:, 1:2] / ((H - 1.0) / 2.0)], 1
    )
    vgrid = (grid + flo).clamp(-1.0, 1.0).permute(0, 2, 3, 1)
    ref = F.grid_sample(x_t, vgrid, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, from_nchw(ref), atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(12, 16), (24, 32), (7, 9)])
def test_resize_bilinear_matches_torch(align_corners, size):
    img = _rand(2, 6, 8, 3)
    ours = ops.resize_bilinear(jnp.asarray(img), *size, align_corners=align_corners)
    ref = F.interpolate(
        to_nchw(img), size=size, mode="bilinear", align_corners=align_corners
    )
    np.testing.assert_allclose(np.asarray(ours), from_nchw(ref), atol=1e-5)


def test_upsample_nearest_matches_torch():
    img = _rand(2, 5, 7, 3)
    ours = ops.upsample_nearest(jnp.asarray(img), 4)
    ref = F.interpolate(to_nchw(img), scale_factor=4, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), from_nchw(ref), atol=0)


@pytest.mark.parametrize("hw", [(6, 8), (7, 9)])
def test_avg_pool2_matches_torch(hw):
    img = _rand(2, *hw, 3)
    ours = ops.avg_pool2(jnp.asarray(img))
    ref = F.avg_pool2d(to_nchw(img), 2, stride=2)
    np.testing.assert_allclose(np.asarray(ours), from_nchw(ref), atol=1e-6)


def test_channel_norm():
    img = _rand(2, 5, 7, 6)
    ours = ops.channel_norm(jnp.asarray(img))
    ref = np.linalg.norm(img, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_bilinear_sample_grad_flows():
    img = jnp.asarray(_rand(1, 6, 8, 2))
    flow = jnp.asarray(_rand(1, 6, 8, 2))

    def loss(f):
        return jnp.sum(ops.warp_backward(img, f, "border") ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_compute_pad_matches_input_padder():
    for mode in ["sintel", "kitti"]:
        for (h, w) in [(375, 1242), (436, 1024), (384, 1280)]:
            t, b, l, r = ops.compute_pad(h, w, mode=mode)
            pad_ht = (((h // 8) + 1) * 8 - h) % 8
            pad_wd = (((w // 8) + 1) * 8 - w) % 8
            if mode == "sintel":
                exp = [pad_wd // 2, pad_wd - pad_wd // 2,
                       pad_ht // 2, pad_ht - pad_ht // 2]
            else:
                exp = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
            assert [l, r, t, b] == exp


def test_kernel_gate_controls_tiled_warp_path():
    """ops.kernel_gate: under ``no_pallas_kernels()`` the tiled-MXU warp
    (a pallas_call, not SPMD-partitionable) must give way to the gather
    formulation at trace time; outside the gate (interpret mode standing
    in for TPU eligibility) the kernel path is selected."""
    import jax

    from understanding_flow_robustness_tpu.ops.interp import (
        bilinear_sample_auto,
        coords_grid,
    )
    from understanding_flow_robustness_tpu.ops.kernel_gate import (
        no_pallas_kernels,
        pallas_disabled,
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 256, 256, 3).astype(np.float32))
    base = coords_grid(256, 256, dtype=jnp.float32)[None]
    x, y = base[..., 0] + 1.3, base[..., 1] - 0.7

    def make_f():
        # fresh function object per trace: JAX's tracing cache is keyed on
        # function identity + avals and would otherwise return the first
        # trace regardless of the gate (the gate is trace-time state, so
        # every gated entry point uses a fresh closure — parallel/spatial.py)
        return lambda img, x, y: bilinear_sample_auto(
            img, x, y, interpret=True)

    assert not pallas_disabled()
    jaxpr_kernel = str(jax.make_jaxpr(make_f())(img, x, y))
    with no_pallas_kernels():
        assert pallas_disabled()
        jaxpr_gated = str(jax.make_jaxpr(make_f())(img, x, y))
    assert not pallas_disabled()

    assert "pallas_call" in jaxpr_kernel
    assert "pallas_call" not in jaxpr_gated
