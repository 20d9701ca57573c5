"""Tiled MXU warp kernel: interpret-mode parity + fallback semantics.

Mirrors the reference extension's check.py pattern (CPU-vs-CUDA allclose,
models/Pytorch-Correlation-extension/check.py) with the jnp gather
formulation as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from understanding_flow_robustness_tpu.ops.interp import (
    bilinear_sample,
    bilinear_sample_auto,
    coords_grid,
    warp_backward,
)
from understanding_flow_robustness_tpu.ops.pallas.warp_tile import (
    warp_tiled_sample,
)

RNG = np.random.RandomState(7)


def _coords(H, W, B, sigma, dx=0.0):
    base = coords_grid(H, W)[None]
    flow = RNG.randn(B, H, W, 2).astype(np.float32) * sigma
    flow[..., 0] += dx
    return (base[..., 1] + flow[..., 1], base[..., 0] + flow[..., 0])


@pytest.mark.parametrize("zeros_mode", [False, True])
def test_tiled_matches_gather_when_covered(zeros_mode):
    B, H, W, C = 2, 48, 256, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=3, dx=40.0)
    if not zeros_mode:
        sy, sx = jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1)
    out, viol = warp_tiled_sample(
        img, jnp.asarray(sy), jnp.asarray(sx), ry=16, rx=16,
        zeros_mode=zeros_mode, interpret=True,
    )
    ref = bilinear_sample(
        img, jnp.asarray(sx), jnp.asarray(sy),
        padding_mode="zeros" if zeros_mode else "border",
    )
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_violations_detected_for_discontinuous_flow():
    # W=512 so the snapped slab (sw=256) cannot cover a 300 px within-tile
    # discontinuity
    B, H, W, C = 1, 48, 512, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=2)
    sx = np.array(sx)
    sx[:, :, 100:200] += 300.0  # big discontinuity inside tiles
    sx = jnp.clip(jnp.asarray(sx), 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)
    _, viol = warp_tiled_sample(
        img, sy, sx, ry=16, rx=16, zeros_mode=False, interpret=True
    )
    assert int(viol) > 0


def test_wide_channel_eligibility_and_parity():
    """C > 8 inputs take the kernel only when the image is large enough
    (PWC level-2 geometry: 10x measured win), with the vertical slab
    radius capped at 8; tiny levels and very wide channels stay on the
    gather path."""
    from understanding_flow_robustness_tpu.ops.interp import _tiled_eligible

    # PWC L2: eligible, ry capped to 8
    assert _tiled_eligible((8, 96, 320, 33), 32, 64) == (8, 64)
    # small-area wide-channel levels (PWC L3/L4): ineligible
    assert _tiled_eligible((8, 48, 160, 65), 32, 64) is None
    assert _tiled_eligible((8, 24, 80, 97), 32, 64) is None
    # C > 40: ineligible regardless of area
    assert _tiled_eligible((8, 384, 1280, 48), 32, 64) is None
    # the classic small-channel full-res case keeps its radii
    assert _tiled_eligible((8, 384, 1280, 3), 32, 64) == (32, 64)

    # value parity at the PWC L2 shape (downscaled batch, interpret mode)
    B, H, W, C = 1, 96, 320, 32
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=1.5, dx=6.0)
    out = bilinear_sample_auto(
        img, jnp.asarray(sx), jnp.asarray(sy), padding_mode="zeros",
        interpret=True,
    )
    ref = bilinear_sample(
        img, jnp.asarray(sx), jnp.asarray(sy), padding_mode="zeros"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_auto_sampler_falls_back_exactly():
    """bilinear_sample_auto must equal the gather path even when the flow
    escapes the slab radius (the lax.cond fallback).  W=512 so the snapped
    slab (sw=256) cannot cover the discontinuity."""
    B, H, W, C = 1, 48, 512, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=2)
    sx = np.array(sx)
    sx[:, :, 100:200] += 300.0
    sx = jnp.clip(jnp.asarray(sx), 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)
    out = bilinear_sample_auto(
        img, sx, sy, padding_mode="border", ry=16, rx=16, interpret=True
    )
    ref = bilinear_sample(img, sx, sy, padding_mode="border")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_point_sampler_matches_bilinear_sample(padding_mode):
    """_bilinear_point_sample must equal bilinear_sample at scattered
    (b, x, y) points, including out-of-range coordinates."""
    from understanding_flow_robustness_tpu.ops.interp import (
        _bilinear_point_sample,
    )

    B, H, W, C = 3, 24, 40, 5
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    K = 64
    b = jnp.asarray(RNG.randint(0, B, K))
    x = jnp.asarray((RNG.rand(K) * (W + 20) - 10).astype(np.float32))
    y = jnp.asarray((RNG.rand(K) * (H + 20) - 10).astype(np.float32))
    got = _bilinear_point_sample(img, b, x, y, padding_mode)
    ref = np.stack([
        np.asarray(
            bilinear_sample(
                img[int(bi)][None], jnp.asarray([[xv]]), jnp.asarray([[yv]]),
                padding_mode=padding_mode,
            )
        )[0, 0]
        for bi, xv, yv in zip(np.asarray(b), np.asarray(x), np.asarray(y))
    ])
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_auto_sampler_corrects_few_violations(padding_mode):
    """A handful of escaped pixels must take the kernel + tile-correction
    path (not the full gather fallback) and still be exact."""
    B, H, W, C = 1, 48, 512, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=2)
    sx = np.array(sx)
    sx[0, 10, 100:110] += 300.0  # 10 escaped pixels inside one tile
    sx = jnp.asarray(sx)
    if padding_mode == "border":
        csx, csy = jnp.clip(sx, 0, W - 1), jnp.clip(sy, 0, H - 1)
    else:
        csx, csy = sx, sy
    from understanding_flow_robustness_tpu.ops.interp import (
        _WARP_DENSE_TILE_BUDGET,
        _WARP_SPARSE_TILE_BUDGET,
        _WARP_PER_TILE,
    )
    from understanding_flow_robustness_tpu.ops.pallas.warp_tile import (
        warp_tiled_violation_plan,
    )

    _, tile_counts, viol, _ = warp_tiled_violation_plan(
        img.shape, csy, csx, ry=16, rx=16,
        zeros_mode=padding_mode == "zeros",
    )
    # within correction budgets (the escaped pixels plus tile-mates their
    # dragged slab origin strands): correction path, exact
    counts = np.asarray(tile_counts).reshape(-1)
    assert 0 < int(viol)
    assert (counts > _WARP_PER_TILE).sum() <= _WARP_DENSE_TILE_BUDGET
    assert (
        (counts > 0) & (counts <= _WARP_PER_TILE)
    ).sum() <= _WARP_SPARSE_TILE_BUDGET
    out = bilinear_sample_auto(
        img, sx, sy, padding_mode=padding_mode, ry=16, rx=16, interpret=True
    )
    ref = bilinear_sample(img, sx, sy, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_auto_sampler_corrects_scattered_violations(padding_mode):
    """Heavy-tail case: isolated escaped pixels scattered over many tiles
    (the sparse searchsorted correction path) plus one dense cluster (the
    whole-tile path), simultaneously — still exact."""
    B, H, W, C = 2, 64, 512, 3
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=1)
    sx = np.array(sx)
    # ~48 isolated pixels spread over distinct tiles
    for k in range(48):
        b, r, c = k % B, (k * 7) % H, (k * 83) % W
        sx[b, r, c] += 200.0 * (1 if k % 2 else -1)
    sx[0, 20:28, 300:360] += 300.0  # dense cluster: >16 viol in its tiles
    sx = jnp.asarray(sx)
    out = bilinear_sample_auto(
        img, sx, sy, padding_mode=padding_mode, ry=16, rx=16, interpret=True
    )
    ref = bilinear_sample(img, sx, sy, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_padded_region_violations_do_not_count():
    """Coords whose violations lie only in the TH/TW padding region (edge
    replication) must not trigger fallback or correction — their kernel
    output is cropped."""
    from understanding_flow_robustness_tpu.ops.pallas.warp_tile import (
        warp_tiled_violation_mask,
    )

    B, H, W = 1, 44, 256  # H not a multiple of TH=8 -> 4 padded rows
    sy, sx = _coords(H, W, B, sigma=1)
    sy = jnp.clip(sy, 0, H - 1)
    sx = jnp.clip(sx, 0, W - 1)
    mask, viol = warp_tiled_violation_mask(
        (B, H, W, 3), sy, sx, ry=16, rx=16, zeros_mode=False
    )
    assert mask.shape == (B, H, W)
    assert int(viol) == int(np.asarray(mask).sum())


def test_auto_sampler_gradients_match_gather():
    """custom_vjp backward must equal AD through the gather formulation."""
    B, H, W, C = 1, 32, 128, 2
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    sy, sx = _coords(H, W, B, sigma=2)
    sx = jnp.clip(sx, 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)

    def loss_auto(i, x, y):
        return jnp.sum(
            bilinear_sample_auto(i, x, y, "border", ry=8, rx=8,
                                 interpret=True) ** 2
        )

    def loss_ref(i, x, y):
        return jnp.sum(bilinear_sample(i, x, y, "border") ** 2)

    g_auto = jax.grad(loss_auto, argnums=(0, 1, 2))(img, sx, sy)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(img, sx, sy)
    for a, r in zip(g_auto, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_warp_backward_modes_unchanged():
    """warp_backward must produce identical values through the refactored
    (concat-mask / auto-sampler) code paths on the gather backend."""
    B, H, W = 1, 40, 96
    img = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32))
    flow = jnp.asarray(RNG.randn(B, H, W, 2).astype(np.float32) * 4)
    for mode in ("border", "zeros_mask", "spynet"):
        out = warp_backward(img, flow, mode)
        assert out.shape == img.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    # zeros_mask against the two-pass formulation it replaced
    from understanding_flow_robustness_tpu.ops.interp import (
        unnormalize_coords,
    )

    base = coords_grid(H, W)[None]
    x = base[..., 0] + flow[..., 0]
    y = base[..., 1] + flow[..., 1]
    gx = 2.0 * x / (W - 1) - 1.0
    gy = 2.0 * y / (H - 1) - 1.0
    px, py = unnormalize_coords(gx, gy, H, W, align_corners=False)
    ref = bilinear_sample(img, px, py, padding_mode="zeros")
    mask = bilinear_sample(jnp.ones_like(img[..., :1]), px, py,
                           padding_mode="zeros")
    ref = ref * (mask >= 1e-4).astype(img.dtype)
    np.testing.assert_allclose(
        np.asarray(warp_backward(img, flow, "zeros_mask")), np.asarray(ref),
        atol=1e-6,
    )
