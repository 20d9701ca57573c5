"""Bilinear sampling / warping / resizing primitives (NHWC, TPU-first).

These are the JAX equivalents of the sampling semantics used across the
reference suite; each function documents which reference behavior it
reproduces (cited as file:line into /root/reference):

* ``bilinear_sample``       -- generic differentiable gather-based sampler.
* ``grid_sample``           -- torch.nn.functional.grid_sample semantics
                               (zeros/border padding, align_corners on/off).
* ``warp_backward``         -- flow-based backward warping:
      - ``mode="border"`` reproduces the Resample2d CUDA op
        (models/resample2d_package/resample2d_kernel.cu:49-66 — indices
        clamped to the border, bilinear weights from the unclamped coord),
      - ``mode="zeros_mask"`` reproduces PWC-Net's ``warp``
        (models/PWCNet.py:164-204 — grid_sample zeros padding,
        align_corners=False, output multiplied by a warped-ones mask
        thresholded at 1e-4),
      - ``mode="spynet"`` reproduces SPyNet's ``Backward`` module
        (models/spynet.py:133-180 — align_corners=True grid construction,
        grid clamped to [-1,1], then align_corners=False sampling).
* ``resize_bilinear``       -- torch F.interpolate(mode="bilinear") for both
                               align_corners settings (no anti-aliasing).
* ``upsample_nearest``      -- torch nearest upsampling for integer scales.
* ``avg_pool2``             -- torch F.avg_pool2d(kernel=2, stride=2).

All functions take NHWC tensors: TPU vector lanes run along the trailing
(channel) axis and XLA convolutions prefer NHWC, unlike the reference's NCHW.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _gather_hw(img: Array, iy: Array, ix: Array) -> Array:
    """Gather img[b, iy, ix, :] for per-batch index maps.

    img: (B, H, W, C); iy/ix: integer arrays (B, *S). Returns (B, *S, C).
    Implemented as a flattened one-axis take_along_axis, which XLA lowers to
    a single gather (TPU-friendlier than multi-axis fancy indexing).
    """
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(img.shape[:1] + iy.shape[1:] + (C,))


def bilinear_sample(
    img: Array,
    x: Array,
    y: Array,
    padding_mode: str = "zeros",
) -> Array:
    """Differentiable bilinear sampling at pixel coordinates.

    img: (B, H, W, C). x, y: (B, *S) float pixel coordinates (x along W).
    Returns (B, *S, C).

    padding_mode:
      * "zeros":  out-of-bounds taps contribute 0 (torch grid_sample zeros).
      * "border": coordinates clamped to the image border (torch border mode;
        also exactly the Resample2d kernel's clamp-index behavior,
        resample2d_kernel.cu:49-66).
    """
    B, H, W, C = img.shape
    compute_dtype = img.dtype
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(compute_dtype)[..., None]
    wy = (y - y0).astype(compute_dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = _gather_hw(img, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
            return v * valid[..., None].astype(compute_dtype)

    elif padding_mode == "border":

        def tap(yi, xi):
            return _gather_hw(
                img, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)
            )

    else:
        raise ValueError(f"unknown padding_mode: {padding_mode}")

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)

    one = jnp.ones((), compute_dtype)
    return (
        v00 * (one - wy) * (one - wx)
        + v01 * (one - wy) * wx
        + v10 * wy * (one - wx)
        + v11 * wy * wx
    )


def nearest_sample(img: Array, x: Array, y: Array) -> Array:
    """Nearest-neighbor sampling with border clamping.

    Matches Resample2d's bilinear=False branch
    (resample2d_kernel.cu:68-72: floor(coord + 0.5), clamped).
    """
    H, W = img.shape[1:3]
    xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
    return _gather_hw(img, yi, xi)


def unnormalize_coords(
    gx: Array, gy: Array, height: int, width: int, align_corners: bool
) -> tuple[Array, Array]:
    """[-1, 1] normalized grid coords -> pixel coords (torch conventions)."""
    if align_corners:
        x = (gx + 1.0) * 0.5 * (width - 1)
        y = (gy + 1.0) * 0.5 * (height - 1)
    else:
        x = ((gx + 1.0) * width - 1.0) * 0.5
        y = ((gy + 1.0) * height - 1.0) * 0.5
    return x, y


def grid_sample(
    img: Array,
    grid: Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> Array:
    """torch.nn.functional.grid_sample (bilinear) for NHWC tensors.

    img: (B, H, W, C); grid: (B, Ho, Wo, 2) with grid[..., 0] = normalized x.
    Returns (B, Ho, Wo, C).
    """
    gx, gy = grid[..., 0], grid[..., 1]
    x, y = unnormalize_coords(gx, gy, img.shape[1], img.shape[2], align_corners)
    return bilinear_sample(img, x, y, padding_mode=padding_mode)


def coords_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """(H, W, 2) pixel-coordinate grid, channel order (x, y).

    Matches RAFT's coords_grid (models/raft/utils/utils.py:79-82) modulo the
    NHWC layout (reference returns (B, 2, H, W)).
    """
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Tiled MXU fast path for full-image warps (ops/pallas/warp_tile.py).
#
# The kernel is exact whenever every pixel's bilinear support fits its
# tile's flow-following slab; it reports a violation count and we
# lax.cond-fall back to the gather formulation otherwise, so semantics
# never change.  Gradients always route through the gather formulation
# (warp backward only matters on training/attack paths, which are not
# warp-bound — PERF.md "Gather warps").

_WARP_TILED_DEFAULT_RY = 32
_WARP_TILED_DEFAULT_RX = 64
# Bounded exact correction of kernel-violating pixels, two granularities
# (the all-or-nothing fallback this replaces paid the full 18x gather
# penalty for a single escaped pixel, and jnp.nonzero over the per-pixel
# mask costs 27 ms at FlowNet2 geometry — measured — so selection happens
# over ~60K per-tile counts instead):
#  * SPARSE tiles (<= _PER_TILE violations: smooth flows strand a handful
#    of isolated pixels — 80 of 3.9M for a x4-upsampled random field, or
#    ~700 heavy-tail pixels for a random-weight cascade) — per-pixel
#    correction located by a 2-D rank cumsum + per-row searchsorted.
#  * DENSE tiles (> _PER_TILE violations: a motion discontinuity inside
#    one tile drags the slab origin and strands a large fraction of the
#    tile) — every pixel of the tile re-sampled; harmless where the
#    kernel was already exact (identical values).
# Fallback to the full gather only past both budgets.
_WARP_SPARSE_TILE_BUDGET = 1024
_WARP_DENSE_TILE_BUDGET = 64
_WARP_PER_TILE = 16


def _bilinear_point_sample(img: Array, b: Array, x: Array, y: Array,
                           padding_mode: str) -> Array:
    """Exact per-point bilinear sampling: img (B, H, W, C), b/x/y (K,)
    batch indices + pixel coordinates -> (K, C).  Value-identical to
    ``bilinear_sample`` at (b, x, y) (tested)."""
    B, H, W, C = img.shape
    compute_dtype = img.dtype
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(compute_dtype)[:, None]
    wy = (y - y0).astype(compute_dtype)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(B * H * W, C)
    base = b * (H * W)

    def tap(yi, xi):
        v = jnp.take(
            flat,
            base + jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1),
            axis=0,
        )
        if padding_mode == "zeros":
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = v * valid[:, None].astype(compute_dtype)
        return v

    one = jnp.ones((), compute_dtype)
    return (
        tap(y0i, x0i) * (one - wy) * (one - wx)
        + tap(y0i, x0i + 1) * (one - wy) * wx
        + tap(y0i + 1, x0i) * wy * (one - wx)
        + tap(y0i + 1, x0i + 1) * wy * wx
    )


def _correct_at(out: Array, img: Array, x: Array, y: Array, b: Array,
                pix: Array, padding_mode: str) -> Array:
    """Overwrite ``out`` at flat pixel indices ``pix`` (batch indices
    ``b``) with the exact gather-formulation bilinear value.  Every
    written value is the EXACT value at its pixel, so duplicate writes
    (fill slots, clamped boundary overlaps, pixels the kernel already got
    right) all carry identical values — scatter order cannot matter."""
    B, H, W, C = img.shape
    corrected = _bilinear_point_sample(
        img, b,
        jnp.take(x.reshape(-1), pix),
        jnp.take(y.reshape(-1), pix),
        padding_mode,
    )
    outf = out.reshape(B * H * W, C)
    return outf.at[pix].set(corrected.astype(out.dtype)).reshape(B, H, W, C)


def _correct_whole_tiles(out: Array, img: Array, x: Array, y: Array,
                         flags: Array, T: int, budget: int,
                         padding_mode: str) -> Array:
    """Re-sample EVERY pixel of <= budget flagged tiles (flags: (B*T,)
    bool, row-major tiles of the padded TH x TW grid)."""
    from .pallas.warp_tile import TH, TW

    B, H, W, C = img.shape
    ntx = (W + (-W) % TW) // TW
    P = TH * TW
    (tidx,) = jnp.nonzero(flags, size=min(budget, B * T), fill_value=0)
    b = tidx // T
    t = tidx % T
    # absolute pixel coordinates, clamped into the real image (padded-grid
    # tiles straddling the boundary re-correct edge pixels — harmless)
    rows = jnp.clip(
        (t // ntx)[:, None] * TH + jnp.arange(TH)[None, :], 0, H - 1
    )  # (K, TH)
    cols = jnp.clip(
        (t % ntx)[:, None] * TW + jnp.arange(TW)[None, :], 0, W - 1
    )  # (K, TW)
    pix = (
        (b[:, None, None] * H + rows[:, :, None]) * W + cols[:, None, :]
    ).reshape(-1)
    return _correct_at(out, img, x, y, jnp.repeat(b, P), pix, padding_mode)


def _correct_sparse_tiles(out: Array, img: Array, x: Array, y: Array,
                          viol_tp: Array, flags: Array, budget: int,
                          per_tile: int, padding_mode: str) -> Array:
    """Correct up to ``per_tile`` violating pixels in each of <= budget
    flagged tiles.  viol_tp: (B, T, P) tile-major per-pixel violations.
    Pixel positions inside each selected tile are located by a rank
    cumsum + per-row searchsorted (rank j's first index IS the j-th
    violating pixel), avoiding any large flat nonzero."""
    from .pallas.warp_tile import TH, TW

    B, H, W, C = img.shape
    ntx = (W + (-W) % TW) // TW
    T, P = viol_tp.shape[1], viol_tp.shape[2]
    (tidx,) = jnp.nonzero(flags, size=min(budget, B * T), fill_value=0)
    sel = jnp.take(viol_tp.reshape(B * T, P), tidx, axis=0)  # (K, P)
    ranks = jnp.cumsum(sel.astype(jnp.int32), axis=1)
    q = jnp.arange(1, per_tile + 1)
    pos = jax.vmap(lambda r: jnp.searchsorted(r, q, side="left"))(ranks)
    # j > count slots point at the tile's pixel 0: exact rewrite, harmless
    pos = jnp.where(q[None, :] <= ranks[:, -1:], pos, 0)  # (K, per_tile)
    b = tidx // T
    t = tidx % T
    rows = jnp.clip((t // ntx)[:, None] * TH + pos // TW, 0, H - 1)
    cols = jnp.clip((t % ntx)[:, None] * TW + pos % TW, 0, W - 1)
    pix = ((b[:, None] * H + rows) * W + cols).reshape(-1)
    return _correct_at(
        out, img, x, y, jnp.repeat(b, per_tile), pix, padding_mode
    )


def _tiled_eligible(img_shape, ry, rx):
    """Effective radii for the tiled kernel, or None if the geometry is too
    small to profit (tiny pyramid levels gather fast anyway).

    Kernel cost is ~2*T*C*P*sh*sw FLOPs (every output pixel contracts its
    whole slab), so wide-channel inputs only profit when the image is big
    enough that the gather path's per-element cost dominates: measured at
    PWC level 2 (96x320, C=33 with the rode-along mask) the kernel wins
    10x (1.3 vs 13.7 ms) with an 8-row slab radius, while at the 24x80 /
    48x160 levels (C=65/97) the two paths are a wash — hence the
    C-vs-area gate below.  For C > 8 the vertical radius is capped at 8:
    sh scales kernel FLOPs linearly and the bounded exact correction
    patches the (rare, smooth-flow) escapees.
    """
    from .pallas.warp_tile import TH, TW

    B, H, W, C = img_shape
    hp = H + (-H) % TH
    wp = W + (-W) % TW
    ry_eff = min(ry, (hp - TH - 2) // 2)
    rx_eff = min(rx, (wp - TW - 2) // 2)
    if ry_eff < 8 or rx_eff < 8:
        return None
    if C > 8:
        if C > 40 or H * W < 16384:
            return None
        ry_eff = min(ry_eff, 8)
    return ry_eff, rx_eff


@functools.lru_cache(maxsize=None)
def _make_sample_exact(padding_mode: str, ry: int, rx: int, interpret: bool):
    """custom_vjp sampler: tiled-kernel forward with exact bounded
    scatter-correction of violating pixels (gather fallback only past the
    correction budget); gather-formulation backward."""
    from .pallas.warp_tile import (
        warp_tiled_sample,
        warp_tiled_violation_plan,
    )

    def _forward(img, x, y):
        H, W = img.shape[1:3]
        if padding_mode == "border":
            sx = jnp.clip(x, 0.0, W - 1.0)
            sy = jnp.clip(y, 0.0, H - 1.0)
        else:
            sx, sy = x, y
        zeros = padding_mode == "zeros"
        # violation test first (cheap, elementwise): the cond then runs
        # EITHER the kernel OR the gather — a heavily-violating input
        # never pays for both paths.  A lightly-violating one (the common
        # real-flow case) runs the kernel and exactly patches the
        # violations at two granularities (see the budget constants).
        viol_tp, tile_counts, viol, kplan = warp_tiled_violation_plan(
            img.shape, sy, sx, ry=ry, rx=rx, zeros_mode=zeros
        )
        T = tile_counts.shape[1]
        flat_counts = tile_counts.reshape(-1)
        dense = flat_counts > _WARP_PER_TILE
        sparse = (flat_counts > 0) & ~dense
        n_dense = jnp.sum(dense.astype(jnp.int32))
        n_sparse = jnp.sum(sparse.astype(jnp.int32))

        def kernel_path():
            # Image warps (C <= 8, [0,1]-range pixels) tolerate the MXU's
            # default single-pass bf16 multiplies (~4e-3 sampling error,
            # AMP-comparable).  FEATURE warps (wide-channel eligibility,
            # PWC level 2) feed cost volumes, so they run the kernel's
            # manual bf16x3 decomposition (~f32-exact, maxerr 4e-5;
            # measured 4.2 vs the gather path's 13.7 ms — PWC e2e flow
            # drift drops from 0.56% to noise).
            out = warp_tiled_sample(
                img, sy, sx, ry=ry, rx=rx, zeros_mode=zeros,
                interpret=interpret,
                precision=("highest" if img.shape[-1] > 8 else "default"),
                plan=kplan,   # planning already ran above; don't repeat it
            )[0]

            def correct():
                o = _correct_sparse_tiles(
                    out, img, x, y, viol_tp, sparse,
                    _WARP_SPARSE_TILE_BUDGET, _WARP_PER_TILE, padding_mode,
                )
                return lax.cond(
                    n_dense > 0,
                    lambda: _correct_whole_tiles(
                        o, img, x, y, dense, T, _WARP_DENSE_TILE_BUDGET,
                        padding_mode,
                    ),
                    lambda: o,
                )

            return lax.cond(viol > 0, correct, lambda: out)

        return lax.cond(
            (n_dense > _WARP_DENSE_TILE_BUDGET)
            | (n_sparse > _WARP_SPARSE_TILE_BUDGET),
            lambda: bilinear_sample(img, x, y, padding_mode=padding_mode),
            kernel_path,
        )

    @jax.custom_vjp
    def sample(img, x, y):
        return _forward(img, x, y)

    def fwd(img, x, y):
        return _forward(img, x, y), (img, x, y)

    def bwd(res, g):
        img, x, y = res
        _, vjp = jax.vjp(
            lambda i, xx, yy: bilinear_sample(
                i, xx, yy, padding_mode=padding_mode
            ),
            img, x, y,
        )
        return vjp(g)

    sample.defvjp(fwd, bwd)
    return sample


def bilinear_sample_auto(
    img: Array,
    x: Array,
    y: Array,
    padding_mode: str = "zeros",
    ry: Optional[int] = None,
    rx: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """``bilinear_sample`` with the tiled-MXU fast path when profitable.

    Requires x/y shaped (B, H, W) matching img's spatial dims (the warp
    call pattern).  Exact for every input: the kernel self-reports pixels
    outside its slab coverage and the op falls back to the gather path.
    """
    if ry is None:
        ry = _WARP_TILED_DEFAULT_RY
    if rx is None:
        rx = _WARP_TILED_DEFAULT_RX
    from .kernel_gate import pallas_disabled

    eligible = (
        (interpret or jax.default_backend() == "tpu")
        and not pallas_disabled()
        and x.ndim == 3
        and x.shape == img.shape[:3]
    )
    if eligible:
        radii = _tiled_eligible(img.shape, ry, rx)
        if radii is not None:
            fn = _make_sample_exact(padding_mode, *radii, interpret)
            return fn(img, x, y)
    return bilinear_sample(img, x, y, padding_mode=padding_mode)


def warp_backward(img: Array, flow: Array, mode: str = "border",
                  ry: Optional[int] = None, rx: Optional[int] = None) -> Array:
    """Backward-warp ``img`` by ``flow``: out(y, x) = img(y + v, x + u).

    img: (B, H, W, C); flow: (B, H, W, 2) with flow[..., 0] = u (x-displ.).
    ry/rx override the tiled-kernel slab radii for call sites whose flows
    have larger within-tile variation than the defaults cover (the op is
    exact either way — mis-sized radii only cost the gather fallback).

    mode:
      * "border":     Resample2d semantics (FlowNet2 stage chaining,
                      models/flownet2_models.py:41-183).
      * "zeros_mask": PWC-Net ``warp`` semantics (models/PWCNet.py:164-204):
                      zeros-padded align_corners=False grid_sample on a
                      normalized grid, multiplied by warped-ones mask >= 1e-4.
      * "spynet":     SPyNet ``Backward`` (models/spynet.py:133-180):
                      grid built with linspace(-1,1) (align_corners=True
                      spacing), flow normalized by (size-1)/2, grid clamped
                      to [-1,1], sampled with align_corners=False zeros.
    """
    B, H, W, _ = img.shape
    base = coords_grid(H, W, dtype=jnp.float32)[None]
    x = base[..., 0] + flow[..., 0].astype(jnp.float32)
    y = base[..., 1] + flow[..., 1].astype(jnp.float32)

    if mode == "border":
        return bilinear_sample_auto(img, x, y, padding_mode="border",
                                    ry=ry, rx=rx)

    if mode == "zeros_mask":
        # PWCNet.warp normalizes with 2*coord/(size-1) - 1 and samples with
        # the torch>=1.3 default align_corners=False, so the effective pixel
        # coordinate is shifted; reproduce exactly via the normalized path.
        gx = 2.0 * x / max(W - 1, 1) - 1.0
        gy = 2.0 * y / max(H - 1, 1) - 1.0
        px, py = unnormalize_coords(gx, gy, H, W, align_corners=False)
        out = bilinear_sample_auto(img, px, py, padding_mode="zeros",
                                   ry=ry, rx=rx)
        # The reference's warped-ones mask (grid_sample of ones, zeros
        # padding) is exactly separable: each tap's in-bounds indicator
        # factors per axis, so sum_ij w_i w_j in_i in_j =
        # (sum_i w_i in_i)(sum_j w_j in_j).  Computing it analytically
        # (instead of sampling a rode-along ones channel) keeps the
        # >= 1e-4 threshold bit-stable across sampler implementations —
        # a 4e-5 kernel-vs-gather difference in a sampled ones channel
        # flips boundary mask bits and was the dominant term in PWC's
        # kernel-vs-gather flow drift (measured 0.43%).
        def axis_weight(coord, size):
            f0 = jnp.floor(coord)
            frac = coord - f0
            w0 = jnp.where((f0 >= 0) & (f0 <= size - 1), 1.0 - frac, 0.0)
            w1 = jnp.where((f0 + 1 >= 0) & (f0 + 1 <= size - 1), frac, 0.0)
            return w0 + w1

        mask = axis_weight(px, W) * axis_weight(py, H)
        mask = (mask >= 1e-4).astype(img.dtype)[..., None]
        return out * mask

    if mode == "spynet":
        # linspace(-1, 1, N) grid == align_corners=True normalization.
        gx = jnp.clip(2.0 * x / max(W - 1, 1) - 1.0, -1.0, 1.0)
        gy = jnp.clip(2.0 * y / max(H - 1, 1) - 1.0, -1.0, 1.0)
        px, py = unnormalize_coords(gx, gy, H, W, align_corners=False)
        return bilinear_sample_auto(img, px, py, padding_mode="zeros",
                                    ry=ry, rx=rx)

    raise ValueError(f"unknown warp mode: {mode}")


def resize_bilinear(
    x: Array, out_h: int, out_w: int, align_corners: bool = False
) -> Array:
    """torch F.interpolate(..., mode="bilinear") parity (no anti-aliasing).

    Used for the x4 eval upsampling in FlowNetC/PWC (models/FlowNetC.py:66,
    models/PWCNet.py:349-359, align_corners=False), upflow8 in RAFT
    (models/raft/utils/utils.py:85-87, align_corners=True), and the
    loss-side GT/prediction rescaling (patch_attacks/losses.py:12).
    """
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    if align_corners:
        xs = jnp.arange(out_w, dtype=jnp.float32) * (
            (W - 1) / (out_w - 1) if out_w > 1 else 0.0
        )
        ys = jnp.arange(out_h, dtype=jnp.float32) * (
            (H - 1) / (out_h - 1) if out_h > 1 else 0.0
        )
    else:
        xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (W / out_w) - 0.5
        ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (H / out_h) - 0.5
    # Separable 1-D interpolation along W then H: two dense matmuls that map
    # onto the MXU instead of a 2-D gather.
    wx = _interp_matrix(xs, W, x.dtype)  # (out_w, W)
    wy = _interp_matrix(ys, H, x.dtype)  # (out_h, H)
    x = jnp.einsum("ow,bhwc->bhoc", wx, x)
    x = jnp.einsum("oh,bhwc->bowc", wy, x)
    return x


def _interp_matrix(coords: Array, size: int, dtype) -> Array:
    """Dense 1-D linear-interpolation matrix M with M @ v = interp(v)."""
    c = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(c)
    w = c - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, size - 1)
    n = coords.shape[0]
    rows = jnp.arange(n)
    m = jnp.zeros((n, size), jnp.float32)
    m = m.at[rows, lo_i].add(1.0 - w)
    m = m.at[rows, hi_i].add(w)
    return m.astype(dtype)


def upsample_nearest(x: Array, scale: int) -> Array:
    """torch F.interpolate(mode="nearest") for integer scale factors.

    Used by FlowNet2's upsample3/upsample4 (models/flownet2_models.py:60-61).
    """
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def avg_pool2(x: Array) -> Array:
    """torch F.avg_pool2d(kernel_size=2, stride=2) on NHWC (floor division,
    remainder rows/cols dropped) — used by the RAFT corr pyramid
    (models/raft/corr.py:57-64) and SPyNet's image pyramid
    (models/spynet.py:216-229)."""
    B, H, W, C = x.shape
    h2, w2 = H // 2, W // 2
    x = x[:, : 2 * h2, : 2 * w2, :].reshape(B, h2, 2, w2, 2, C)
    # reshape-mean instead of reduce_window: differentiable for every dtype
    # (reduce_window with a non-literal init has no VJP) and fuses cleanly
    return (x.sum(axis=(2, 4)) * jnp.asarray(0.25, jnp.float32)).astype(
        x.dtype
    )


def compute_pad(height: int, width: int, mode: str = "sintel", multiple: int = 8):
    """Pad amounts (top, bottom, left, right) to reach a multiple, matching
    InputPadder (models/raft/utils/utils.py:7-23): sintel pads symmetrically,
    kitti pads bottom/right-only on H and symmetric on W."""
    pad_h = (-height) % multiple
    pad_w = (-width) % multiple
    if mode == "sintel":
        return (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)
    return (0, pad_h, pad_w // 2, pad_w - pad_w // 2)


def apply_pad(x: Array, pad: tuple[int, int, int, int]) -> Array:
    """Replicate-pad NHWC by (top, bottom, left, right)."""
    t, b, l, r = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def remove_pad(x: Array, pad: tuple[int, int, int, int]) -> Array:
    t, b, l, r = pad
    H, W = x.shape[1:3]
    return x[:, t : H - b, l : W - r, :]
