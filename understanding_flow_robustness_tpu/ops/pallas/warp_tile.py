"""Tiled MXU bilinear warp (the TPU Resample2d / grid_sample fast path).

XLA lowers per-pixel bilinear sampling (``ops.interp.bilinear_sample``) to a
scalar gather: ~26 cycles per gathered element, ~11 ms for one full-res
3-channel warp on v5e — the cost wall behind FlowNet2's cascade warps
(models/flownet2_models.py:41-183) and SPyNet's per-level warps
(models/spynet.py:133-180).  This kernel replaces the gather with MXU
matmuls against tent-function selectors:

* The output is cut into (TH, TW) tiles.  For each tile the kernel DMAs a
  source slab of shape (SH, SW) = (TH + 2*ry + 2, TW + 2*rx + 2) from the
  C-major image in HBM at a data-dependent offset (the rounded mean
  sample coordinate of the tile, scalar-prefetched), so the slab follows
  the flow — the radius only has to cover the *within-tile variation* of
  the flow, not its absolute magnitude.
* The bilinear weight is a tent function ``relu(1 - |s - grid|)``.  The
  horizontal pass contracts slab columns against the tent selector in ONE
  C-batched (SH, SW) @ (SW, P) MXU dot; the vertical tent then reduces
  over slab rows on the VPU.  Zeros/border padding semantics fall out of
  the tent weights (border mode pre-clamps coordinates; zeros mode masks
  out-of-image rows/cols).
* Everything is built in transposed (grid, P) orientation from (1, P)
  coordinate rows — no in-kernel reshapes or transposes, which Mosaic
  either rejects or lowers as relayouts.  The XLA-side wrapper likewise
  never materializes a small-channel-minor layout (a C=3 lane-minor
  tensor pads 42x on TPU and OOMs at batch 8 — measured).
* Pixels whose true bilinear support is not fully inside their tile's
  slab are *violations*; the wrapper counts them (exact per-tap test) and
  ``lax.cond``-falls back to the scalar-gather path, so the op is exact
  for every input — the kernel is a fast path, never a semantics change.

Forward-only: gradients route through the gather formulation via
custom_vjp in ops.interp (warp backward only matters on training/attack
paths, which are not warp-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TH = 8    # output tile rows
TW = 128  # output tile cols (lane width)


def _warp_kernel(starts_ref, sy_ref, sx_ref, img_ref, out_ref, slab, sem,
                 *, sh, sw, c, height, width, tiles_per_image, zeros_mode,
                 precision):
    """One output tile.

    starts: scalar-prefetched (2*B*T,) SMEM int32; [2t] = start_y,
    [2t+1] = start_x absolute slab origin of tile t.
    sy/sx:  (1, 1, P) f32 absolute sample coordinates.
    img:    full (B, C, H, W) array in ANY memory space (manual DMA).
    out:    (1, C, P) block.
    slab:   (C, SH, SW) VMEM scratch; sem: DMA semaphore.
    """
    p = TH * TW
    t = pl.program_id(0)
    b = t // tiles_per_image
    # starts are stored as (8, 128)-tile indices and re-multiplied here so
    # Mosaic can prove the DMA slice offsets are tiling-aligned
    start_y = starts_ref[2 * t] * 8
    start_x = starts_ref[2 * t + 1] * 128

    cp = pltpu.make_async_copy(
        img_ref.at[b, :, pl.ds(start_y, sh), pl.ds(start_x, sw)],
        slab,
        sem,
    )
    cp.start()

    sy = sy_ref[0]  # (1, P)
    sx = sx_ref[0]

    # Transposed tent selectors, built directly in (grid, P) orientation
    # from the (1, P) coordinate rows (no transposes needed).
    cols = (lax.broadcasted_iota(jnp.int32, (sw, p), 0) + start_x)
    dh = sx - cols.astype(jnp.float32)  # (SW, P) via broadcast
    tenth = jnp.maximum(1.0 - jnp.abs(dh), 0.0)
    if zeros_mode:
        tenth = tenth * ((cols >= 0) & (cols < width)).astype(jnp.float32)

    rows = (lax.broadcasted_iota(jnp.int32, (sh, p), 0) + start_y)
    dv = sy - rows.astype(jnp.float32)  # (SH, P)
    tentv = jnp.maximum(1.0 - jnp.abs(dv), 0.0)
    if zeros_mode:
        tentv = tentv * ((rows >= 0) & (rows < height)).astype(jnp.float32)

    cp.wait()
    sl = slab[...]  # (C, SH, SW)

    def cdot(a, b):
        # C-batched (SH, SW) @ (SW, P): every output pixel's column
        # coordinate sampled across all slab rows — the gather became a
        # dense MXU dot.
        return lax.dot_general(
            a, jnp.broadcast_to(b[None], (c, sw, p)).astype(a.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if precision == "highest" and sl.dtype == jnp.float32:
        # Manual bf16x3 product decomposition (~f32-exact): Mosaic rejects
        # Precision.HIGH, and Precision.HIGHEST trips the 16 MB
        # scoped-VMEM stack limit at wide-channel shapes, so decompose by
        # hand — the dropped lo*lo term is O(2^-16) relative.
        sl_hi = sl.astype(jnp.bfloat16)
        sl_lo = (sl - sl_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        th_hi = tenth.astype(jnp.bfloat16)
        th_lo = (tenth - th_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        h = cdot(sl_hi, th_hi) + cdot(sl_lo, th_hi) + cdot(sl_hi, th_lo)
    else:
        h = cdot(sl, tenth)  # single-pass bf16 multiplies (default)
    # h: (C, SH, P)
    # Vertical tent: sublane reduction over SH on the VPU.
    out = jnp.sum(h * tentv[None], axis=1)  # (C, P)
    out_ref[0] = out.astype(out_ref.dtype)


def _tile_geometry(img_shape, ry, rx):
    """Padded geometry + aligned slab dims for (img_shape, radii)."""
    B, H, W, C = img_shape
    hp = H + (-H) % TH
    wp = W + (-W) % TW
    # Mosaic DMA slices must be tile-aligned: slab dims snap up to (8, 128)
    # multiples and slab origins snap down to the same grid (the violation
    # test uses the actual aligned geometry, so exactness is preserved).
    sh = TH + 2 * ry + 2
    sw = TW + 2 * rx + 2
    sh += (-sh) % 8
    sw += (-sw) % 128
    return hp, wp, sh, sw


def _plan_tiles(img_shape, sy, sx, ry, rx, zeros_mode):
    """Tile-major coords, slab origins and the exact violation count.

    Cheap (elementwise + tile reductions) — callers run this FIRST and
    lax.cond between the kernel and the gather path, so a violating input
    never pays for both.
    """
    B, H, W, C = img_shape
    hp, wp, sh, sw = _tile_geometry(img_shape, ry, rx)
    ph, pw = hp - H, wp - W
    if ph or pw:
        # edge-replicated coords keep each tile's mean local, so padding
        # never drags a slab origin away from the real pixels
        sy = jnp.pad(sy, ((0, 0), (0, ph), (0, pw)), mode="edge")
        sx = jnp.pad(sx, ((0, 0), (0, ph), (0, pw)), mode="edge")
    nty, ntx = hp // TH, wp // TW
    T = nty * ntx
    P = TH * TW

    # (B, T, P) tile-major coordinate layout (P stays lane-dense)
    def tiles(x):
        return x.reshape(B, nty, TH, ntx, TW).transpose(0, 1, 3, 2, 4).reshape(
            B, T, P
        )

    syt = tiles(sy.astype(jnp.float32))
    sxt = tiles(sx.astype(jnp.float32))

    # Data-dependent slab origin: center the slab on the tile's mean sample
    # coordinate, snapped to the NEAREST DMA-tiling grid point (flooring
    # would lose up to a whole alignment block of coverage on one side —
    # output tiles are themselves grid-aligned, so the centered origin
    # lands just below a grid line), clamped in-image.
    start_y = jnp.clip(
        ((jnp.round(jnp.mean(syt, axis=2)).astype(jnp.int32) - sh // 2 + 4)
         // 8) * 8,
        0, hp - sh,
    )  # (B, T)
    start_x = jnp.clip(
        ((jnp.round(jnp.mean(sxt, axis=2)).astype(jnp.int32) - sw // 2 + 64)
         // 128) * 128,
        0, wp - sw,
    )

    # Exact per-tap violation test: a tap is needed iff its bilinear weight
    # is nonzero and (zeros mode) it lies inside the image; it is served
    # iff it lies inside the slab.
    def tap_viol(coord, start, size, limit):
        f0 = jnp.floor(coord)
        w1 = coord - f0
        t0 = f0.astype(jnp.int32)
        lo, hi = start[:, :, None], start[:, :, None] + size - 1

        def needed(tap, w):
            n = w > 0.0
            if zeros_mode:
                n = n & (tap >= 0) & (tap < limit)
            return n

        v0 = needed(t0, 1.0 - w1) & ((t0 < lo) | (t0 > hi))
        v1 = needed(t0 + 1, w1) & ((t0 + 1 < lo) | (t0 + 1 > hi))
        return v0 | v1

    viol = tap_viol(syt, start_y, sh, H) | tap_viol(sxt, start_x, sw, W)
    # count REAL pixels only: the padded region's edge-replicated coords
    # can "violate" but their kernel output is cropped anyway, so they
    # must neither trigger a fallback nor need correction
    if ph or pw:
        valid = jnp.pad(
            jnp.ones((B, H, W), bool), ((0, 0), (0, ph), (0, pw))
        )
        viol = viol & tiles(valid)
    tile_counts = jnp.sum(viol.astype(jnp.int32), axis=2)  # (B, T)
    violations = jnp.sum(tile_counts)
    return syt, sxt, start_y, start_x, viol, tile_counts, violations


def warp_tiled_violations(
    img_shape, sy: Array, sx: Array, ry: int = 32, rx: int = 64,
    zeros_mode: bool = False,
) -> Array:
    """Just the violation count for (img_shape, coords, radii) — cheap;
    run before the kernel to pick a path without paying for both."""
    return _plan_tiles(img_shape, sy, sx, ry, rx, zeros_mode)[6]


def warp_tiled_violation_mask(
    img_shape, sy: Array, sx: Array, ry: int = 32, rx: int = 64,
    zeros_mode: bool = False,
) -> tuple[Array, Array]:
    """Per-pixel (B, H, W) bool violation mask + scalar count.

    A pixel violates when its bilinear support escapes its tile's slab —
    the kernel's value there is wrong and must be patched (the bounded
    tile correction in ops.interp) or the whole call routed to the
    gather path."""
    B, H, W, C = img_shape
    hp, wp, _, _ = _tile_geometry(img_shape, ry, rx)
    plan = _plan_tiles(img_shape, sy, sx, ry, rx, zeros_mode)
    viol = plan[4]
    nty, ntx = hp // TH, wp // TW
    mask = (
        viol.reshape(B, nty, ntx, TH, TW)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, hp, wp)[:, :H, :W]
    )
    return mask, plan[6]


def warp_tiled_violation_plan(
    img_shape, sy: Array, sx: Array, ry: int = 32, rx: int = 64,
    zeros_mode: bool = False,
) -> tuple[Array, Array, Array, tuple]:
    """(viol (B, T, P) bool tile-major, tile_counts (B, T) int32, total,
    kernel_plan) — tile order row-major over the TH x TW grid of the
    padded image.  The cheap selection domain for the bounded correction:
    violations cluster, and compacting ~60K tile flags costs ~400x less
    than compacting the per-pixel mask (a 27 ms cumsum at FlowNet2
    geometry — measured).

    ``kernel_plan`` is the (syt, sxt, start_y, start_x, total) tuple
    ``warp_tiled_sample(plan=...)`` accepts, so a caller that already ran
    this planning pass doesn't pay for it again inside the sample call
    (the lax.cond branch boundary there defeats CSE — ~10 elementwise/
    reduction passes over B*H*W coords per warp otherwise)."""
    plan = _plan_tiles(img_shape, sy, sx, ry, rx, zeros_mode)
    kernel_plan = (plan[0], plan[1], plan[2], plan[3], plan[6])
    return plan[4], plan[5], plan[6], kernel_plan


@functools.partial(
    jax.jit,
    static_argnames=("ry", "rx", "zeros_mode", "interpret", "precision"),
)
def warp_tiled_sample(
    img: Array,
    sy: Array,
    sx: Array,
    ry: int = 32,
    rx: int = 64,
    zeros_mode: bool = False,
    interpret: bool = False,
    precision: str = "default",
    plan: tuple | None = None,
) -> tuple[Array, Array]:
    """Sample ``img`` at absolute pixel coordinates via the tiled kernel.

    img: (B, H, W, C).  sy, sx: (B, H, W) f32 absolute sample coordinates
    (callers encode border clamping / normalized-grid conventions before
    this op).  Returns ``(out, violations)`` where out is (B, H, W, C) and
    violations is a scalar int32 counting pixels whose bilinear support
    escaped their tile's slab — the caller must fall back to the gather
    path when violations > 0 for exact semantics.

    precision: MXU precision of the tent-selector dot.  "default" (bf16
    multiplies) keeps f32 sampling error ~4e-3 relative — fine for image
    warps (AMP-comparable, FlowNet2/SPyNet stage chaining); "highest"
    costs ~3x the MXU passes and is used by the auto path for
    wide-channel FEATURE warps (PWC level 2) where that error would feed
    the cost volumes.
    """
    B, H, W, C = img.shape
    Hp, Wp, sh, sw = _tile_geometry(img.shape, ry, rx)
    if sh > Hp or sw > Wp:
        raise ValueError(
            f"slab ({sh}x{sw}) larger than padded image ({Hp}x{Wp}); "
            "shrink ry/rx or use the gather path"
        )
    if plan is None:
        syt, sxt, start_y, start_x, _, _, violations = _plan_tiles(
            img.shape, sy, sx, ry, rx, zeros_mode
        )
    else:
        # precomputed by warp_tiled_violation_plan (same sy/sx/geometry)
        syt, sxt, start_y, start_x, violations = plan
    if Hp != H or Wp != W:
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    nty, ntx = Hp // TH, Wp // TW
    T = nty * ntx
    P = TH * TW

    # C-major image for contiguous per-tile slab DMAs inside the kernel
    # (standard NCHW layout, lane dim = W: no small-channel lane padding).
    img_cm = img.transpose(0, 3, 1, 2)  # (B, C, Hp, Wp)

    starts = jnp.stack(
        [start_y // 8, start_x // 128], axis=-1
    ).reshape(B * T * 2)
    syf = syt.reshape(B * T, 1, P)
    sxf = sxt.reshape(B * T, 1, P)

    out = pl.pallas_call(
        functools.partial(
            _warp_kernel, sh=sh, sw=sw, c=C, height=H, width=W,
            tiles_per_image=T, zeros_mode=zeros_mode, precision=precision,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * T,),
            in_specs=[
                pl.BlockSpec((1, 1, P), lambda t, starts: (t, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda t, starts: (t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, C, P), lambda t, starts: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((C, sh, sw), img.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * T, C, P), img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * P * sw * sh,
            bytes_accessed=B * T * C * (sh * sw + P) * img.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts, syf, sxf, img_cm)

    # (B*T, C, P) -> NHWC; every reshape keeps a large dim lane-minor.
    out = (
        out.reshape(B, nty, ntx, C, TH, TW)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(B, Hp, Wp, C)
    )
    return out[:, :H, :W], violations
