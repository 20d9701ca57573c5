"""Fused Pallas TPU kernel for the RAFT correlation window lookup.

TPU analog of ``models/alt_cuda_corr/correlation_kernel.cu:18-100`` (the
reference's fused CUDA lookup): per query, bilinearly sample a
(2r+1)x(2r+1) window from the query's own (Hl, Wl) correlation image at a
fractional center, zeros outside the volume (grid_sample zeros semantics,
models/raft/corr.py:72-96).

Design (measured on v5e, batch 8 @ 48x160 level-0):

* The bilinear window sample is a separable pair of selector
  contractions; the selector IS the hat function
  ``relu(1 - |grid - center|)`` — one fused VPU expression builds each
  selector for a whole tile of queries, with out-of-volume taps clamping
  to zero weight (the reference's zeros padding) for free.
* Both contractions run as ONE whole-tile batched ``dot_general``
  (Mosaic lowers batched matmuls efficiently); nothing but the volume
  stream and a 1 KB/query output tile touches HBM.  The pure-XLA
  formulation of the same math (ops.correlation._corr_lookup_mxu)
  materializes selectors + intermediates in HBM and runs ~3x slower at
  level 0 (9.4 ms vs 3.2 ms, batch 8).
* Selector junk rows t,s in [2r+1, 16) are computed and sliced off
  outside (16 is the min bf16 sublane tile).

The kernel is forward-only; gradients (training, gradient attacks) route
through the XLA path via custom_vjp in ops.correlation.corr_lookup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# window tile side: next multiple-of-16 above n+1 = 2r+2 (r=4 -> 10 -> 16)
_TILE_P = 16


def _pick_tile(hl: int, wl: int) -> int:
    """Per-level query-tile size: large images are DMA-bound (small tiles
    keep VMEM pressure low and the pipeline deep); small images are
    per-tile-overhead-bound (big tiles amortize it).  Measured on v5e:
    (48,160)->64: 3.2ms, (24,80)->256: 1.9ms, (12,40)->256: 1.7ms,
    (6,20)->512: 1.5ms at batch 8."""
    area = hl * wl
    if area > 2048:
        return 64
    if area > 256:
        return 256
    return 512


def _lookup_kernel(cy_ref, cx_ref, vol_ref, out_ref, *, hl, wl, tq,
                   sel_dtype):
    """Whole-tile fused lookup:
      S_row[q, t, h] = relu(1 - |h - (cy[q] + t)|)          (tq, 16, Hl)
      S_col[q, s, w] = relu(1 - |w - (cx[q] + s)|)          (tq, 16, Wl)
      out[q] = (S_row[q] @ vol[q]) @ S_col[q]^T             (tq, 16, 16)
    cy/cx are the fractional window TOP-LEFT (center - radius)."""
    hh = lax.broadcasted_iota(jnp.int32, (tq, _TILE_P, hl), 2).astype(
        jnp.float32)
    tt = lax.broadcasted_iota(jnp.int32, (tq, _TILE_P, hl), 1).astype(
        jnp.float32)
    ww = lax.broadcasted_iota(jnp.int32, (tq, _TILE_P, wl), 2).astype(
        jnp.float32)
    ss = lax.broadcasted_iota(jnp.int32, (tq, _TILE_P, wl), 1).astype(
        jnp.float32)
    cy = cy_ref[:]  # (tq, 1, 1) f32
    cx = cx_ref[:]
    srow = jnp.maximum(1.0 - jnp.abs(hh - (cy + tt)), 0.0).astype(sel_dtype)
    scol = jnp.maximum(1.0 - jnp.abs(ww - (cx + ss)), 0.0).astype(sel_dtype)

    # TPU matmuls default to bf16 passes; the f32 parity path must force
    # full precision, the bf16 production path keeps the fast mode.
    prec = None if sel_dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    rows = lax.dot_general(
        srow, vol_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(sel_dtype)  # (tq, 16, Wl)
    out_ref[:] = lax.dot_general(
        rows, scol,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (tq, 16, 16)


@functools.partial(
    jax.jit, static_argnames=("radius", "tile", "interpret", "full_window")
)
def lookup_level(vol: Array, coords: Array, radius: int,
                 tile: int | None = None, interpret: bool = False,
                 full_window: bool = False) -> Array:
    """vol: (N, Hl, Wl) correlation images (bf16 recommended — the kernel
    streams this once per call).  coords: (N, 2) level-scaled (x, y)
    window centers.  Returns (N, n, n) f32 with out[q, t, s] = bilinear
    sample at (y = cy - r + t, x = cx - r + s), zeros outside.

    full_window=True returns the raw (N, 16, 16) kernel block instead:
    positions t or s >= n carry LIVE hat samples past the window (junk) —
    consumers must zero-weight or ignore them (the padded-layout
    invariant, see ops.correlation.corr_lookup_padded)."""
    n = 2 * radius + 1
    assert n + 1 <= _TILE_P, "radius too large for the 16-wide window tile"
    N, hl, wl = vol.shape
    if tile is None:
        tile = _pick_tile(hl, wl)

    padn = (-N) % tile
    if padn:
        vol = jnp.pad(vol, ((0, padn), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, padn), (0, 0)))
    total = vol.shape[0]

    cx = coords[:, 0].astype(jnp.float32) - radius
    cy = coords[:, 1].astype(jnp.float32) - radius
    # clamp far-out centers so the f32 hat arithmetic stays exact; any
    # clamped-from window is fully out of volume and matches nothing
    cy = jnp.clip(cy, -2.0 * _TILE_P, hl + 2.0)
    cx = jnp.clip(cx, -2.0 * _TILE_P, wl + 2.0)

    sel_dtype = vol.dtype if vol.dtype == jnp.bfloat16 else jnp.float32

    out = pl.pallas_call(
        functools.partial(
            _lookup_kernel, hl=hl, wl=wl, tq=tile, sel_dtype=sel_dtype
        ),
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hl, wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, _TILE_P, _TILE_P),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, _TILE_P, _TILE_P),
                                       jnp.float32),
        interpret=interpret,
    )(cy[:, None, None], cx[:, None, None], vol)

    if full_window:
        return out[:N]
    return out[:N, :n, :n]


def corr_lookup_pallas(pyramid: list[Array], coords: Array, radius: int = 4,
                       compute_dtype=None, interpret: bool = False) -> Array:
    """Drop-in forward for ops.correlation.corr_lookup (same output layout:
    (B, H1, W1, L*(2r+1)^2) with the reference's transposed channel order,
    corr.py:79-85)."""
    B, H1, W1, _ = coords.shape
    N = H1 * W1
    n = 2 * radius + 1
    out = []
    for i, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        vol = corr.reshape(B * N, hl, wl)
        if compute_dtype is not None and vol.dtype != compute_dtype:
            vol = vol.astype(compute_dtype)
        c = (coords.reshape(B * N, 2) / (2 ** i))
        patch = lookup_level(vol, c, radius, interpret=interpret)
        patch = patch.reshape(B, N, n, n).transpose(0, 1, 3, 2)
        out.append(patch.reshape(B, H1, W1, n * n).astype(coords.dtype))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_pallas_padded(pyramid: list[Array], coords: Array,
                              radius: int = 4, compute_dtype=None,
                              interpret: bool = False) -> Array:
    """Volume lookup emitting the PADDED lane-stacked layout the fused
    motion encoder consumes directly (models/raft_model.py::
    PaddedCorrConv1x1): (B, H1, W1, L*256) with level l's window sample
    (t, s) at channel t*(L*16) + l*16 + s.

    This skips the minor-dim [t,s]->[s,t] transpose + 9-of-16 slice that
    the compact reference layout forces (the relayout that previously ate
    the kernel's per-level win end-to-end — PERF.md design history #2):
    the level stack keeps s lane-minor untouched.  Channels at t or
    s >= 2r+1 are LIVE junk samples — the consumer must zero-weight them
    (PaddedCorrConv1x1 does; same invariant as ops.alt_corr_features)."""
    B, H1, W1, _ = coords.shape
    N = H1 * W1
    L = len(pyramid)
    outs = []
    for i, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        vol = corr.reshape(B * N, hl, wl)
        if compute_dtype is not None and vol.dtype != compute_dtype:
            vol = vol.astype(compute_dtype)
        c = coords.reshape(B * N, 2) / (2 ** i)
        outs.append(
            lookup_level(vol, c, radius, interpret=interpret,
                         full_window=True)
        )
    st = jnp.stack(outs, axis=2)  # (B*N, 16, L, 16): t-major, s lane-minor
    out = st.reshape(B, H1, W1, _TILE_P * L * _TILE_P)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out
