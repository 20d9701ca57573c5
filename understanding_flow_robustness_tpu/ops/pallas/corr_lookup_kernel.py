"""Pallas TPU kernel for the RAFT correlation window lookup (EXPERIMENTAL).

Verified correct (matches the gather/one-hot formulations to 4e-6, incl.
far out-of-volume coordinates) but NOT the production path: Mosaic's
constraints force full-block streaming of a lane-128-padded float32 volume
(dynamic slices need provable 128/8 alignment; dynamic rotates need
aligned vector shapes; bf16 sublane granularity rejects the row slice), so
per iteration the kernel moves ~7x the HBM bytes of the XLA
one-hot-selector path (ops.correlation._corr_lookup_mxu) and loses despite
doing zero selection FLOPs.  A winning version needs the volume resident
in HBM/ANY with per-query-slab manual DMA — future work.

Per query q (tile-gridded):
  img  = vol[q]  (hp, wp) VMEM            # full-image block stream
  img  = dynamic-rotate rows/cols so the window lands at the origin
  win  = img[:P, :P]                       # static slice
  out  = bilinear blend of the 4 shifted (P-1)x(P-1) sub-windows (VPU)

Each pyramid level is zero-padded by P per side ONCE per forward, so a
clamped base reads zeros for every out-of-volume tap — exactly the
reference's grid_sample zeros semantics (models/raft/corr.py:72-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _lookup_kernel(iy_ref, ix_ref, wy_ref, wx_ref, vol_ref, out_ref,
                   *, hp: int, wp: int, n: int, tq: int):
    p = n + 1  # window side incl. the extra bilinear tap

    def body(q, _):
        iy = iy_ref[q, 0]
        ix = ix_ref[q, 0]
        # dynamic slices need alignment Mosaic can't prove for arbitrary
        # window bases, but dynamic ROTATES don't: rotate the window's
        # top-left corner to the origin on both axes, then slice statically
        img = vol_ref[q]                              # (hp, wp)
        # left-rotate by (iy, ix) expressed with non-negative shifts
        img = pltpu.roll(img, shift=hp - iy, axis=0)  # window rows -> front
        img = pltpu.roll(img, shift=wp - ix, axis=1)  # window cols -> front
        win = img[:p, :p].astype(jnp.float32)
        wy = wy_ref[q, 0]
        wx = wx_ref[q, 0]
        rows = (1.0 - wy) * win[0:n, :] + wy * win[1 : n + 1, :]
        pat = (1.0 - wx) * rows[:, 0:n] + wx * rows[:, 1 : n + 1]
        # transpose/flatten happen outside the kernel (Mosaic rejects the
        # (n, n) -> (n*n,) shape cast)
        out_ref[q, :, :] = pat
        return 0

    lax.fori_loop(0, tq, body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "hp", "wp", "tile"))
def _lookup_level(vol_padded: Array, coords: Array, radius: int,
                  hp: int, wp: int, tile: int = 128) -> Array:
    """vol_padded: (N, hp, wp) images already padded by P=2r+2 per side;
    coords: (N, 2) level-scaled (x, y).  Returns (N, (2r+1)^2) f32."""
    n = 2 * radius + 1
    p = n + 1
    N = vol_padded.shape[0]
    padn = (-N) % tile
    if padn:
        vol_padded = jnp.pad(vol_padded, ((0, padn), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, padn), (0, 0)))
    total = vol_padded.shape[0]

    cx = coords[:, 0]
    cy = coords[:, 1]
    # base in the padded frame; the clamp only engages for fully
    # out-of-volume windows, which then read only zero padding (exact)
    iy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - radius + p, 0, hp - p)
    ix = jnp.clip(jnp.floor(cx).astype(jnp.int32) - radius + p, 0, wp - p)
    wy = (cy - jnp.floor(cy)).astype(jnp.float32)
    wx = (cx - jnp.floor(cx)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, hp=hp, wp=wp, n=n, tq=tile),
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, n, n), jnp.float32),
    )(iy[:, None], ix[:, None], wy[:, None], wx[:, None], vol_padded)
    # reference channel order is transposed (torch.meshgrid quirk,
    # corr.py:79-85): channel a*n+b samples (x+a-r, y+b-r)
    return out[:N].transpose(0, 2, 1).reshape(N, n * n)


def pad_pyramid_for_lookup(pyramid: list[Array], radius: int = 4
                           ) -> list[Array]:
    """Zero-pad every level by P = 2r+2 per side (plus right-padding the
    width to a multiple of 128: tpu.dynamic_rotate requires lane-aligned
    vectors), once per forward."""
    p = 2 * radius + 2
    out = []
    for c in pyramid:
        hp = c.shape[2] + 2 * p
        wp = c.shape[3] + 2 * p
        extra_h = (-hp) % 8      # sublane alignment for the dynamic rotate
        extra_w = (-wp) % 128    # lane alignment
        out.append(
            jnp.pad(
                c.astype(jnp.float32),
                ((0, 0), (0, 0), (p, p + extra_h), (p, p + extra_w)),
            )
        )
    return out


def corr_lookup_pallas(pyramid_padded: list[Array], coords: Array,
                       radius: int = 4) -> Array:
    """Drop-in for ops.corr_lookup on a pre-padded pyramid.

    pyramid_padded[i]: (B, N, Hl+2P, Wl+2P); coords: (B, H1, W1, 2)
    level-0 pixel coords.  Returns (B, H1, W1, levels*(2r+1)^2) f32.
    """
    B, H1, W1, _ = coords.shape
    N = H1 * W1
    n = 2 * radius + 1
    out = []
    for i, corr in enumerate(pyramid_padded):
        hp, wp = corr.shape[2], corr.shape[3]
        vol = corr.reshape(B * N, hp, wp)
        c = (coords.reshape(B * N, 2) / (2 ** i)).astype(jnp.float32)
        # input blocks are double-buffered: fit 2 * tile * hp * wp * 4B in
        # ~12MB of VMEM
        tile = 128
        while tile > 8 and 2 * tile * hp * wp * 4 > 12 * 2 ** 20:
            tile //= 2
        res = _lookup_level(vol, c, radius, hp, wp, tile)
        out.append(res.reshape(B, H1, W1, n * n))
    return jnp.concatenate(out, axis=-1)
