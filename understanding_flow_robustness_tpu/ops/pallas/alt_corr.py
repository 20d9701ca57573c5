"""Fused on-demand correlation lookup (the TPU alt_cuda_corr).

TPU-native analog of the reference's memory-efficient correlation
(``models/alt_cuda_corr/correlation_kernel.cu:18-100`` via
``AlternateCorrBlock``, models/raft/corr.py:109-137): instead of
materializing the all-pairs volume ``(B, H*W, H, W)`` in HBM and bilinearly
sampling it 12x per forward (models/raft/corr.py:26-106), each query's
correlation rows are recomputed on the MXU *inside* the lookup kernel and
never leave VMEM.

Why this is the right TPU design (measured on v5e, batch 8 @ 48x160):

* The volume path is HBM-bound: the level-0 volume alone is 472 MB in bf16
  and must be streamed through VMEM once per GRU iteration (12x/forward).
* Recomputing a query tile's corr rows is one dense bf16 matmul against a
  VMEM-resident ``fmap2`` — the MXU does it faster than the DMA could
  deliver the precomputed rows, and the only HBM traffic left is
  ``fmap1``/``fmap2`` (a few MB) plus the small lookup output.
* The correlation pyramid collapses: ``avg_pool`` over the volume's target
  dims equals correlation against an avg-pooled ``fmap2`` (the correlation
  is linear in f2), so each level just swaps in a pooled feature map (all
  four levels together: 5.2 MB bf16, VMEM-resident across the query loop).
* The bilinear window sample is a separable pair of hat-function selector
  contractions (``relu(1 - |grid - center|)`` IS the bilinear weight, and
  rows fully outside the volume get all-zero selectors — grid_sample zeros
  semantics for free).
* All four pyramid levels run in ONE kernel per query tile: f1 streams
  once, launch overhead amortizes, and the levels' 16x16 window blocks
  are lane-stacked into a single bf16 (N, 16, L*16) output — every
  downstream copy/contraction stays lane-dense, where the compact 9x9
  slice-and-concat cost ~1.8 ms/iteration in XLA relayouts and a 16-lane
  f32 output cost ~5 ms/iteration (measured at KITTI geometry).

Output layout: per level ``(B, N, P, P)`` with ``P = 16`` (the bf16 sublane
tile) and ``out[q, t, s]`` = bilinear sample at ``(x + s - r, y + t - r)``.
The reference's channel order is s-major (models/raft/corr.py:79-85):
compact consumers transpose the tiny window dims; the padded motion-encoder
conv just uses channel index ``t*16 + s``.  Entries with ``s`` or
``t >= 2r+1`` are live hat samples that consumers slice off or weight by
zero (cheaper than masking them in-kernel).

Gradients: ``alt_lookup_bwd`` (this file) is the fused volume-free
backward — two small window-weight dots fold the cotangent into a
per-query image U, then hl-batched MXU dots emit df1/df2 with the same
flow-following row slabs as the forward.  ops.correlation's custom_vjp
dispatches to it (with a jnp volume formulation kept as the
correctness-diff fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Window tile side: next multiple of 16 (bf16 sublane tile) above 2r+2.
TILE_P = 16


def _hat_selector(c, extent, tq, sel_dtype, deriv=False):
    """(tq, P, extent) separable bilinear selector for window top-left c
    ((tq, 1, 1) f32): row j holds relu(1 - |grid - (c + j)|).  Rows
    j >= 2r+1 are window-tile padding; they carry live hat weights (an
    extra VPU mask costs more than it saves) — consumers either slice them
    off (compact layout) or multiply them by zero weights (the padded
    motion-encoder conv scatters the reference kernel into a zero matrix,
    ops/correlation.alt_corr_features docstring).

    deriv=True returns d(hat)/dc = sign(grid - (c + j)) on the open support
    |grid - (c + j)| < 1 (the a.e. derivative of the bilinear weight, used
    by the coordinate gradient)."""
    gg = lax.broadcasted_iota(jnp.int32, (tq, TILE_P, extent), 2).astype(
        jnp.float32)
    # c + j built at (tq, P, 1) so the add never touches the full extent
    jj = lax.broadcasted_iota(jnp.int32, (tq, TILE_P, 1), 1).astype(
        jnp.float32)
    diff = gg - (c + jj)
    if deriv:
        hat = jnp.sign(diff) * ((diff > -1.0) & (diff < 1.0))
    else:
        hat = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
    return hat.astype(sel_dtype)


def _alt_corr_kernel(*refs, shapes, slabs, tq, n,
                     sel_dtype, out_dtype, deriv="none", tiles=0):
    """All pyramid levels for one query tile.  Per level l:
      corr[q, h, w] = sum_c f1[q, c] * f2_l[h, w, c]      (MXU, dense)
      scol[q, s, w] = relu(1 - |w - (cx[q]/2^l - r + s)|)  (VPU hats)
      srow[q, t, h] = relu(1 - |h - (cy[q]/2^l - r + t)|)
      out_l[q, t, s] = sum_h srow * (sum_w scol * corr)    (batched MXU)
    cy/cx hold the level-0 window CENTER; top-left = center/2^l - r.
    The scol contraction runs scol-first at every level (measured faster
    than the corr-first order even where that has the larger MXU M dim);
    the srow contraction then emits the uniform (t, s) window
    orientation.

    slabs[l] > 0 enables the flow-following ROW SLAB for level l: the
    corr dot runs against only ``slabs[l]`` consecutive rows of the
    VMEM-resident f2 (a dynamic major-dim slice at the per-tile origin
    read from the SMEM ``meta_ref``), since a 256-query row-major tile
    only ever *consumes* a ~(n+1)-row band around its flow.  The slab
    variant is only CALLED when the host-side exact needed-row test says
    every tile's band fits its slab (the ``lax.cond`` in ``alt_lookup``)
    — an in-kernel ``pl.when`` fallback was measured to erase the entire
    saving even when never taken (branched all-ok 5.89 ms vs branch-free
    5.00 ms vs full 6.28 ms at RAFT KITTI geometry), so the fallback
    lives at the call level, not the tile level."""
    L = len(shapes)
    n_slab = sum(1 for s in slabs if s)
    if n_slab:
        meta_ref, cy_ref, cx_ref, f1_ref = refs[:4]
        rest = refs[4:]
    else:
        cy_ref, cx_ref, f1_ref = refs[:3]
        rest = refs[3:]
    f2_refs, out_ref = rest[:L], rest[L]
    f1t = f1_ref[0]  # (tq, C) sel_dtype
    C = f1t.shape[1]
    prec = None if sel_dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    cy0 = cy_ref[0]  # (tq, 1, 1) f32
    cx0 = cx_ref[0]

    def emit(lvl, cy, cx, f2blk, sh, wl):
        # Corr rows as ONE sh-batched MXU dot against a broadcast f1 tile.
        # (Mosaic cannot reshape a (tq, Hl*Wl) matmul result to 3D, and
        # row-wise stores need an unsupported 2D->3D expand; the batched
        # dot + a major-dims transpose is what it lowers cleanly.)
        f1e = jnp.broadcast_to(f1t[None], (sh, tq, C))
        corrH = lax.dot_general(
            f1e, f2blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (sh, tq, Wl)
        # transpose the f32 corrH FIRST, cast after.  The "cast before
        # the transpose, half the VMEM traffic" variant is bit-identical
        # but 27% slower end-to-end (RAFT 56.5 -> 41.5 pairs/s, bisected
        # round 4): Mosaic lowers a bf16 major-dims transpose far worse
        # than the f32 one.  Do not flip this without an e2e re-measure
        # (tests/test_tpu_perf_guard.py pins the throughput).
        corr = jnp.transpose(corrH, (1, 0, 2)).astype(sel_dtype)

        scol = _hat_selector(cx, wl, tq, sel_dtype, deriv=(deriv == "x"))
        srow = _hat_selector(cy, sh, tq, sel_dtype, deriv=(deriv == "y"))

        # scol-first at EVERY level: the corr-first order (M = hl on the
        # level-0 dot, "better utilization" on paper) measured SLOWER —
        # 6.52 vs 6.16 ms/iter full-extent, 144.4 vs 140.9 ms RAFT e2e —
        # the (tq, hl, P) f32 intermediate it materializes costs more
        # than the M=16 dot loses.
        cols = lax.dot_general(
            scol, corr,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(sel_dtype)  # (tq, P[s], SH)
        out_l = lax.dot_general(
            srow, cols,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (tq, P[t], P[s])
        # levels stack along lanes: minor dim L*16 keeps every downstream
        # copy/contraction lane-dense (a 16-lane minor runs at 1/8 width)
        out_ref[0, :, :, lvl * TILE_P:(lvl + 1) * TILE_P] = out_l.astype(
            out_dtype)

    si = 0
    for lvl, (hl, wl) in enumerate(shapes):
        inv = 1.0 / (2 ** lvl)
        # clamp far-out centers so the f32 hat arithmetic stays exact; a
        # clamped-from window is fully out of volume and matches nothing
        cy = jnp.clip(cy0 * inv - n // 2, -2.0 * TILE_P, hl + 2.0)
        cx = jnp.clip(cx0 * inv - n // 2, -2.0 * TILE_P, wl + 2.0)

        sh = slabs[lvl]
        if sh:
            base = (pl.program_id(0) * tiles + pl.program_id(1)) * n_slab
            oy = meta_ref[base + si]
            si += 1
            emit(lvl, cy - oy.astype(jnp.float32), cx,
                 f2_refs[lvl][0, pl.ds(oy, sh), :, :], sh, wl)
        else:
            emit(lvl, cy, cx, f2_refs[lvl][0], hl, wl)


def default_slabs(shapes, tile: int, n: int,
                  w0: int | None = None) -> tuple[int, ...]:
    """Per-level row-slab heights for `alt_lookup(slabs=...)`.

    A row-major query tile of ``tile`` queries spans ``ceil(tile/W0) + 1``
    level-0 image rows, so its consumed corr rows form a band of
    ``span/2^l + n + 1`` rows plus the within-tile flow-y variation.  The
    margin (8 rows at level 0, halving per level, min 4) absorbs ~±32 px
    of full-res flow-y variation inside one tile — tiles beyond it take
    the kernel's exact full-extent fallback.  0 = no slab (level too
    short for the slab to pay)."""
    slabs = []
    for lvl, (hl, wl) in enumerate(shapes):
        if w0 is None:
            w0 = wl  # level-0 width
        span = -(-tile // w0) + 1
        need = -(-span >> lvl) + n + 1 + max(8 >> lvl, 4)
        sh = need + (-need) % 8
        slabs.append(sh if sh <= hl - 8 else 0)
    return tuple(slabs)


def _slab_meta(coords, valid_n, shapes, slabs, tile, n):
    """Per-tile slab row-origins + the all-tiles-covered predicate.

    For each slab level, the needed corr-row range of every query is the
    integer-grid support of its hat selector intersected with the volume
    ([floor(cy), floor(cy) + n] clipped to [0, hl)); the tile's band is
    the min/max over its REAL queries (padded queries excluded).  Returns
    ``(oy, all_ok)``: oy (B, T, n_slab) int32 origins (each covers its
    tile's band whenever that band fits the slab), and all_ok a scalar
    bool that is True iff EVERY tile's band fits — the exact predicate
    `alt_lookup`'s lax.cond uses to pick the slab kernel."""
    B, np_, _ = coords.shape
    T = np_ // tile
    cyq = coords[..., 1].astype(jnp.float32).reshape(B, T, tile)
    qidx = jnp.arange(np_).reshape(1, T, tile)
    valid = qidx < valid_n
    oys, oks = [], []
    for lvl, (hl, wl) in enumerate(shapes):
        sh = slabs[lvl]
        if not sh:
            continue
        inv = 1.0 / (2 ** lvl)
        cyl = jnp.clip(cyq * inv - n // 2, -2.0 * TILE_P, hl + 2.0)
        lo = jnp.floor(cyl - 1.0).astype(jnp.int32) + 1
        hi = jnp.ceil(cyl + n).astype(jnp.int32) - 1
        lo = jnp.maximum(lo, 0)
        hi = jnp.minimum(hi, hl - 1)
        needed = (lo <= hi) & valid
        big = jnp.int32(1 << 20)
        LO = jnp.min(jnp.where(needed, lo, big), axis=2)   # (B, T)
        HI = jnp.max(jnp.where(needed, hi, -1), axis=2)
        oy = jnp.clip(jnp.minimum(LO, jnp.int32(hl)), 0, hl - sh)
        oys.append(oy)
        oks.append(HI - oy < sh)
    oy = jnp.stack(oys, axis=-1)  # (B, T, n_slab) int32
    all_ok = jnp.all(jnp.stack(oks, axis=-1))
    return oy, all_ok


def _sort_order(coords, valid_n):
    """Row-major-stable query order by level-0 window-center y.

    coords: (B, Np, 2) possibly query-padded; padded queries (index >=
    valid_n) sort to the end so ``_slab_meta``'s trailing-pad assumption
    keeps holding after the permutation.  Returns (order, inv), both
    (B, Np) int32 with ``sorted_x = x[order]`` and ``x = sorted_x[inv]``.
    """
    B, np_, _ = coords.shape
    qidx = jnp.arange(np_, dtype=jnp.int32)[None]
    key = jnp.where(qidx < valid_n, coords[..., 1].astype(jnp.float32),
                    jnp.float32(3.0e8))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    # inverse permutation via a SECOND argsort, not a scatter: XLA's TPU
    # scatter lowering costs ~0.8 ms at (8, 7680) where the sort itself
    # is ~free (measured round 5, scripts note in PERF.md)
    inv = jnp.argsort(order, axis=1).astype(jnp.int32)
    return order, inv


@functools.partial(
    jax.jit, static_argnames=("radius", "tile", "interpret", "deriv",
                              "slabs", "sort_fallback")
)
def alt_lookup(f1: Array, f2_levels: tuple[Array, ...], coords: Array,
               radius: int, tile: int = 256,
               interpret: bool = False, deriv: str = "none",
               slabs: tuple[int, ...] | None = None,
               sort_fallback: bool = False) -> Array:
    """Fused lookup over all pyramid levels in one kernel.

    f1: (B, N, C) query features, pre-scaled by 1/sqrt(C) (bf16
    recommended).  f2_levels: per level (B, Hl, Wl, C), same dtype.
    coords: (B, N, 2) level-0 (x, y) window centers, f32.  Returns
    (B, N, P, L*P) (f1's dtype) with out[q, t, l*P + s] = bilinear sample
    of the on-demand level-l correlation image at
    (y/2^l - r + t, x/2^l - r + s), zeros outside the volume; rows/cols
    past 2*radius+1 are live padding samples.

    slabs: per-level row-slab heights (see `default_slabs`); None
    disables slabbing (full-extent corr dots at every level).  When set,
    the host computes each tile's exact needed-row band and a lax.cond
    picks the branch-free slab kernel iff EVERY band fits its slab, else
    the full-extent kernel — values are identical either way (modulo f32
    reduction-tree reassociation of the shorter contraction), so the
    fast path is a pure work skip, never a semantics change.

    sort_fallback=True inserts a SORTED-TILE middle branch before the
    full-extent fallback: when the natural row-major tiles' bands do NOT
    fit (wild flows — random-weight RAFT iterates, adversarial training
    flows), queries are permuted into flow-y order, which shrinks every
    tile's band to ~(total y-range)/T + n + 1 rows regardless of flow
    magnitude (band endpoints clip to the volume, so sorted bands fit for
    essentially any real flow), and the slab kernel runs on the permuted
    queries (output inverse-permuted).  A third lax.cond keeps the exact
    full-extent kernel for the adversarial residue where even sorted
    bands exceed the slabs.

    MEASURED OFF in production (round 4, v5e): the kernel-side saving is
    real (wild 6.02 -> 4.82 ms at RAFT KITTI geometry) but XLA row
    gathers run at ~145 GB/s, so the (B, N, 16, L*16) inverse-permutation
    alone costs 1.7-2.2 ms (every formulation tried) and the net is a
    LOSS (7.60 vs 6.02 ms fwd; 4.08 vs 3.13 ms bwd at train geometry).
    Kept behind this flag for documentation and for a future backend
    where gathers ride DMA at line rate.
    """
    n = 2 * radius + 1
    assert n + 1 <= TILE_P, "radius too large for the 16-wide window tile"
    B, N, C = f1.shape
    shapes = tuple((f.shape[1], f.shape[2]) for f in f2_levels)
    if slabs is None:
        slabs = (0,) * len(shapes)
    n_slab = sum(1 for s in slabs if s)

    padn = (-N) % tile
    if padn:
        f1 = jnp.pad(f1, ((0, 0), (0, padn), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, padn), (0, 0)))
    np_ = f1.shape[1]

    sel_dtype = f1.dtype if f1.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = sel_dtype
    L = len(shapes)
    grid = (B, np_ // tile)

    def run(slabs_, meta_flat, cyf, cxf, f1q):
        cx = cxf[..., None, None]
        cy = cyf[..., None, None]
        flops = 0
        for lvl, (hl, wl) in enumerate(shapes):
            eh = slabs_[lvl] or hl
            flops += 2 * np_ * eh * wl * C          # corr recompute
            flops += 2 * np_ * TILE_P * wl * eh     # scol contraction
            flops += 2 * np_ * TILE_P * TILE_P * eh  # srow contraction
        has_meta = any(slabs_)
        # flat (B*T*k,) int32 in SMEM (whole-array spec: SMEM blocks must
        # match the array dims); the kernel indexes it from program_id
        meta_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] if has_meta else []
        )
        meta_args = (meta_flat,) if has_meta else ()
        return pl.pallas_call(
            functools.partial(
                _alt_corr_kernel, shapes=shapes, slabs=slabs_, tq=tile,
                n=n, sel_dtype=sel_dtype, out_dtype=out_dtype, deriv=deriv,
                tiles=np_ // tile,
            ),
            grid=grid,
            in_specs=meta_specs + [
                pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for hl, wl in shapes
            ],
            out_specs=pl.BlockSpec((1, tile, TILE_P, L * TILE_P),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, np_, TILE_P, L * TILE_P),
                                           out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=B * flops,
                bytes_accessed=(f1.size + sum(f.size for f in f2_levels))
                * f1.dtype.itemsize
                + B * np_ * TILE_P * L * TILE_P
                * jnp.dtype(out_dtype).itemsize,
                transcendentals=0,
            ),
            # f32 corrH + its bf16 transposed copy + the broadcast f1 tile
            # for level 0 exceed the 16 MB default scoped-vmem limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*meta_args, cy, cx, f1q, *f2_levels)

    cxf = coords[..., 0].astype(jnp.float32)
    cyf = coords[..., 1].astype(jnp.float32)

    if n_slab:
        oy, all_ok = _slab_meta(coords, N, shapes, slabs, tile, n)

        def full_branch(_):
            return run((0,) * L, None, cyf, cxf, f1)

        if sort_fallback:
            def sorted_branch(_):
                # only traced into the untaken-cond branch: the argsort +
                # gathers cost nothing when the direct bands fit
                order, inv = _sort_order(coords, N)
                cys = jnp.take_along_axis(cyf, order, axis=1)
                cxs = jnp.take_along_axis(cxf, order, axis=1)
                f1s = jnp.take_along_axis(f1, order[..., None], axis=1)
                cs = jnp.stack([cxs, cys], axis=-1)
                oy2, ok2 = _slab_meta(cs, N, shapes, slabs, tile, n)
                out_s = lax.cond(
                    ok2,
                    lambda m: run(slabs, m, cys, cxs, f1s),
                    lambda m: run((0,) * L, m, cys, cxs, f1s),
                    oy2.reshape(-1),
                )
                return jnp.take_along_axis(
                    out_s, inv[..., None, None], axis=1)

            fallback = sorted_branch
        else:
            fallback = full_branch

        out = lax.cond(
            all_ok,
            lambda m: run(slabs, m, cyf, cxf, f1),
            fallback,
            oy.reshape(-1),
        )
    else:
        out = run(slabs, None, cyf, cxf, f1)

    return out[:, :N]


def pool_fmap_levels(f2: Array, num_levels: int) -> list[Array]:
    """Pooled fmap2 pyramid: level l is f2 avg-pooled by 2^l with the exact
    floor semantics of corr_pyramid/F.avg_pool2d (odd trailing row/col
    dropped).  By linearity of the correlation in f2, correlating against
    pooled features equals pooling the correlation volume's target dims
    (models/raft/corr.py:57-64).

    The reduction ASSOCIATION is deliberately identical to
    ops.correlation.corr_pyramid (row pairs first, then column pairs,
    then *0.25) — the custom_vjp routes gradients through the volume
    formulation, so the two poolings must stay bit-consistent; do NOT
    "simplify" this to ops.interp.avg_pool2 (sums all four taps at once,
    different float association)."""
    levels = [f2]
    x = f2
    for _ in range(num_levels - 1):
        B, H, W, C = x.shape
        h2, w2 = H // 2, W // 2
        x = x[:, : 2 * h2, : 2 * w2]
        rows = x[:, 0::2] + x[:, 1::2]
        x = (rows[:, :, 0::2] + rows[:, :, 1::2]) * jnp.asarray(0.25, x.dtype)
        levels.append(x)
    return levels


def unpool_fmap_grads(dlevels, f2_shape) -> Array:
    """Scatter-free VJP of ``pool_fmap_levels``: fold per-level fmap2
    cotangents back to full resolution.

    ``jax.vjp(pool_fmap_levels)`` lowers the strided-slice backward to
    scatter-adds (~2 ms/step across the 12 train iterations, round-5
    device trace); the 2x2-avg-pool transpose is just a 0.25-weighted
    2x2 broadcast plus zero-padding of the odd-cropped row/column, which
    this computes with reshapes only.  Value-identical to the AD path
    (same 0.25*dg value lands on each of the four source pixels).
    """
    H0, W0 = f2_shape[1], f2_shape[2]
    shapes = [(d.shape[1], d.shape[2]) for d in dlevels]
    acc = dlevels[-1].astype(jnp.float32)
    for lvl in range(len(dlevels) - 2, -1, -1):
        B, h2, w2, C = acc.shape
        H, W = shapes[lvl]
        up = jnp.broadcast_to(
            (acc * 0.25)[:, :, None, :, None, :],
            (B, h2, 2, w2, 2, C),
        ).reshape(B, 2 * h2, 2 * w2, C)
        up = jnp.pad(up, ((0, 0), (0, H - 2 * h2), (0, W - 2 * w2),
                          (0, 0)))
        acc = dlevels[lvl].astype(jnp.float32) + up
    assert acc.shape[1] == H0 and acc.shape[2] == W0
    return acc


def alt_corr_features(
    fmap1: Array,
    fmap2: Array,
    coords: Array,
    num_levels: int = 4,
    radius: int = 4,
    compute_dtype=None,
    padded: bool = False,
    interpret: bool = False,
) -> Array:
    """Fused correlation-pyramid lookup straight from feature maps.

    fmap1, fmap2: (B, H, W, C) f32.  coords: (B, H, W, 2) level-0 (x, y)
    lookup centers.  Value-equal to
    ``corr_lookup(corr_pyramid(all_pairs_correlation(f1, f2)), coords)``
    (models/raft/corr.py:26-106) without ever materializing the volume.

    padded=False returns the reference-compact ``(B, H, W, L*(2r+1)^2)``.
    padded=True returns ``(B, H, W, 16*L*16)`` with the levels' windows
    lane-stacked: channel = t*(L*16) + l*16 + s (indices past 2r+1 carry
    live padding samples the consumer weights by zero) — the layout the
    fused RAFT motion encoder consumes directly (one tile-aligned reshape,
    no relayout).
    """
    B, H, W, C = fmap1.shape
    N = H * W
    n = 2 * radius + 1

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f1 = (fmap1.astype(jnp.float32) * scale).reshape(B, N, C)
    f2 = fmap2.astype(jnp.float32)
    if compute_dtype is not None:
        f1 = f1.astype(compute_dtype)
    levels = pool_fmap_levels(f2, num_levels)
    if compute_dtype is not None:
        levels = [l.astype(compute_dtype) for l in levels]

    cflat = coords.reshape(B, N, 2).astype(jnp.float32)
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    # Tile/slab config: 256 + slabs, at EVERY geometry.  A round-4
    # standalone scan said otherwise — tile 128 won both geometries
    # (KITTI smooth-slab 4.36 vs 4.82 ms; train-geometry full 0.64 vs
    # 0.85) — but e2e it was neutral at KITTI (62.45 vs 62.48 pairs/s)
    # and LOST 28 ms/step at the train geometry (137.1 -> 165.0 ms,
    # measured twice); the in-graph scheduling/VMEM interaction dominates
    # sub-ms standalone deltas.  Same lesson as the tile-512 entry in
    # PERF.md: never ship a lookup-tile change on standalone numbers.
    tile = 256
    slabs = default_slabs(shapes, tile, n)
    # sort_fallback measured OFF for production (round 4, v5e, RAFT KITTI
    # geometry): sorting rescues the slab path for wild flows
    # (6.02 -> 4.82 ms kernel time) but the (B, N, 16, 64) inverse-
    # permutation gather runs at ~145 GB/s under XLA (1.7-2.2 ms across
    # every formulation tried: take_along_axis 3d/4d, flat take axis-0,
    # scatter) and erases the win: wild 7.60 ms sorted vs 6.02 unsorted.
    # The mechanism + tests stay for documentation; flip only with an e2e
    # re-measure.
    stacked = alt_lookup(f1, tuple(levels), cflat, radius,
                         tile=tile,
                         interpret=interpret,
                         slabs=slabs)  # (B, N, P, L*P)
    if padded:
        # channel = t * (L*16) + l*16 + s: one tile-aligned reshape.
        # Keeps the kernel's compute dtype (bf16 in production) — the
        # consuming 1x1 conv runs bf16 anyway, and f32-inflating 1 GB/iter
        # of corr features would double the relayout traffic.
        return stacked.reshape(B, H, W, TILE_P * num_levels * TILE_P)
    out = []
    for lvl in range(num_levels):
        patch = stacked[:, :, :n, lvl * TILE_P:lvl * TILE_P + n]
        # (B, N, t, s) -> s-major (reference channel order, corr.py:79-85);
        # the tiny-dim transpose is a relayout XLA pays ~1.8 ms/iteration
        # for at KITTI geometry — production uses the padded layout instead
        patch = patch.transpose(0, 1, 3, 2)
        out.append(patch.reshape(B, H, W, n * n))
    return jnp.concatenate(out, axis=-1).astype(coords.dtype)


def _alt_corr_bwd_kernel(*refs, shapes, slabs, tq, n, tiles, sel_dtype):
    """Backward for the fused lookup, f1/f2 cotangents.

    Given the output cotangent g (tq, P, L*P), each level folds it into a
    per-query window-weight image U = srow^T g scol (two small batched
    dots), after which
      df1[q, c] += sum_{h,w} U[q,h,w] * f2_l[h,w,c]   (hl-batched MXU)
      df2_l[h,w,c] += sum_q U[q,h,w] * f1[q,c]        (hl-batched MXU)
    df2 accumulates across the query-tile grid into a revisited block.
    The volume is never materialized — same property as the forward.

    ``slabs[l] > 0`` enables the same flow-following ROW SLAB as the
    forward kernel (same ``_slab_meta`` origins): U's rows are exactly
    the hat-selector support, so both MXU dots and the srow build shrink
    to the ``slabs[l]``-row band; df2 is zero-initialized once per batch
    item and the band accumulated through a dynamic row slice of the
    VMEM-resident block.  Like the forward, the slab variant is only
    dispatched when the host-side predicate says every tile's band fits
    (the ``lax.cond`` in ``alt_lookup_bwd``)."""
    L = len(shapes)
    n_slab = sum(1 for s in slabs if s)
    if n_slab:
        meta_ref, cy_ref, cx_ref, f1_ref, g_ref = refs[:5]
        rest = refs[5:]
    else:
        cy_ref, cx_ref, f1_ref, g_ref = refs[:4]
        rest = refs[4:]
    f2_refs = rest[:L]
    df1_ref = rest[L]
    df2_refs = rest[L + 1:]
    f1t = f1_ref[0]  # (tq, C)
    C = f1t.shape[1]
    prec = None if sel_dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    cy0 = cy_ref[0]
    cx0 = cx_ref[0]

    df1_acc = jnp.zeros((tq, C), jnp.float32)
    si = 0
    for lvl, (hl, wl) in enumerate(shapes):
        inv = 1.0 / (2 ** lvl)
        cy = jnp.clip(cy0 * inv - n // 2, -2.0 * TILE_P, hl + 2.0)
        cx = jnp.clip(cx0 * inv - n // 2, -2.0 * TILE_P, wl + 2.0)
        sh = slabs[lvl]
        if sh:
            base = (pl.program_id(0) * tiles + pl.program_id(1)) * n_slab
            oy = meta_ref[base + si]
            si += 1
            cy = cy - oy.astype(jnp.float32)
            f2blk = f2_refs[lvl][0, pl.ds(oy, sh), :, :]
            eh = sh
        else:
            f2blk = f2_refs[lvl][0]
            eh = hl
        scol = _hat_selector(cx, wl, tq, sel_dtype)
        srow = _hat_selector(cy, eh, tq, sel_dtype)

        g_l = g_ref[0][:, :, lvl * TILE_P:(lvl + 1) * TILE_P].astype(
            sel_dtype)  # (tq, P[t], P[s])
        tmp = lax.dot_general(
            g_l, scol,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(sel_dtype)  # (tq, P[t], Wl)
        U = lax.dot_general(
            srow, tmp,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(sel_dtype)  # (tq, EH, Wl)
        Uh = jnp.transpose(U, (1, 0, 2))  # (EH, tq, Wl)

        t1 = lax.dot_general(
            Uh, f2blk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (EH, tq, C)
        df1_acc = df1_acc + jnp.sum(t1, axis=0)

        f1e = jnp.broadcast_to(f1t[None], (eh, tq, C))
        d2 = lax.dot_general(
            Uh, f1e,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (EH, Wl, C)

        if sh:
            @pl.when(pl.program_id(1) == 0)
            def _():
                df2_refs[lvl][0] = jnp.zeros((hl, wl, C), jnp.float32)

            cur = df2_refs[lvl][0, pl.ds(oy, sh), :, :]
            df2_refs[lvl][0, pl.ds(oy, sh), :, :] = cur + d2
        else:
            @pl.when(pl.program_id(1) == 0)
            def _():
                df2_refs[lvl][0] = d2

            @pl.when(pl.program_id(1) > 0)
            def _():
                df2_refs[lvl][0] = df2_refs[lvl][0] + d2

    df1_ref[0] = df1_acc


@functools.partial(
    jax.jit, static_argnames=("radius", "tile", "interpret", "slabs",
                              "sort_fallback", "fallback_tile")
)
def alt_lookup_bwd(f1: Array, f2_levels: tuple[Array, ...], coords: Array,
                   g: Array, radius: int, tile: int = 128,
                   interpret: bool = False,
                   slabs: tuple[int, ...] | None = None,
                   sort_fallback: bool = False,
                   fallback_tile: int | None = None):
    """f1/f2 cotangents of ``alt_lookup``.

    g: (B, N, P, L*P) cotangent in the forward's lane-stacked layout
    (entries at window positions >= 2r+1 must be zero — they are, for both
    real consumers).  Returns (df1 (B, N, C) f32, [df2_l (B, Hl, Wl, C)
    f32 per level]).

    slabs: per-level row-slab heights (``default_slabs(shapes, tile, n)``
    — note the BWD tile, not the forward's); same dispatch contract as
    ``alt_lookup``: a host-side exact needed-row test picks the slab
    kernel iff every tile's band fits, else the full-extent kernel —
    identical values modulo f32 reduction-tree reassociation.

    sort_fallback: same sorted-tile middle branch as ``alt_lookup`` —
    and CHEAPER here, because df2 lives in fmap2 space (its cross-tile
    accumulation is query-order-free) so only df1 needs the inverse
    permutation; training/attack flows are exactly the wild regime the
    sort rescues.  (Measured OFF in production — see the caller's note.)

    fallback_tile: query-tile size for the FULL-EXTENT branch only.  The
    two regimes want different tiles (measured on v5e at the RAFT train
    geometry, 4 @ 36x120): the slab kernel is fastest at tile 128
    (1.37 ms/iter smooth — less df2-band revisiting), but the full-extent
    kernel is fastest at tile 256 (wild 2.09 vs 3.37 ms at tile 128 —
    fewer full-height df2 accumulation passes).  Queries are padded to
    the larger tile so both branches share output shapes.
    """
    n = 2 * radius + 1
    B, N, C = f1.shape
    shapes = tuple((f.shape[1], f.shape[2]) for f in f2_levels)
    L = len(shapes)
    if slabs is None:
        slabs = (0,) * L
    n_slab = sum(1 for s in slabs if s)

    full_tile = fallback_tile if (fallback_tile and n_slab) else tile
    # Queries are padded once to the LARGER tile and each branch launches
    # its grid as padded_n // its_own_tile — which silently drops trailing
    # queries unless the smaller tile divides the larger (ADVICE r4).
    if max(tile, full_tile) % min(tile, full_tile) != 0:
        raise ValueError(
            f"alt_lookup_bwd: tile={tile} and fallback_tile={full_tile} "
            "must nest (one must divide the other) so both branches cover "
            "the shared query padding"
        )
    padn = (-N) % max(tile, full_tile)
    if padn:
        f1 = jnp.pad(f1, ((0, 0), (0, padn), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, padn), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, padn), (0, 0), (0, 0)))
    np_ = f1.shape[1]

    sel_dtype = f1.dtype if f1.dtype == jnp.bfloat16 else jnp.float32

    def run(slabs_, meta_flat, cyf, cxf, f1q, gq, tile=tile):
        cx = cxf[..., None, None]
        cy = cyf[..., None, None]
        has_meta = any(slabs_)
        meta_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] if has_meta else []
        )
        meta_args = (meta_flat,) if has_meta else ()
        return pl.pallas_call(
            functools.partial(
                _alt_corr_bwd_kernel, shapes=shapes, slabs=slabs_, tq=tile,
                n=n, tiles=np_ // tile, sel_dtype=sel_dtype,
            ),
            grid=(B, np_ // tile),
            in_specs=meta_specs + [
                pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, TILE_P, L * TILE_P),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for hl, wl in shapes
            ],
            out_specs=[
                pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for hl, wl in shapes
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, np_, C), jnp.float32),
            ] + [
                jax.ShapeDtypeStruct((B,) + sh + (C,), jnp.float32)
                for sh in shapes
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*meta_args, cy, cx, f1q, gq, *f2_levels)

    cxf = coords[..., 0].astype(jnp.float32)
    cyf = coords[..., 1].astype(jnp.float32)

    if n_slab:
        oy, all_ok = _slab_meta(coords, N, shapes, slabs, tile, n)

        def full_branch(_):
            return run((0,) * L, None, cyf, cxf, f1, g, tile=full_tile)

        if sort_fallback:
            def sorted_branch(_):
                order, inv = _sort_order(coords, N)
                cys = jnp.take_along_axis(cyf, order, axis=1)
                cxs = jnp.take_along_axis(cxf, order, axis=1)
                f1s = jnp.take_along_axis(f1, order[..., None], axis=1)
                gs = jnp.take_along_axis(g, order[..., None, None], axis=1)
                cs = jnp.stack([cxs, cys], axis=-1)
                oy2, ok2 = _slab_meta(cs, N, shapes, slabs, tile, n)
                outs_s = lax.cond(
                    ok2,
                    lambda m: run(slabs, m, cys, cxs, f1s, gs),
                    lambda m: run((0,) * L, m, cys, cxs, f1s, gs,
                                  tile=full_tile),
                    oy2.reshape(-1),
                )
                # df2 accumulates in fmap2 space — query-order-free; only
                # df1 rides the permutation back
                df1_s = jnp.take_along_axis(outs_s[0], inv[..., None],
                                            axis=1)
                return (df1_s,) + tuple(outs_s[1:])

            fallback = sorted_branch
        else:
            fallback = full_branch

        outs = lax.cond(
            all_ok,
            lambda m: run(slabs, m, cyf, cxf, f1, g),
            fallback,
            oy.reshape(-1),
        )
    else:
        outs = run(slabs, None, cyf, cxf, f1, g)

    df1 = outs[0][:, :N]
    return df1, list(outs[1:])
