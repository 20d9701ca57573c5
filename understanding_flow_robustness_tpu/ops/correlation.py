"""Cost-volume correlation operators (TPU-first, NHWC).

TPU-native replacements for the reference's native extensions:

* ``spatial_correlation`` replaces the spatial-correlation-sampler CUDA op
  (models/Pytorch-Correlation-extension/Correlation_Module/correlation.cpp:
  8-124): per-pixel dot products between img1 and a patch-grid of shifted
  windows of img2, zero outside bounds.  Used by FlowNetC
  (kernel=1, patch=21, dilation_patch=2; models/submodules.py:124-138),
  PWC-Net (patch=9; models/PWCNet.py:42-50) and RAFT's spatial mode
  (models/raft/corr.py:33-54).

* ``all_pairs_correlation`` + ``corr_pyramid`` + ``corr_lookup`` replace
  RAFT's CorrBlock (models/raft/corr.py:26-106): an all-pairs feature
  matmul / sqrt(C), a 4-level avg-pooled pyramid, and a radius-r bilinear
  window lookup.

Design notes (TPU):
  The CUDA op parallelizes one thread block per output pixel with a 32-lane
  channel reduction; on TPU we instead phrase the shifted dot products as
  banded matrix products so the contraction runs on the MXU.  For each
  vertical shift ``du`` we compute ``E = f1 @ shift(f2, du)^T`` over rows
  (a (W, C) x (C, W) matmul batched over B*H) and then gather the diagonal
  band of width ``patch`` — that is exact, and for FlowNetC's geometry
  (W=64, band=41) wastes only ~35% of MXU FLOPs, which are essentially free
  next to the HBM traffic this saves.  When the band would be narrow
  relative to W (e.g. PWC levels at high resolution), a shifted
  multiply-reduce on the VPU is cheaper; ``spatial_correlation`` picks
  automatically.  Gradients flow through standard XLA ops, so the custom
  backward of the CUDA op (correlation.cpp:126-178) is subsumed by AD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .interp import bilinear_sample

Array = jax.Array


def _shift2d(x: Array, du: int, dv: int) -> Array:
    """shift2d(x)[b, i, j] = x[b, i + du, j + dv, :], zero outside bounds."""
    B, H, W, C = x.shape
    pad_h = (max(-du, 0), max(du, 0))
    pad_w = (max(-dv, 0), max(dv, 0))
    x = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
    return x[:, pad_h[0] + du : pad_h[0] + du + H,
             pad_w[0] + dv : pad_w[0] + dv + W, :]


def spatial_correlation(
    f1: Array,
    f2: Array,
    patch_size: int = 1,
    kernel_size: int = 1,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    dilation_patch: int = 1,
    impl: str = "auto",
) -> Array:
    """Spatial correlation sampling, NHWC.

    f1, f2: (B, H, W, C).  Returns (B, oH, oW, patch_size**2) with the patch
    grid flattened row-major (du-major) into the channel axis — i.e. the
    reference's (B, pH, pW, oH, oW) output (correlation.cpp:75-124) already
    "collated" the way every caller immediately reshapes it
    (models/submodules.py:124-138).  No /C normalization is applied here;
    callers divide by C as the reference wrappers do.

    The common fast path (kernel_size=1, stride=1, padding=0 — the only
    configuration the reference models use) runs as banded MXU matmuls or a
    VPU shifted multiply-reduce (impl="band" / "shift" / "auto").  The
    general path supports kernel/stride/padding/dilation for full parity
    with the pip op.
    """
    if kernel_size == 1 and stride == 1 and padding == 0:
        return _spatial_correlation_k1(f1, f2, patch_size, dilation_patch, impl)
    return _spatial_correlation_general(
        f1, f2, patch_size, kernel_size, stride, padding, dilation, dilation_patch
    )


def _spatial_correlation_k1(
    f1: Array, f2: Array, patch_size: int, dilation_patch: int, impl: str
) -> Array:
    B, H, W, C = f1.shape
    if impl == "auto":
        # The banded-matmul path is all-MXU and compiles to ~2P einsums;
        # the shifted-dot path emits P^2 fused elementwise ops (441 for
        # FlowNetC), which is VPU-bound and very slow to compile.  Band
        # wins everywhere we've measured; shift remains for cross-checks.
        impl = "band"

    if impl == "band":
        return _corr_k1_band(f1, f2, patch_size, dilation_patch)
    return _corr_k1_shift(f1, f2, patch_size, dilation_patch)


def _band_selector(w0: int, w1: int, lo: int, hi: int,
                   patch_size: int, dilation_patch: int):
    """Static (w1-w0, hi-lo, P) 0/1 selector S with S[w-w0, v-lo, p] = 1 iff
    v == w + (p - rad) * dilation_patch — turns the diagonal-band
    extraction into an MXU einsum instead of a TPU-hostile gather.
    ``[w0, w1)`` is the query-column block, ``[lo, hi)`` the slab of f2
    columns it reads (full width or block + halo)."""
    import numpy as np

    rad = (patch_size - 1) // 2
    w = np.arange(w0, w1)[:, None]
    shifts = (np.arange(patch_size) - rad) * dilation_patch
    tgt = w + shifts[None, :]  # (blk, P)
    sel = np.zeros((w1 - w0, hi - lo, patch_size), np.float32)
    valid = (tgt >= lo) & (tgt < hi)
    wi, pi = np.nonzero(valid)
    sel[wi, tgt[wi, pi] - lo, pi] = 1.0
    return jnp.asarray(sel)


_BAND_BLOCK = 128  # query-column block (lane width) for the blocked path


def _corr_k1_band(f1: Array, f2: Array, patch_size: int, dilation_patch: int) -> Array:
    """Per-row band matmul + static-selector band contraction (MXU path).

    For each vertical shift du: E = f1 @ shift(f2, du)^T over rows, then
    band[..., w, p] = sum_v E[..., w, v] * S[w, v, p] — both stages are
    dense matmuls, keeping the whole op on the MXU with zero gathers.

    When the horizontal band is much narrower than the row (W large vs
    patch), E is computed per 128-column query block against a
    block + halo slab of f2 instead of the full (W, W) row product —
    bit-identical (the selector is one-hot over v, so the contraction
    never mixes values) and ~11x faster at PWC level-2 geometry
    (96x320xP9: 10.1 -> 0.9 ms; the full-row E is 2.8 GB of HBM writes).
    The full-row form remains for narrow rows (FlowNetC's 48x160 at
    patch 21 d2, where the halo covers most of the row anyway).
    """
    B, H, W, C = f1.shape
    rad = (patch_size - 1) // 2
    halo = rad * dilation_patch
    blocked = W >= 2 * (_BAND_BLOCK + 2 * halo)
    col_blocks = []
    if blocked:
        for w0 in range(0, W, _BAND_BLOCK):
            w1 = min(w0 + _BAND_BLOCK, W)
            lo = max(w0 - halo, 0)
            hi = min(w1 - 1 + halo + 1, W)
            col_blocks.append((w0, w1, lo, hi))
    else:
        col_blocks.append((0, W, 0, W))

    # DEFAULT matmul precision, deliberately: forcing f32 (HIGHEST) here
    # was measured at -35% FlowNetC e2e (433 -> 286 pairs/s) and -27% on
    # the patch-attack metric, while the f32 conv stack around this op
    # runs at default precision anyway — the parity suites pass at their
    # per-pixel tolerances with the default, and the bf16-drift budget
    # analysis (PERF.md) already brackets the error.
    rows = []
    for p in range(patch_size):
        du = (p - rad) * dilation_patch
        f2s = _shift2d(f2, du, 0)  # rows of f2 shifted vertically, zero pad
        bands = []
        for (w0, w1, lo, hi) in col_blocks:
            e = jnp.einsum(
                "bhwc,bhvc->bhwv", f1[:, :, w0:w1], f2s[:, :, lo:hi],
                preferred_element_type=jnp.float32,
            )
            sel = _band_selector(w0, w1, lo, hi, patch_size, dilation_patch)
            bands.append(jnp.einsum(
                "bhwv,wvp->bhwp", e, sel,
                preferred_element_type=jnp.float32,
            ))
        band = bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=2)
        rows.append(band)  # (B, H, W, P)
    out = jnp.stack(rows, axis=3)  # (B, H, W, P_u, P_v)
    return out.reshape(B, H, W, patch_size * patch_size).astype(f1.dtype)


def _corr_k1_shift(f1: Array, f2: Array, patch_size: int, dilation_patch: int) -> Array:
    """Shifted multiply-reduce (VPU path) — cheaper for narrow bands."""
    B, H, W, C = f1.shape
    rad = (patch_size - 1) // 2
    outs = []
    for pu in range(patch_size):
        du = (pu - rad) * dilation_patch
        for pv in range(patch_size):
            dv = (pv - rad) * dilation_patch
            f2s = _shift2d(f2, du, dv)
            outs.append(
                jnp.sum(
                    f1.astype(jnp.float32) * f2s.astype(jnp.float32), axis=-1
                )
            )
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


def _spatial_correlation_general(
    f1: Array,
    f2: Array,
    patch_size: int,
    kernel_size: int,
    stride: int,
    padding: int,
    dilation: int,
    dilation_patch: int,
) -> Array:
    """General-parameter path mirroring correlation.cpp:75-124 exactly.

    Computes per-shift products then window-sums over the (dilated) kernel
    with the output stride; both f1 and f2 positions are zero outside
    bounds (the WITHIN_BOUNDS guard at correlation.cpp:6,24-28).
    """
    B, H, W, C = f1.shape
    rad = (patch_size - 1) // 2
    dil_k = (kernel_size - 1) * dilation + 1
    oH = (H + 2 * padding - dil_k) // stride + 1
    oW = (W + 2 * padding - dil_k) // stride + 1

    # Kernel-window offsets on the padded product map.
    k_offsets = [(ki * dilation, kj * dilation)
                 for ki in range(kernel_size) for kj in range(kernel_size)]

    outs = []
    for pu in range(patch_size):
        du = (pu - rad) * dilation_patch
        for pv in range(patch_size):
            dv = (pv - rad) * dilation_patch
            f2s = _shift2d(f2, du, dv)
            prod = jnp.sum(
                f1.astype(jnp.float32) * f2s.astype(jnp.float32), axis=-1
            )  # (B, H, W)
            prod = jnp.pad(prod, ((0, 0), (padding, padding), (padding, padding)))
            acc = jnp.zeros((B, oH, oW), jnp.float32)
            for (ki, kj) in k_offsets:
                win = lax.slice(
                    prod,
                    (0, ki, kj),
                    (B, ki + (oH - 1) * stride + 1, kj + (oW - 1) * stride + 1),
                    (1, stride, stride),
                )
                acc = acc + win
            outs.append(acc)
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


# ---------------------------------------------------------------------------
# RAFT all-pairs correlation (models/raft/corr.py:26-106)
# ---------------------------------------------------------------------------


def all_pairs_correlation(f1: Array, f2: Array) -> Array:
    """All-pairs feature correlation: (B, H, W, C) x 2 -> (B, H*W, H, W).

    corr[b, (i, j), k, l] = <f1[b, i, j], f2[b, k, l]> / sqrt(C)
    (models/raft/corr.py:98-106).  A single big MXU matmul.
    """
    B, H, W, C = f1.shape
    a = f1.reshape(B, H * W, C)
    b = f2.reshape(B, H * W, C)
    # DEFAULT matmul precision, matching the conv stack's policy (forcing
    # HIGHEST in the correlation ops measured -35% FlowNetC e2e for zero
    # observable parity benefit — the suites pass at their tolerances)
    corr = jnp.einsum("bxc,byc->bxy", a, b,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(C, jnp.float32))
    return corr.reshape(B, H * W, H, W).astype(f1.dtype)


def corr_pyramid(corr: Array, num_levels: int = 4) -> list[Array]:
    """Average-pool pyramid over the *target* spatial dims
    (models/raft/corr.py:60-64).  corr: (B, N, H2, W2).

    Pools directly in the (..., H2, W2) layout — W2 stays the TPU lane
    dimension (routing through a trailing channel of 1 wastes 127/128
    lanes and measured 6x slower than HBM bandwidth).  The pairwise
    reduction association here is mirrored bit-for-bit by
    ops/pallas/alt_corr.py::pool_fmap_levels (the fused path's pooling) —
    keep them in lockstep."""
    pyr = [corr]
    x = corr
    for _ in range(num_levels - 1):
        h2, w2 = x.shape[2] // 2, x.shape[3] // 2
        x = x[:, :, : 2 * h2, : 2 * w2]
        rows = x[:, :, 0::2, :] + x[:, :, 1::2, :]
        x = (rows[..., 0::2] + rows[..., 1::2]) * jnp.asarray(0.25, x.dtype)
        pyr.append(x)
    return pyr


def corr_lookup(pyramid: list[Array], coords: Array, radius: int = 4,
                impl: str | None = None, compute_dtype=None) -> Array:
    """Radius-r window lookup into the correlation pyramid.

    pyramid[i]: (B, H1*W1, H2/2^i, W2/2^i); coords: (B, H1, W1, 2) in pixel
    units of level 0, channel order (x, y).  Returns
    (B, H1, W1, num_levels*(2r+1)^2), matching CorrBlock.__call__
    (models/raft/corr.py:72-96: per level, bilinear sample of a
    (2r+1)x(2r+1) grid centered at coords/2^i, align_corners=True, zeros).

    compute_dtype: optional dtype (e.g. bf16) for the volume + selector
    traffic of the MXU path — the lookup is HBM-bound, so halving the
    element size nearly halves its cost; accumulation stays f32.

    impl=None (default) resolves to "mxu" (see the comment at the
    selection site: the fused kernel's compact-layout win is eaten by an
    output relayout; the relayout-free form is ``corr_lookup_padded``).

    impl="pallas": fused Pallas kernel (ops/pallas/corr_lookup_fused.py) —
    the TPU analog of alt_cuda_corr/correlation_kernel.cu:18-100.  The
    volume streams through VMEM once; selectors and intermediates never
    touch HBM.  Forward-only: gradients route through the "mxu"
    formulation via custom_vjp (identical math).

    impl="mxu": gather-free pure-XLA fallback.  All (2r+1)^2 sample points
    of a query share one fractional offset, so the bilinear window lookup
    is a separable pair of per-query one-hot-selector matmuls with the
    bilinear weights baked in — far faster on TPU than the scalar gathers
    of the direct formulation (impl="gather", kept as the semantic
    reference), but it materializes selector/intermediate tensors in HBM.
    """
    if impl is None:
        # auto stays on "mxu" for the COMPACT reference layout: the fused
        # kernel beats it per level but loses its win to the 16x16 ->
        # transposed-9x9 output relayout the compact layout forces.  The
        # relayout-free resolution is ``corr_lookup_padded`` (lane-stacked
        # padded layout + zero-weighted consumption), which RAFT's volume
        # path now uses on TPU (models/raft_model.py use_vol_padded).
        impl = "mxu"
    if impl == "gather":
        return _corr_lookup_gather(pyramid, coords, radius)
    if impl == "pallas":
        return _corr_lookup_pallas_vjp(tuple(pyramid), coords, radius,
                                       compute_dtype)
    return _corr_lookup_mxu(pyramid, coords, radius, compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _corr_lookup_pallas_vjp(pyramid, coords, radius, compute_dtype):
    from .pallas.corr_lookup_fused import corr_lookup_pallas

    return corr_lookup_pallas(list(pyramid), coords, radius, compute_dtype)


def _corr_lookup_pallas_fwd(pyramid, coords, radius, compute_dtype):
    out = _corr_lookup_pallas_vjp(pyramid, coords, radius, compute_dtype)
    return out, (pyramid, coords)


def _corr_lookup_pallas_bwd(radius, compute_dtype, res, g):
    pyramid, coords = res
    _, vjp = jax.vjp(
        lambda p, c: _corr_lookup_mxu(list(p), c, radius, compute_dtype),
        pyramid, coords,
    )
    return vjp(g)


_corr_lookup_pallas_vjp.defvjp(_corr_lookup_pallas_fwd,
                               _corr_lookup_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def corr_lookup_padded(pyramid, coords, radius: int = 4,
                       compute_dtype=None, interpret: bool = False):
    """RAFT window lookup emitting the PADDED lane-stacked layout
    (B, H1, W1, L*256), channel t*(L*16) + l*16 + s — consumed directly
    by the fused motion encoder (models/raft_model.py::PaddedCorrConv1x1)
    with no relayout.  Forward: fused Pallas kernel
    (ops/pallas/corr_lookup_fused.py); gradients route through the "mxu"
    formulation (identical math on the real window channels).

    INVARIANT: channels at window positions t or s >= 2r+1 are LIVE hat
    samples past the window — consumers must weight them by zero (the
    backward assumes their cotangents are zero; PaddedCorrConv1x1's
    zero-scattered kernel guarantees both)."""
    from .pallas.corr_lookup_fused import corr_lookup_pallas_padded

    return corr_lookup_pallas_padded(list(pyramid), coords, radius,
                                     compute_dtype, interpret=interpret)


def _corr_lookup_padded_fwd(pyramid, coords, radius, compute_dtype,
                            interpret):
    out = corr_lookup_padded(pyramid, coords, radius, compute_dtype,
                             interpret)
    return out, (pyramid, coords)


def _corr_lookup_padded_bwd(radius, compute_dtype, interpret, res, g):
    pyramid, coords = res
    B, H1, W1, _ = g.shape
    n = 2 * radius + 1
    L = len(pyramid)
    # padded channel t*(L*16) + l*16 + s -> compact level-l channel
    # s*n + t (the reference's transposed order); junk-lane cotangents
    # are zero by the consumer invariant, so slicing loses nothing
    g6 = g.astype(jnp.float32).reshape(B, H1, W1, 16, L, 16)
    gc = jnp.concatenate(
        [
            g6[..., :n, l, :n].transpose(0, 1, 2, 4, 3).reshape(
                B, H1, W1, n * n
            )
            for l in range(L)
        ],
        axis=-1,
    )
    _, vjp = jax.vjp(
        lambda p, c: _corr_lookup_mxu(list(p), c, radius, compute_dtype),
        pyramid, coords,
    )
    return vjp(gc)


corr_lookup_padded.defvjp(_corr_lookup_padded_fwd, _corr_lookup_padded_bwd)


def _corr_lookup_mxu(pyramid: list[Array], coords: Array, radius: int,
                     compute_dtype=None) -> Array:
    B, H1, W1, _ = coords.shape
    N = H1 * W1
    r = radius
    n = 2 * r + 1
    sel_dtype = compute_dtype or jnp.float32

    out = []
    for i, corr in enumerate(pyramid):
        Hl, Wl = corr.shape[2], corr.shape[3]
        vol = corr.reshape(B, N, Hl, Wl)
        if compute_dtype is not None and vol.dtype != compute_dtype:
            vol = vol.astype(compute_dtype)

        c = coords.reshape(B, N, 2) / (2 ** i)
        cx, cy = c[..., 0], c[..., 1]
        fx0 = jnp.floor(cx)
        fy0 = jnp.floor(cy)
        wx = (cx - fx0)[..., None, None]  # frac parts, shared by all taps
        wy = (cy - fy0)[..., None, None]
        ix0 = fx0.astype(jnp.int32) - r
        iy0 = fy0.astype(jnp.int32) - r

        # Separable bilinear selectors with weights baked in:
        #   Wrow[b, q, t, h] = (1-wy)*[h == iy0+t] + wy*[h == iy0+t+1]
        # so that (Wrow @ vol @ Wcol^T)[t, s] = bilinear(vol, y=cy+t-r,
        # x=cx+s-r).  Out-of-volume taps simply never match the iota
        # comparison, giving an all-zero selector row — exactly the
        # reference's zeros-padding semantics with no padding or clamping.
        hh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Hl), 3)
        tt = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n, 1), 2)
        row_base = iy0[..., None, None] + tt
        wrow = (
            (hh == row_base).astype(jnp.float32) * (1.0 - wy)
            + (hh == row_base + 1).astype(jnp.float32) * wy
        ).astype(sel_dtype)  # (B, N, n, Hl)
        ww = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wl), 3)
        col_base = ix0[..., None, None] + tt
        wcol = (
            (ww == col_base).astype(jnp.float32) * (1.0 - wx)
            + (ww == col_base + 1).astype(jnp.float32) * wx
        ).astype(sel_dtype)  # (B, N, n, Wl)

        rowsel = jnp.einsum(
            "bqth,bqhw->bqtw", wrow, vol, preferred_element_type=jnp.float32
        ).astype(sel_dtype)
        patch = jnp.einsum(
            "bqtw,bqsw->bqts", rowsel, wcol, preferred_element_type=jnp.float32
        )  # (B, N, n, n): [t, s] = sample at (y + t - r, x + s - r)
        # Reference channel order is transposed: index a*n+b samples
        # (x + a - r, y + b - r) (torch.meshgrid quirk, corr.py:79-85).
        patch = patch.transpose(0, 1, 3, 2)
        out.append(patch.reshape(B, H1, W1, n * n).astype(coords.dtype))
    return jnp.concatenate(out, axis=-1)


def _corr_lookup_gather(pyramid: list[Array], coords: Array, radius: int) -> Array:
    B, H1, W1, _ = coords.shape
    r = radius
    n = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # Reference stacks meshgrid(dy, dx) -> delta[..., 0] = dy, [..., 1] = dx,
    # then adds to coords whose last dim is (x, y): so x += dy-grid values,
    # y += dx-grid values — reproduce the exact ordering so the flattened
    # channel order matches.
    out = []
    for i, corr in enumerate(pyramid):
        Hl, Wl = corr.shape[2], corr.shape[3]
        c = coords.reshape(B, H1 * W1, 1, 2) / (2 ** i)
        dyg, dxg = jnp.meshgrid(dx, dx, indexing="ij")
        offs = jnp.stack([dyg, dxg], axis=-1).reshape(1, 1, n * n, 2)
        pts = c + offs  # (B, N, n*n, 2): x = c_x + dy, y = c_y + dx
        px = pts[..., 0].reshape(B * H1 * W1, n * n)
        py = pts[..., 1].reshape(B * H1 * W1, n * n)
        img = corr.reshape(B * H1 * W1, Hl, Wl, 1)
        smp = bilinear_sample(img, px, py, padding_mode="zeros")
        out.append(smp.reshape(B, H1, W1, n * n))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Fused on-demand lookup (the TPU alt_cuda_corr) — see ops/pallas/alt_corr.py
# ---------------------------------------------------------------------------


def alt_corr_features(fmap1: Array, fmap2: Array, coords: Array,
                      num_levels: int = 4, radius: int = 4,
                      compute_dtype=None, padded: bool = False,
                      interpret: bool = False,
                      coords_grad: bool = True) -> Array:
    """Correlation-pyramid window lookup computed straight from the feature
    maps — value-equal to
    ``corr_lookup(corr_pyramid(all_pairs_correlation(f1, f2)), coords)``
    without materializing the (B, H*W, H, W) volume in HBM.

    The TPU analog of the reference's AlternateCorrBlock / alt_cuda_corr
    (models/raft/corr.py:109-137, alt_cuda_corr/correlation_kernel.cu:
    18-100): per query tile, the corr rows are recomputed on the MXU against
    a VMEM-resident (pooled) fmap2 inside a fused Pallas kernel.

    padded=True returns (B, H, W, num_levels*256) with each level's
    (2r+1)x(2r+1) window laid into a 16x16 channel block
    (channel = t*(L*16) + l*16 + s) — the layout the fused RAFT motion
    encoder consumes directly.

    INVARIANT (padded=True): channels at window positions t or
    s >= 2r+1 are LIVE hat samples on the TPU kernel path but zeros on
    the reference path — consumers must weight them by zero or slice
    them off, and cotangents flowing back into them must be zero (the
    Pallas backward assumes it).  Both production consumers satisfy
    this; ``check_padded_window_unused`` + tests/test_ops_correlation.py
    enforce it for new ones.

    VMEM guard: the fused kernel keeps all pooled fmap2 levels, the
    level-0 corr tile and the broadcast f1 tile resident in VMEM.  When
    the estimated footprint exceeds the compiled 96 MB budget (feature
    maps much larger than the KITTI eval geometry), this entry falls
    back to the volume formulation instead of failing to compile.

    Differentiable: gradients route through the volume formulation
    (identical math) via custom_vjp.  ``coords_grad=False`` skips the
    coordinate cotangent entirely (returns zeros) — RAFT detaches coords
    every iteration (models/raft/raft.py:188), so its training/attack
    backward never consumes dcoords, and computing it costs two full
    derivative-selector kernel passes per iteration.
    """
    # gate on BOTH kernels' footprints: the path choice happens at trace
    # time and cannot know whether the caller will differentiate, and the
    # backward kernel (alt_lookup_bwd) holds f32 df2 accumulators plus
    # U/t1/d2 intermediates the forward never materializes — a geometry
    # the forward admits could otherwise fail to compile the first time
    # an attack/training step differentiates through it
    need = max(
        _alt_vmem_bytes(fmap1.shape, num_levels, radius, compute_dtype),
        _alt_bwd_vmem_bytes(fmap1.shape, num_levels, radius, compute_dtype),
    )
    if not interpret and need > _ALT_VMEM_BUDGET:
        return _alt_corr_reference(fmap1, fmap2, coords, num_levels,
                                   radius, compute_dtype, padded)
    return _alt_corr_vjp(fmap1, fmap2, coords, num_levels, radius,
                         compute_dtype, padded, interpret, coords_grad)


_ALT_VMEM_BUDGET = 80 * 1024 * 1024  # margin under the 96 MB compile limit


def _alt_vmem_bytes(fmap_shape, num_levels, radius, compute_dtype,
                    tile: int = 256) -> int:
    """Worst-case VMEM residency of one alt_lookup kernel invocation
    (ops/pallas/alt_corr.py::_alt_corr_kernel): every pooled fmap2 level,
    the level-0 (Hl, tile, Wl) f32 corr intermediate plus its sel-dtype
    copy, the broadcast f1 tile, and the lane-stacked output block."""
    B, H, W, C = fmap_shape
    item = 2 if compute_dtype == jnp.bfloat16 else 4
    levels = sum(
        max(H >> l, 1) * max(W >> l, 1) * C for l in range(num_levels)
    ) * item
    corr = H * tile * W * (4 + item)          # f32 corrH + sel-dtype copy
    f1e = H * tile * C * item                 # broadcast f1 tile (level 0)
    out = tile * 16 * num_levels * 16 * item
    return levels + corr + f1e + out


def _alt_bwd_vmem_bytes(fmap_shape, num_levels, radius, compute_dtype,
                        tile: int = 128) -> int:
    """Worst-case VMEM residency of one alt_lookup_bwd invocation
    (ops/pallas/alt_corr.py::_alt_corr_bwd_kernel): the f2 levels plus
    their f32 df2 accumulator blocks, the level-0 U/Uh window-weight
    images, the tmp/t1/d2 contraction intermediates, the broadcast f1
    tile and the g block."""
    B, H, W, C = fmap_shape
    item = 2 if compute_dtype == jnp.bfloat16 else 4
    lv_elems = sum(
        max(H >> l, 1) * max(W >> l, 1) * C for l in range(num_levels)
    )
    levels = lv_elems * item       # f2 inputs
    df2 = lv_elems * 4             # f32 accumulator output blocks
    u = 2 * tile * H * W * item    # U + its (Hl, tq, Wl) transpose Uh
    tmp = tile * 16 * W * item
    t1 = H * tile * C * 4
    f1e = H * tile * C * item
    d2 = H * W * C * 4
    g = tile * 16 * num_levels * 16 * item
    return levels + df2 + u + tmp + t1 + f1e + d2 + g


def check_padded_window_unused(weights_or_slice: Array, radius: int) -> bool:
    """Debug helper for new consumers of the padded layout: True iff the
    given per-window weight block (..., 16, L*16) is zero at every window
    position with t or s >= 2r+1 (the live-padding lanes the kernel does
    not zero)."""
    n = 2 * radius + 1
    P = 16
    w = jnp.asarray(weights_or_slice)
    L = w.shape[-1] // P
    w5 = w.reshape(w.shape[:-2] + (P, L, P))
    pad_t = w5[..., n:, :, :]
    pad_s = w5[..., :, :, n:]
    return bool(
        jnp.all(pad_t == 0) & jnp.all(pad_s == 0)
    )


def _alt_corr_reference(fmap1: Array, fmap2: Array, coords: Array,
                        num_levels: int, radius: int,
                        compute_dtype=None, padded: bool = False) -> Array:
    """jnp reference for alt_corr_features (and its backward): the explicit
    volume + pyramid + mxu-lookup composition."""
    corr0 = all_pairs_correlation(fmap1, fmap2)
    if compute_dtype is not None:
        corr0 = corr0.astype(compute_dtype)
    pyr = corr_pyramid(corr0, num_levels)
    out = _corr_lookup_mxu(pyr, coords, radius, compute_dtype)
    if not padded:
        return out
    # re-emit in the lane-stacked padded layout: channel
    # t*(L*16) + l*16 + s (the padding entries are zero here — consumers
    # must not read them, the Pallas kernel leaves live samples there)
    B, H, W, _ = coords.shape
    n = 2 * radius + 1
    P = 16
    chunks = jnp.split(out, num_levels, axis=-1)
    stacked = jnp.zeros((B, H, W, P, num_levels, P), out.dtype)
    for lvl, ch in enumerate(chunks):
        blk = ch.reshape(B, H, W, n, n)  # (s, t) s-major
        blk = jnp.transpose(blk, (0, 1, 2, 4, 3))  # -> (t, s)
        stacked = stacked.at[..., :n, lvl, :n].set(blk)
    stacked = stacked.reshape(B, H, W, P * num_levels * P)
    # match the Pallas forward's output dtype (bf16 in production) so the
    # custom_vjp cotangent dtypes line up
    if compute_dtype is not None:
        stacked = stacked.astype(compute_dtype)
    return stacked


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _alt_corr_vjp(fmap1, fmap2, coords, num_levels, radius, compute_dtype,
                  padded, interpret, coords_grad=True):
    from .pallas.alt_corr import alt_corr_features as _pallas_impl

    return _pallas_impl(fmap1, fmap2, coords, num_levels, radius,
                        compute_dtype, padded, interpret)


def _alt_corr_fwd(fmap1, fmap2, coords, num_levels, radius, compute_dtype,
                  padded, interpret, coords_grad=True):
    out = _alt_corr_vjp(fmap1, fmap2, coords, num_levels, radius,
                        compute_dtype, padded, interpret, coords_grad)
    return out, (fmap1, fmap2, coords)


def _alt_corr_bwd(num_levels, radius, compute_dtype, padded, interpret,
                  coords_grad, res, g):
    fmap1, fmap2, coords = res
    if jax.default_backend() == "tpu" and not interpret:
        return _alt_corr_bwd_pallas(
            fmap1, fmap2, coords, g, num_levels, radius, compute_dtype,
            padded, coords_grad=coords_grad,
        )
    _, vjp = jax.vjp(
        lambda a, b, c: _alt_corr_reference(
            a, b, c, num_levels, radius, compute_dtype, padded
        ),
        fmap1, fmap2, coords,
    )
    df1, df2, dc = vjp(g)
    if not coords_grad:
        dc = jnp.zeros_like(coords)
    return df1, df2, dc


def _alt_corr_bwd_pallas(fmap1, fmap2, coords, g, num_levels, radius,
                         compute_dtype, padded, interpret=False,
                         coords_grad=True):
    """Volume-free backward: f1/f2 cotangents via the dedicated Pallas
    kernel (ops/pallas/alt_corr.py::alt_lookup_bwd) and the coordinate
    cotangent via two derivative-selector forward passes — the bilinear
    weight's dc-derivative is itself a separable selector, so
    d(out)/d(cx) is just the forward lookup with scol' = sign-hats."""
    from .pallas.alt_corr import (
        TILE_P,
        alt_lookup,
        alt_lookup_bwd,
        default_slabs,
        pool_fmap_levels,
        unpool_fmap_grads,
    )

    B, H, W, C = fmap1.shape
    N = H * W
    n = 2 * radius + 1
    P = TILE_P
    L = num_levels

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f1 = (fmap1.astype(jnp.float32) * scale).reshape(B, N, C)
    f2f = fmap2.astype(jnp.float32)
    if compute_dtype is not None:
        f1 = f1.astype(compute_dtype)
    levels_f32 = tuple(pool_fmap_levels(f2f, L))
    levels = tuple(
        l.astype(compute_dtype) if compute_dtype is not None else l
        for l in levels_f32
    )
    cflat = coords.reshape(B, N, 2).astype(jnp.float32)

    # cotangent back into the kernel's lane-stacked (t, s) layout
    if padded:
        g_stacked = g.reshape(B, N, P, L * P)
    else:
        gs = jnp.zeros((B, N, P, L, P), jnp.float32)
        for lvl in range(L):
            gl = g[..., lvl * n * n:(lvl + 1) * n * n].reshape(B, N, n, n)
            gl = jnp.transpose(gl, (0, 1, 3, 2))  # (s, t) -> (t, s)
            gs = gs.at[:, :, :n, lvl, :n].set(gl.astype(jnp.float32))
        g_stacked = gs.reshape(B, N, P, L * P)
    gk = g_stacked.astype(f1.dtype)

    # same flow-following row slabs as the forward (recomputed from the
    # residual coords at the backward's own tile size): the U window-
    # weight image is exactly the hat-selector support, so both backward
    # MXU dots shrink to the band whenever every tile's band fits
    shapes = tuple((lv.shape[1], lv.shape[2]) for lv in levels)
    # sort_fallback measured OFF here too (round 4, train geometry 4 @
    # 36x120): wild 4.08 ms sorted vs 3.13 unsorted — the f1/g permutation
    # gathers cost more than the slab saving (see the forward's note in
    # pallas/alt_corr.py::alt_corr_features).  fallback_tile=256: wild
    # flows (full-extent branch) run 2.09 ms/iter at tile 256 vs 3.37 at
    # the slab branch's tile 128 (alt_lookup_bwd docstring).
    bwd_slabs = default_slabs(shapes, 128, n)
    df1, dlevels = alt_lookup_bwd(f1, levels, cflat, gk, radius,
                                  interpret=interpret, slabs=bwd_slabs,
                                  fallback_tile=256)
    dfmap1 = (df1 * scale).reshape(B, H, W, C).astype(fmap1.dtype)
    # scatter-free avg-pool transpose (see unpool_fmap_grads)
    dfmap2 = unpool_fmap_grads(dlevels, fmap2.shape).astype(fmap2.dtype)

    if not coords_grad:
        # the caller declared the coordinate cotangent dead (RAFT
        # detaches coords per iteration, raft.py:188): skip the two
        # derivative-selector kernel passes per call
        return dfmap1, dfmap2, jnp.zeros_like(coords)

    # dcoords: derivative-selector forward passes; level l contributes
    # with the 1/2^l chain factor of coords -> coords/2^l
    lv_w = (1.0 / 2 ** jnp.arange(L, dtype=jnp.float32))[None, None, None,
                                                         :, None]
    g5 = g_stacked.astype(jnp.float32).reshape(B, N, P, L, P) * lv_w
    outdx = alt_lookup(f1, levels, cflat, radius, interpret=interpret,
                       deriv="x").astype(jnp.float32).reshape(B, N, P, L, P)
    outdy = alt_lookup(f1, levels, cflat, radius, interpret=interpret,
                       deriv="y").astype(jnp.float32).reshape(B, N, P, L, P)
    dcx = jnp.sum(g5 * outdx, axis=(2, 3, 4))
    dcy = jnp.sum(g5 * outdy, axis=(2, 3, 4))
    dcoords = jnp.stack([dcx, dcy], axis=-1).reshape(B, H, W, 2).astype(
        coords.dtype)
    return dfmap1, dfmap2, dcoords


_alt_corr_vjp.defvjp(_alt_corr_fwd, _alt_corr_bwd)


# ---------------------------------------------------------------------------
# Deferred-sort lookup: the sorted-tile rescue with the unsort moved OFF the
# (B, N, 16, L*16) corr output (PERF.md "sorted-tile slab rescue": kernel win
# real, XLA's ~145 GB/s permutation gather on the full output ate it).  The
# lookup returns the SORTED output plus the permutation; the RAFT motion
# encoder applies its per-query 1x1 conv in sorted order and the inverse
# permutation rides the 4x-smaller (256-channel) activation instead
# (models/raft/corr.py:61-96 is the reference being accelerated).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def permute_rows(x: Array, idx: Array, inv: Array) -> Array:
    """``take_along_axis(x, idx[..., None], axis=1)`` whose BACKWARD is a
    gather by the inverse permutation instead of AD's scatter — XLA's TPU
    scatter lowering costs ~3x the equivalent gather (measured round 5:
    0.8 ms scatter vs 0.26 ms gather at (8, 7680, 256) bf16), and for a
    permutation the cotangent routing is itself a permutation, so no
    scatter is ever needed.  idx/inv must be mutually inverse (B, N)
    permutations (caller-guaranteed, e.g. from ``_sort_order``)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _permute_rows_fwd(x, idx, inv):
    return jnp.take_along_axis(x, idx[..., None], axis=1), (idx, inv)


def _permute_rows_bwd(res, g):
    idx, inv = res
    return (jnp.take_along_axis(g, inv[..., None], axis=1), None, None)


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def alt_corr_features_sorted(fmap1: Array, fmap2: Array, coords: Array,
                             num_levels: int = 4, radius: int = 4,
                             compute_dtype=None, interpret: bool = False):
    """(corr_sorted, order, inv): the padded lane-stacked lookup with its
    queries permuted into flow-y order.

    corr_sorted: (B, N, 16*L*16), channel = t*(L*16) + l*16 + s — the
    SAME channel layout as ``alt_corr_features(padded=True)`` but with
    the query axis permuted by ``order`` (and flattened: sorted order is
    not spatial).  ``inv``: (B, N) int32 with
    ``corr_sorted[b, inv[b, q]] == corr_unsorted[b, q]``.

    Why: row-major query tiles of WILD flows (training iterates,
    random-weight inference) span full-height corr bands, disabling the
    flow-following slab kernel; sorting by window-center y restores the
    slab path for any flow field.  The unsort is deferred to the caller,
    who applies it after the first per-query (1x1) consumer so it rides
    a 4x-smaller tensor.  Gradients: the cotangent arrives SORTED (the
    caller differentiates through its own take_along_axis), the backward
    kernel runs directly on the sorted queries (slab path again), and
    only df1 (256-channel) rides the inverse permutation.  The
    coordinate cotangent is always zero in this mode (RAFT detaches
    coords per iteration, models/raft/raft.py:188).

    VMEM fallback: geometries too large for the fused kernels route
    through the volume formulation with an explicit output sort.
    """
    B, H, W, C = fmap1.shape
    N = H * W
    need = max(
        _alt_vmem_bytes(fmap1.shape, num_levels, radius, compute_dtype),
        _alt_bwd_vmem_bytes(fmap1.shape, num_levels, radius, compute_dtype),
    )
    if not interpret and need > _ALT_VMEM_BUDGET:
        from .pallas.alt_corr import _sort_order

        out = _alt_corr_reference(fmap1, fmap2, coords, num_levels,
                                  radius, compute_dtype, padded=True)
        out = out.reshape(B, N, -1)
        order, inv = _sort_order(coords.reshape(B, N, 2), N)
        return (jnp.take_along_axis(out, order[..., None], axis=1),
                order, inv)
    return _alt_corr_sorted_vjp(fmap1, fmap2, coords, num_levels, radius,
                                compute_dtype, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _alt_corr_sorted_vjp(fmap1, fmap2, coords, num_levels, radius,
                         compute_dtype, interpret):
    from .pallas.alt_corr import (
        TILE_P,
        _sort_order,
        alt_lookup,
        default_slabs,
        pool_fmap_levels,
    )

    B, H, W, C = fmap1.shape
    N = H * W
    n = 2 * radius + 1
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f1 = (fmap1.astype(jnp.float32) * scale).reshape(B, N, C)
    if compute_dtype is not None:
        f1 = f1.astype(compute_dtype)
    levels = pool_fmap_levels(fmap2.astype(jnp.float32), num_levels)
    if compute_dtype is not None:
        levels = [l.astype(compute_dtype) for l in levels]
    cflat = coords.reshape(B, N, 2).astype(jnp.float32)

    order, inv = _sort_order(cflat, N)
    f1s = jnp.take_along_axis(f1, order[..., None], axis=1)
    cs = jnp.take_along_axis(cflat, order[..., None], axis=1)
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    tile = 256  # same config note as pallas alt_corr_features
    slabs = default_slabs(shapes, tile, n)
    out_s = alt_lookup(f1s, tuple(levels), cs, radius, tile=tile,
                       interpret=interpret, slabs=slabs)
    return (out_s.reshape(B, N, TILE_P * num_levels * TILE_P), order, inv)


def _alt_corr_sorted_fwd(fmap1, fmap2, coords, num_levels, radius,
                         compute_dtype, interpret):
    out = _alt_corr_sorted_vjp(fmap1, fmap2, coords, num_levels, radius,
                               compute_dtype, interpret)
    # stash the permutation (out[1], out[2]) so the backward does not pay
    # a second argsort pair per call
    return out, (fmap1, fmap2, coords, out[1], out[2])


def _alt_corr_sorted_bwd(num_levels, radius, compute_dtype, interpret,
                         res, gs):
    from .pallas.alt_corr import (
        TILE_P,
        alt_lookup_bwd,
        default_slabs,
        pool_fmap_levels,
        unpool_fmap_grads,
    )

    fmap1, fmap2, coords, order, inv = res
    g = gs[0]  # order/inv cotangents are float0
    B, H, W, C = fmap1.shape
    N = H * W
    n = 2 * radius + 1
    P = TILE_P
    L = num_levels

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f1 = (fmap1.astype(jnp.float32) * scale).reshape(B, N, C)
    if compute_dtype is not None:
        f1 = f1.astype(compute_dtype)
    levels_f32 = tuple(pool_fmap_levels(fmap2.astype(jnp.float32), L))
    levels = tuple(
        l.astype(compute_dtype) if compute_dtype is not None else l
        for l in levels_f32
    )
    cflat = coords.reshape(B, N, 2).astype(jnp.float32)
    f1s = jnp.take_along_axis(f1, order[..., None], axis=1)
    cs = jnp.take_along_axis(cflat, order[..., None], axis=1)
    gk = g.reshape(B, N, P, L * P).astype(f1.dtype)

    shapes = tuple((lv.shape[1], lv.shape[2]) for lv in levels)
    if jax.default_backend() == "tpu" and not interpret:
        bwd_slabs = default_slabs(shapes, 128, n)
        df1s, dlevels = alt_lookup_bwd(f1s, levels, cs, gk, radius,
                                       slabs=bwd_slabs, fallback_tile=256)
    else:
        df1s, dlevels = alt_lookup_bwd(f1s, levels, cs, gk, radius,
                                       interpret=True)
    # only df1 rides the inverse permutation (df2 lives in fmap2 space,
    # order-free); (B, N, 256) — 4x smaller than the corr cotangent
    df1 = jnp.take_along_axis(df1s.astype(jnp.float32),
                              inv[..., None], axis=1)
    dfmap1 = (df1 * scale).reshape(B, H, W, C).astype(fmap1.dtype)
    dfmap2 = unpool_fmap_grads(dlevels, fmap2.shape)
    return dfmap1, dfmap2.astype(fmap2.dtype), jnp.zeros_like(coords)


_alt_corr_sorted_vjp.defvjp(_alt_corr_sorted_fwd, _alt_corr_sorted_bwd)


def channel_norm(x: Array, eps: float = 0.0) -> Array:
    """Per-pixel L2 norm over channels: (B, H, W, C) -> (B, H, W, 1).

    Replaces the ChannelNorm CUDA op (models/channelnorm_package/
    channelnorm_kernel.cu:19-60, norm_deg fixed at 2).
    """
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return jnp.sqrt(sq + eps).astype(x.dtype)
