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


def _tiled_eligible(img_shape, ry, rx):
    """Effective radii for the tiled kernel, or None if the geometry is too
    small to profit (tiny pyramid levels gather fast anyway)."""
    from .pallas.warp_tile import TH, TW

    B, H, W, C = img_shape
    hp = H + (-H) % TH
    wp = W + (-W) % TW
    ry_eff = min(ry, (hp - TH - 2) // 2)
    rx_eff = min(rx, (wp - TW - 2) // 2)
    if ry_eff < 8 or rx_eff < 8 or C > 8:
        return None
    return ry_eff, rx_eff


@functools.lru_cache(maxsize=None)
def _make_sample_exact(padding_mode: str, ry: int, rx: int, interpret: bool):
    """custom_vjp sampler: tiled-kernel forward with exact gather fallback;
    gather-formulation backward."""
    from .pallas.warp_tile import warp_tiled_sample, warp_tiled_violations

    def _forward(img, x, y):
        H, W = img.shape[1:3]
        if padding_mode == "border":
            sx = jnp.clip(x, 0.0, W - 1.0)
            sy = jnp.clip(y, 0.0, H - 1.0)
        else:
            sx, sy = x, y
        zeros = padding_mode == "zeros"
        # violation test first (cheap, elementwise): the cond then runs
        # EITHER the kernel OR the gather — a violating input never pays
        # for both paths
        viol = warp_tiled_violations(
            img.shape, sy, sx, ry=ry, rx=rx, zeros_mode=zeros
        )
        return lax.cond(
            viol > 0,
            lambda: bilinear_sample(img, x, y, padding_mode=padding_mode),
            lambda: warp_tiled_sample(
                img, sy, sx, ry=ry, rx=rx, zeros_mode=zeros,
                interpret=interpret,
            )[0],
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
    eligible = (
        (interpret or jax.default_backend() == "tpu")
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
        # the warped-ones mask rides along as an extra channel: one sampler
        # pass instead of two
        ones = jnp.ones_like(img[..., :1])
        both = bilinear_sample_auto(
            jnp.concatenate([img, ones], axis=-1), px, py,
            padding_mode="zeros", ry=ry, rx=rx,
        )
        out, mask = both[..., :-1], both[..., -1:]
        mask = (mask >= 1e-4).astype(img.dtype)
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
