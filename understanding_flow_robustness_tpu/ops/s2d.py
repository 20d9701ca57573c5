"""Space-to-depth convolution transform (MXU lane-packing for small-C convs).

A stride-1 k x k conv with few output channels wastes most of the MXU: the
output-channel dim pads to the 128-lane tile (SpyNet's 7x7 G-unit stack
runs 32/64/32/16/2-channel convs at full resolution — measured 4-8x padding
waste, 95 ms of its 189 ms forward at batch 8, models/spynet.py:51-130).

The exact fix: run the conv in 2x2 space-to-depth space.  Packing 2x2
pixel blocks into channels turns a (k, k, Ci, Co) stride-1 conv into a
(k', k', 4Ci, 4Co) conv with k' = k//2 + 2 — for k=7 that is 25*4/49 ~ 2x
the contraction FLOPs but 4x the lane occupancy, a large net win whenever
Co < 128.  The transform is mathematically exact (the packed kernel is a
zero-masked rearrangement of the original taps), so checkpoints and parity
are untouched; only float reassociation differs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def space_to_depth(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel layout (p, q, c) for
    pixel (2Y+p, 2X+q).  H, W must be even."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: Array) -> Array:
    """Inverse of space_to_depth."""
    B, H2, W2, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H2, W2, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H2, 2 * W2, C)


def _phase_maps(k: int):
    """dy index + validity for (block-offset, input-phase, output-phase)."""
    kp = k // 2 + 2
    r = k // 2
    DY = np.arange(kp) - kp // 2
    dy = (
        2 * DY[:, None, None]
        + np.arange(2)[None, :, None]
        - np.arange(2)[None, None, :]
        + r
    )  # (kp, p, a)
    valid = (dy >= 0) & (dy < k)
    return kp, np.clip(dy, 0, k - 1), valid


def s2d_conv_kernel(w: Array) -> Array:
    """(k, k, Ci, Co) stride-1 SAME kernel -> (k', k', 4Ci, 4Co) kernel for
    the space-to-depth domain (channel layouts as in space_to_depth)."""
    k, kw_, Ci, Co = w.shape
    # k//2 even <=> the packed block-offset range is symmetric, so a plain
    # SAME pad stays exact (k = 3, 7, 11, ...); k = 5 would need asymmetric
    # padding — unused here, so unsupported.
    assert k == kw_ and k % 2 == 1 and (k // 2) % 2 == 1, (
        f"unsupported kernel size {k} for s2d conv"
    )
    kp, dy, vy = _phase_maps(k)

    wy = jnp.take(w, jnp.asarray(dy.reshape(-1)), axis=0)
    wy = wy.reshape(kp, 2, 2, k, Ci, Co)
    wy = wy * jnp.asarray(
        vy.reshape(kp, 2, 2, 1, 1, 1), w.dtype
    )
    wyx = jnp.take(wy, jnp.asarray(dy.reshape(-1)), axis=3)
    wyx = wyx.reshape(kp, 2, 2, kp, 2, 2, Ci, Co)
    wyx = wyx * jnp.asarray(
        vy.reshape(1, 1, 1, kp, 2, 2, 1, 1), w.dtype
    )
    # (DY, p, a, DX, q, b, i, o) -> (DY, DX, [p, q, i], [a, b, o])
    w2 = wyx.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w2.reshape(kp, kp, 4 * Ci, 4 * Co)


def s2_conv_s2d_in_kernel(w: Array, padding: int):
    """(k, k, Ci, Co) stride-2 SAME conv kernel -> stride-1 kernel over the
    space-to-depth input.

    A stride-2 conv's output grid coincides with the s2d block grid, so when
    the input already lives in s2d layout the conv becomes a small stride-1
    conv over packed channels: out[Y, X] = sum_{dy} x[2Y+dy] w[dy+r] with
    2Y+dy = 2(Y+D)+p picking block offset D and phase p.  Returns
    ``(kernel (kd, kd, 4Ci, Co), (pad_lo, pad_hi))`` for asymmetric padding.
    """
    k, kw_, Ci, Co = w.shape
    assert k == kw_
    r = padding
    dys = np.arange(k) - r
    Ds = np.floor(dys / 2.0).astype(int)
    dmin, dmax = int(Ds.min()), int(Ds.max())
    kd = dmax - dmin + 1
    dy = 2 * (dmin + np.arange(kd))[:, None] + np.arange(2)[None, :]
    ky = dy + r                                  # (kd, p)
    valid = (ky >= 0) & (ky < k)
    kyc = np.clip(ky, 0, k - 1)

    wy = jnp.take(w, jnp.asarray(kyc.reshape(-1)), axis=0)
    wy = wy.reshape(kd, 2, k, Ci, Co) * jnp.asarray(
        valid.reshape(kd, 2, 1, 1, 1), w.dtype
    )
    wyx = jnp.take(wy, jnp.asarray(kyc.reshape(-1)), axis=2)
    wyx = wyx.reshape(kd, 2, kd, 2, Ci, Co) * jnp.asarray(
        valid.reshape(1, 1, kd, 2, 1, 1), w.dtype
    )
    # (D, p, E, q, i, o) -> (D, E, [p, q, i], o)
    w2 = wyx.transpose(0, 2, 1, 3, 4, 5).reshape(kd, kd, 4 * Ci, Co)
    return w2, (-dmin, dmax)


def deconv4s2p1_s2d_out_kernel(w: Array) -> Array:
    """ConvTranspose2d(k=4, s=2, p=1) kernel (4, 4, Ci, Co), stored in the
    repo's (kh, kw, I, O) convention, -> (3, 3, Ci, 4Co) stride-1 SAME conv
    kernel at the *input* resolution whose output is the space-to-depth
    layout of the transpose conv's full-resolution output.

    out[2Y+py, 2X+px, o] = sum_{dy,dx in [-1,1]} x[Y+dy, X+dx, i]
                           * w[py + 1 - 2 dy, px + 1 - 2 dx, i, o]
    (taps with kernel index outside [0, 4) are zero).
    """
    k, kw_, Ci, Co = w.shape
    assert k == 4 and kw_ == 4
    dyo = np.arange(-1, 2)
    ky = 1 + np.arange(2)[None, :] - 2 * dyo[:, None]   # (dy, py)
    vy = (ky >= 0) & (ky < 4)
    kyc = np.clip(ky, 0, 3)
    wy = jnp.take(w, jnp.asarray(kyc.reshape(-1)), axis=0)
    wy = wy.reshape(3, 2, 4, Ci, Co) * jnp.asarray(
        vy.reshape(3, 2, 1, 1, 1), w.dtype
    )
    wyx = jnp.take(wy, jnp.asarray(kyc.reshape(-1)), axis=2)
    wyx = wyx.reshape(3, 2, 3, 2, Ci, Co) * jnp.asarray(
        vy.reshape(1, 1, 3, 2, 1, 1), w.dtype
    )
    # (dy, py, dx, px, i, o) -> (dy, dx, i, [py, px, o])
    return wyx.transpose(0, 2, 4, 1, 3, 5).reshape(3, 3, Ci, 4 * Co)


def s2d_concat_perm(channels) -> np.ndarray:
    """Input-channel permutation aligning an s2d conv kernel with an input
    built by concatenating per-source s2d tensors (instead of
    space-to-depth of the concatenated sources).

    For kernel ``k2 = s2d_conv_kernel(w)`` over the canonical s2d layout of
    ``concat(sources)``, ``k2[:, :, s2d_concat_perm(channels), :]`` consumes
    ``concat([s2d(src) for src in sources])`` directly — a trace-time
    gather, no activation relayout.
    """
    C = int(sum(channels))
    perm = np.empty(4 * C, np.int64)
    j = 0
    off = 0
    for ck in channels:
        for pq in range(4):
            perm[j: j + ck] = pq * C + off + np.arange(ck)
            j += ck
        off += ck
    return perm


def dgrad_conv_s2d(g: Array, w: Array, padding: int,
                   x_shape: tuple) -> Array:
    """Input-gradient of a stride-2 SAME conv, computed as a conv in
    4x4-packed output space.

    XLA's dgrad of conv1-style layers (7x7 s2, 3->64) is a transposed conv
    whose 3 output channels occupy 3 of 128 MXU lanes (6.7 ms vs 0.65 ms
    forward at the attack geometry, measured).  Packing the gradient image
    4x4 gives the equivalent conv 16*Ci output channels and a ~3x3 kernel
    over the 2x2-packed cotangent: dense lanes, one conv.  Mathematically
    identical to the AD backward (same sums, different association).

    g: (B, Ho, Wo, Co) cotangent of conv(x, w, stride 2, pad ``padding``);
    w: (k, k, Ci, Co).  x_shape: the primal input shape (B, Hin, Win, Ci)
    with Hin, Win divisible by 4 and Ho, Wo even.  Returns dx.
    """
    B, Hin, Win, Ci = x_shape
    k, _, _, Co = w.shape
    p = padding
    Ho, Wo = g.shape[1:3]
    assert Ho % 2 == 0 and Wo % 2 == 0 and Hin % 4 == 0 and Win % 4 == 0

    # dx[4Y+a, 4X+b, i] = sum_{D, dp, o} g[2(Y+D)+dp, ..., o]
    #                     * w[a + p - 4D - 2dp, ..., i, o]
    offs = np.arange(4)[:, None] + p - 2 * np.arange(2)[None, :]  # (a, dp)
    dmin = int(np.floor((offs.min() - (k - 1)) / 4.0))
    dmax = int(np.floor(offs.max() / 4.0))
    kd = dmax - dmin + 1
    D = (np.arange(kd) + dmin)[:, None, None]
    ky = offs[None] - 4 * D                      # (kd, a, dp)
    valid = (ky >= 0) & (ky < k)
    kyc = np.clip(ky, 0, k - 1)

    wy = jnp.take(w, jnp.asarray(kyc.reshape(-1)), axis=0)
    wy = wy.reshape(kd, 4, 2, k, Ci, Co) * jnp.asarray(
        valid.reshape(kd, 4, 2, 1, 1, 1), w.dtype
    )
    wyx = jnp.take(wy, jnp.asarray(kyc.reshape(-1)), axis=3)
    wyx = wyx.reshape(kd, 4, 2, kd, 4, 2, Ci, Co) * jnp.asarray(
        valid.reshape(1, 1, 1, kd, 4, 2, 1, 1), w.dtype
    )
    # (D, a, dp, E, b, ep, i, o) -> (D, E, [dp, ep, o], [a, b, i])
    w2 = wyx.transpose(0, 3, 2, 5, 7, 1, 4, 6).reshape(
        kd, kd, 4 * Co, 16 * Ci
    )

    gp = space_to_depth(g)  # (B, Ho/2, Wo/2, 4Co), layout (dp, ep, o)
    # conv offset D: output block Y reads packed rows Y + D, D in
    # [dmin, dmax] -> asymmetric padding (-dmin, dmax)
    dxp = lax.conv_general_dilated(
        gp, w2.astype(g.dtype), (1, 1),
        ((-dmin, dmax), (-dmin, dmax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, Hin/4, Win/4, 16Ci), layout (a, b, i)
    dxp = dxp.reshape(B, Hin // 4, Win // 4, 4, 4, Ci)
    return dxp.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hin, Win, Ci)


def conv_s2d(x: Array, w: Array, bias: Array | None = None,
             dtype=None) -> Array:
    """Exact stride-1 SAME conv computed in space-to-depth space.

    x: (B, H, W, Ci) with even H, W.  w: (k, k, Ci, Co), k odd.
    Equivalent to lax.conv(x, w, stride 1, symmetric pad (k-1)//2).
    """
    dtype = dtype or x.dtype
    k = w.shape[0]
    kp = k // 2 + 2
    pad = kp // 2
    xs = space_to_depth(x).astype(dtype)
    w2 = s2d_conv_kernel(w).astype(dtype)
    y = lax.conv_general_dilated(
        xs, w2,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        Co = w.shape[-1]
        b4 = jnp.broadcast_to(bias.astype(dtype), (4, Co)).reshape(-1)
        y = y + b4
    return depth_to_space(y)
