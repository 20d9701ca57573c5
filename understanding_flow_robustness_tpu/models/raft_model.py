"""RAFT and variants in flax (TPU-first).

Reference: models/raft/raft.py (233), extractor.py (391), update.py (162),
corr.py (137).  Key TPU redesigns vs. the reference:

* the 12-iteration ConvGRU refinement is deliberately unrolled (see the
  rationale at the loop itself): XLA shares/fuses the iteration bodies,
  and training losses / feature taps need per-iteration flows anyway
  (models/raft/raft.py:187-220);
* the default TPU correlation path never materializes the all-pairs
  volume: a fused Pallas kernel recomputes correlation rows on-demand
  per query tile (ops/pallas/alt_corr.py, the TPU alt_cuda_corr); the
  volume formulation (one big MXU matmul, models/raft/corr.py:98-106,
  plus a selector-matmul lookup in ops.corr_lookup) remains for the
  spatial-corr / feature-tap modes and as the cross-check reference;
* mixed precision (torch autocast, raft.py:10-22) becomes an explicit
  bf16 compute dtype on the conv stacks with f32 correlation/flow math.

Supported variants (models/utils_model.py:49-73): standard RAFT
(fnorm=instance, cnorm=batch), RAFT_FlowNetCEncoder_WoContext (3-conv
FlowNetC encoder, conv_redir context), small RAFT, spatial-corr mode
(CorrBlock(compute_spatial=True), corr.py:33-54).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..ops import (
    all_pairs_correlation,
    alt_corr_features,
    coords_grid,
    corr_lookup,
    corr_lookup_padded,
    corr_pyramid,
    pallas_disabled,
    resize_bilinear,
    spatial_correlation,
)
from .layers import (
    InstanceNorm2d,
    TorchBatchNorm,
    TorchConv,
    TorchGroupNorm,
    leaky_relu,
)

Array = jax.Array


def _norm(norm_fn: str, num_channels: int, train: bool, name: str,
          s2d: bool = False):
    if norm_fn == "group":
        if s2d:
            raise NotImplementedError("group norm has no s2d form here")
        return TorchGroupNorm(num_groups=num_channels // 8, name=name)
    if norm_fn == "batch":
        return TorchBatchNorm(use_running_average=not train, s2d=s2d,
                              name=name)
    if norm_fn == "instance":
        return InstanceNorm2d(s2d=s2d, name=name)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    """models/raft/extractor.py:5-78.

    ``s2d``: run the whole stride-1 block in 2x2 space-to-depth layout
    (input AND output s2d) — the 64-channel half-res layer1 stage was the
    encoders' hottest line in the round-5 train trace (26 ms/step at
    ~38 TF/s: 64 output channels fill half the MXU lanes); the s2d form
    runs the same convs at 256 channels / quarter the spatial positions.
    ``s2d_in``: stride-2 entry block whose INPUT is s2d (conv1 and the
    downsample conv consume it via the packed stride-1 kernel transform,
    ops/s2d.py::s2_conv_s2d_in_kernel); output in normal layout.  Both
    are value-identical kernel rearrangements — params and checkpoints
    untouched."""

    features: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Optional[Any] = None
    train: bool = False
    s2d: bool = False
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        relu = jax.nn.relu
        if self.s2d:
            assert self.stride == 1, "s2d residual blocks are stride-1"
        y = TorchConv(self.features, 3, self.stride, dtype=self.dtype,
                      s2d=self.s2d, s2d_in=self.s2d_in, name="conv1")(x)
        y = relu(_norm(self.norm_fn, self.features, self.train, "norm1",
                       s2d=self.s2d)(y))
        y = TorchConv(self.features, 3, 1, dtype=self.dtype, s2d=self.s2d,
                      name="conv2")(y)
        y = relu(_norm(self.norm_fn, self.features, self.train, "norm2",
                       s2d=self.s2d)(y))
        if self.stride != 1:
            x = TorchConv(self.features, 1, self.stride, dtype=self.dtype,
                          s2d_in=self.s2d_in, name="downsample")(x)
            x = _norm(self.norm_fn, self.features, self.train, "norm3")(x)
        return relu(x + y)


class BottleneckBlock(nn.Module):
    """models/raft/extractor.py:81-140 (small encoder)."""

    features: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Optional[Any] = None
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        relu = jax.nn.relu
        q = self.features // 4
        y = TorchConv(q, 1, 1, dtype=self.dtype, name="conv1")(x)
        y = relu(_norm(self.norm_fn, q, self.train, "norm1")(y))
        y = TorchConv(q, 3, self.stride, dtype=self.dtype, name="conv2")(y)
        y = relu(_norm(self.norm_fn, q, self.train, "norm2")(y))
        y = TorchConv(self.features, 1, 1, dtype=self.dtype, name="conv3")(y)
        y = relu(_norm(self.norm_fn, self.features, self.train, "norm3")(y))
        if self.stride != 1:
            x = TorchConv(self.features, 1, self.stride, dtype=self.dtype,
                          name="downsample")(x)
            x = _norm(self.norm_fn, self.features, self.train, "norm4")(x)
        return relu(x + y)


class BasicEncoder(nn.Module):
    """models/raft/extractor.py:142-215: conv7x7/2 + 3 residual stages
    (64, 96/2, 128/2) + 1x1 out conv.  Output stride 8.

    ``s2d``: run the 64-channel layer1 stage in 2x2 space-to-depth
    layout.  MEASURED OFF (round 5, same-process A/B,
    scripts/enc_s2d_ab.py): layer1 was the encoders' hottest trace line
    (26 ms/step at ~38 TF/s — 64 channels fill half the MXU lanes), but
    for a 3x3 kernel the s2d transform emits a k'=3 kernel over 4x the
    channels on both sides = 4x the contraction FLOPs (unlike SpyNet's
    7x7, where k'=5 costs only ~2x), and the lane-fill gain cannot buy
    that back: train 175.5 vs 164.1 ms, calibrated inference 143.3 vs
    128.4, wild 157.9 vs 141.8.  Default False; the mechanism stays
    value-parity-tested (tests/test_s2d.py) as the record of the
    measurement."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: Optional[Any] = None
    train: bool = False
    s2d: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.s2d import space_to_depth

        use_s2d = bool(self.s2d)  # None = auto = OFF (see class note)
        x = TorchConv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm_fn, 64, self.train, "norm1")(x)
        x = jax.nn.relu(x)
        if use_s2d:
            x = space_to_depth(x)
            for j in range(2):
                x = ResidualBlock(64, self.norm_fn, 1, self.dtype,
                                  self.train, s2d=True,
                                  name=f"layer1_{j}")(x)
            x = ResidualBlock(96, self.norm_fn, 2, self.dtype, self.train,
                              s2d_in=True, name="layer2_0")(x)
            x = ResidualBlock(96, self.norm_fn, 1, self.dtype, self.train,
                              name="layer2_1")(x)
            stages = [(128, 2)]
            base = 3
        else:
            stages = [(64, 1), (96, 2), (128, 2)]
            base = 1
        for i, (dim, stride) in enumerate(stages):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              self.train, name=f"layer{base + i}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              self.train, name=f"layer{base + i}_1")(x)
        return TorchConv(self.output_dim, 1, 1, dtype=self.dtype, name="conv2")(x)


class SmallEncoder(nn.Module):
    """models/raft/extractor.py:218-289."""

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: Optional[Any] = None
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = TorchConv(32, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm_fn, 32, self.train, "norm1")(x)
        x = jax.nn.relu(x)
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(dim, self.norm_fn, stride, self.dtype,
                                self.train, name=f"layer{i + 1}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, self.dtype,
                                self.train, name=f"layer{i + 1}_1")(x)
        return TorchConv(self.output_dim, 1, 1, dtype=self.dtype, name="conv2")(x)


class FlowNetCEncoder(nn.Module):
    """models/raft/extractor.py:292-391: conv7/2-conv5/2-conv5/2 with
    LeakyReLU(0.1) (norm_fn='none' in all factory uses)."""

    output_dim: int = 256
    norm_fn: str = "none"
    dtype: Optional[Any] = None
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, (feat, k) in enumerate(
            [(64, 7), (128, 5), (self.output_dim, 5)]
        ):
            x = TorchConv(feat, k, 2, use_bias=self.norm_fn == "none",
                          dtype=self.dtype, name=f"conv{i + 1}")(x)
            if self.norm_fn != "none":
                x = _norm(self.norm_fn, feat, self.train, f"norm{i + 1}")(x)
            x = leaky_relu(x)
        return x


class FlowHead(nn.Module):
    """models/raft/update.py:6-14."""

    hidden_dim: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = jax.nn.relu(
            TorchConv(self.hidden_dim, 3, 1, dtype=self.dtype, name="conv1")(x)
        )
        return TorchConv(2, 3, 1, dtype=self.dtype, name="conv2")(y)


class ConvGRU(nn.Module):
    """models/raft/update.py:17-32 (small update block)."""

    hidden_dim: int = 96
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h: Array, x) -> Array:
        # x may be a source tuple; the gate convs consume (h,) + x via
        # per-source kernel slices (TorchConv tuple input) so the cat(h, x)
        # buffers never materialize (~47 MB/iteration each at KITTI b8).
        hd = self.hidden_dim
        xs = x if isinstance(x, tuple) else (x,)
        hx = (h,) + xs
        z = jax.nn.sigmoid(TorchConv(hd, 3, 1, dtype=self.dtype, name="convz")(hx))
        r = jax.nn.sigmoid(TorchConv(hd, 3, 1, dtype=self.dtype, name="convr")(hx))
        q = jnp.tanh(
            TorchConv(hd, 3, 1, dtype=self.dtype, name="convq")(
                (r * h,) + xs
            )
        )
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """models/raft/update.py:35-73: 1x5 then 5x1 GRU passes."""

    hidden_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h: Array, x) -> Array:
        hd = self.hidden_dim
        xs = x if isinstance(x, tuple) else (x,)

        def gru(h, ks, suffix):
            # source tuples instead of cat(h, x) — see ConvGRU
            hx = (h,) + xs
            z = jax.nn.sigmoid(
                TorchConv(hd, ks, 1, dtype=self.dtype, name=f"convz{suffix}")(hx)
            )
            r = jax.nn.sigmoid(
                TorchConv(hd, ks, 1, dtype=self.dtype, name=f"convr{suffix}")(hx)
            )
            q = jnp.tanh(
                TorchConv(hd, ks, 1, dtype=self.dtype, name=f"convq{suffix}")(
                    (r * h,) + xs
                )
            )
            return (1 - z) * h + z * q

        h = gru(h, (1, 5), "1")
        h = gru(h, (5, 1), "2")
        return h


class PaddedCorrConv1x1(nn.Module):
    """convc1 over the PADDED fused-corr layout (ops/pallas/alt_corr.py):
    input channel t*(L*16) + l*16 + s holds level l's window sample
    (t, s); positions past the 2r+1 window are live padding samples.  The
    parameter keeps the reference compact shape (1, 1, L*n^2, features) so
    checkpoints load unchanged and is scatter-expanded into a zero matrix
    at trace time; the padding channels multiply zero weights, so the
    output is identical to the compact conv while the relayout cost
    disappears into the MXU."""

    features: int
    cor_planes: int
    num_levels: int
    n: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import numpy as np

        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (1, 1, self.cor_planes, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # reference channel order is s-major: source channel l*n^2 + s*n + t
        # lives at padded position t*(L*16) + l*16 + s
        ll = np.arange(self.num_levels)[:, None, None]
        ss = np.arange(self.n)[None, :, None]
        tt = np.arange(self.n)[None, None, :]
        idx = jnp.asarray(
            (tt * (self.num_levels * 16) + ll * 16 + ss).reshape(-1))
        big = jnp.zeros((x.shape[-1], self.features), jnp.float32)
        big = big.at[idx].set(kernel[0, 0])
        dtype = self.dtype or x.dtype
        y = jnp.einsum(
            "bhwc,cf->bhwf", x.astype(dtype), big.astype(dtype),
            preferred_element_type=dtype,
        )
        return y + bias.astype(dtype)


class BasicMotionEncoder(nn.Module):
    """models/raft/update.py:96-121."""

    cor_planes: int
    no_motion_downsampling: bool = False
    dtype: Optional[Any] = None
    # > 0: corr comes in the padded fused layout with this many levels
    padded_corr_levels: int = 0

    @nn.compact
    def __call__(self, flow: Array, corr: Array):
        relu = jax.nn.relu
        if self.padded_corr_levels and isinstance(corr, tuple):
            # Deferred-sort corr (ops.alt_corr_features_sorted): corr is
            # ((B, N, Cp) in flow-y-sorted query order, (B, N) inverse
            # permutation).  convc1 is per-query, so it runs directly on
            # the sorted layout and the inverse permutation rides its
            # 256-channel output — 4x less gather traffic than unsorting
            # the corr tensor itself (PERF.md "sorted-tile slab rescue").
            corr_s, order, inv = corr
            B, H, W, _ = flow.shape
            n = int(round((self.cor_planes / self.padded_corr_levels) ** 0.5))
            from ..ops.correlation import permute_rows

            cor = relu(PaddedCorrConv1x1(
                256, self.cor_planes, self.padded_corr_levels, n,
                dtype=self.dtype, name="convc1")(corr_s[:, :, None, :]))
            # scatter-free unsort: backward is a gather by `order`, not
            # AD's scatter (permute_rows docstring)
            cor = permute_rows(cor[:, :, 0], inv, order)
            cor = cor.reshape(B, H, W, 256)
        elif self.padded_corr_levels:
            n = int(round((self.cor_planes / self.padded_corr_levels) ** 0.5))
            cor = relu(PaddedCorrConv1x1(
                256, self.cor_planes, self.padded_corr_levels, n,
                dtype=self.dtype, name="convc1")(corr))
        else:
            cor = relu(TorchConv(256, 1, 1, dtype=self.dtype,
                                 name="convc1")(corr))
        cor1 = cor
        if not self.no_motion_downsampling:
            cor = relu(TorchConv(192, 3, 1, dtype=self.dtype, name="convc2")(cor))
        flo = relu(TorchConv(128, 7, 1, dtype=self.dtype, name="convf1")(flow))
        flo = relu(TorchConv(64, 3, 1, dtype=self.dtype, name="convf2")(flo))
        # compute path uses source tuples (no concat buffers); the concats
        # below only exist for the feature taps and are DCE'd in test mode
        out = relu(TorchConv(126, 3, 1, dtype=self.dtype, name="conv")((cor, flo)))
        cor_flo = jnp.concatenate([cor, flo], axis=-1)
        return (out, flow), cor1, cor, cor_flo


class SmallMotionEncoder(nn.Module):
    """models/raft/update.py:76-93."""

    cor_planes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, flow: Array, corr: Array):
        relu = jax.nn.relu
        cor = relu(TorchConv(96, 1, 1, dtype=self.dtype, name="convc1")(corr))
        flo = relu(TorchConv(64, 7, 1, dtype=self.dtype, name="convf1")(flow))
        flo = relu(TorchConv(32, 3, 1, dtype=self.dtype, name="convf2")(flo))
        out = relu(TorchConv(80, 3, 1, dtype=self.dtype, name="conv")((cor, flo)))
        return (out, flow)


class BasicUpdateBlock(nn.Module):
    """models/raft/update.py:139-162: motion encoder + SepConvGRU +
    FlowHead + 64*9 convex-upsample mask head (x0.25)."""

    cor_planes: int
    hidden_dim: int = 128
    no_motion_downsampling: bool = False
    dtype: Optional[Any] = None
    padded_corr_levels: int = 0
    # emit the mask in the packed-upsample layout (PackedMaskConv1x1,
    # 0.25 folded) for the TPU train path; params/checkpoints unchanged
    packed_mask: bool = False

    @nn.compact
    def __call__(self, net: Array, inp: Array, corr: Array, flow: Array):
        mf_srcs, cor1, cor, cor_flo = BasicMotionEncoder(
            self.cor_planes, self.no_motion_downsampling, self.dtype,
            self.padded_corr_levels,
            name="encoder",
        )(flow, corr)
        # x as a source tuple (same channel order as cat(inp, out, flow))
        x = (inp,) + mf_srcs
        net = SepConvGRU(self.hidden_dim, self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(256, self.dtype, name="flow_head")(net)
        m = jax.nn.relu(TorchConv(256, 3, 1, dtype=self.dtype, name="mask_0")(net))
        if self.packed_mask:
            mask = PackedMaskConv1x1(64 * 9, dtype=self.dtype,
                                     name="mask_2")(m)
        else:
            mask = 0.25 * TorchConv(64 * 9, 1, 1, dtype=self.dtype,
                                    name="mask_2")(m)
        # the tap concat below is DCE'd unless return_features consumes it
        motion_features = jnp.concatenate(mf_srcs, axis=-1)
        return net, mask, delta_flow, (motion_features, cor1, cor, cor_flo)


class SmallUpdateBlock(nn.Module):
    """models/raft/update.py:124-136."""

    cor_planes: int
    hidden_dim: int = 96
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, net: Array, inp: Array, corr: Array, flow: Array):
        mf_srcs = SmallMotionEncoder(
            self.cor_planes, self.dtype, name="encoder"
        )(flow, corr)
        x = (inp,) + mf_srcs
        net = ConvGRU(self.hidden_dim, self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(128, self.dtype, name="flow_head")(net)
        # tap concat DCE'd unless return_features consumes it
        motion_features = jnp.concatenate(mf_srcs, axis=-1)
        return net, None, delta_flow, (motion_features,) * 4


def _packed_uv_order() -> "tuple":
    """Channel orders for the packed-upsample layout.

    Packed channel j (0..127) carries output sub-pixel (u, v) and flow
    component c with BIT-INTERLEAVED position bits and c minor:
    ``j = u2 v2 u1 v1 u0 v0 c`` — chosen so three standard 2x2
    depth_to_space rounds reconstruct the full-res image (each round
    consumes the current top (dy, dx) bit pair), and c lanes are adjacent
    so per-c taps tile as a 64x repeat of (t0, t1).

    Returns (uv64, perm_c2): ``uv64[m]`` = plain sub-pixel index
    ``u * 8 + v`` for packed pair index m = j >> 1, and ``perm_c2[j]`` =
    plain channel ``(u * 8 + v) * 2 + c`` for packed channel j.
    """
    import numpy as np

    uv64 = np.empty(64, np.int64)
    for m in range(64):
        b = [(m >> k) & 1 for k in range(5, -1, -1)]  # u2 v2 u1 v1 u0 v0
        u = (b[0] << 2) | (b[2] << 1) | b[4]
        v = (b[1] << 2) | (b[3] << 1) | b[5]
        uv64[m] = u * 8 + v
    perm_c2 = np.empty(128, np.int64)
    perm_c2[0::2] = uv64 * 2
    perm_c2[1::2] = uv64 * 2 + 1
    return uv64, perm_c2


class PackedMaskConv1x1(nn.Module):
    """mask_2 emitting the packed-upsample mask layout (TPU train path).

    The reference mask head (models/raft/update.py:139-162) emits 576
    channels ordered ``k * 64 + (u * 8 + v)`` and the convex upsample then
    softmaxes over k on a (B, H, W, 9, 8, 8) view — minor dim 8 of 128
    lanes, and the 6-D transpose/reshape to full-res costs ~66 ms/step in
    the RAFT train backward (see PERF.md round-3 decomposition).  This
    variant emits 9 blocks of 128 lanes, block k holding the SAME stored
    column at packed channels (u, v, c=0) and (u, v, c=1) in the
    bit-interleaved `_packed_uv_order` layout, with the reference's 0.25
    mask scale folded into the kernel (exact: power of two).  Every
    downstream op (softmax over k, tap FMA, loss) becomes a full-width
    128-lane VPU op.  Stored params keep the reference shape
    (1, 1, Cin, 576)/(576,) so checkpoints load unchanged."""

    features: int = 64 * 9
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import numpy as np

        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        uv64, _ = _packed_uv_order()
        # packed output channel k*128 + j -> stored channel k*64 + uv64[j>>1]
        idx = (np.arange(9)[:, None] * 64 +
               np.asarray(uv64)[None, :]).repeat(2, axis=1).reshape(-1)
        idx = jnp.asarray(idx)
        dtype = self.dtype or x.dtype
        big = (0.25 * kernel[0, 0]).astype(dtype)[:, idx]
        y = jnp.einsum(
            "bhwc,cf->bhwf", x.astype(dtype), big,
            preferred_element_type=dtype,
        )
        return y + (0.25 * bias).astype(dtype)[idx]


def _packed_softmax_taps(flow: Array, mask_p: Array):
    """(softmax weights s_k list, shifted taps list) for the packed convex
    upsample; shared by the forward and the custom backward."""
    B, H, W, _ = flow.shape
    ms = [mask_p[..., 128 * k:128 * (k + 1)] for k in range(9)]
    mx = ms[0]
    for m in ms[1:]:
        mx = jnp.maximum(mx, m)
    es = [jnp.exp(m - mx) for m in ms]
    denom = sum(es)
    s = [e / denom for e in es]
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [fp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]   # (B, H, W, 2) each
    return s, taps


@jax.custom_vjp
def upsample_flow_packed(flow: Array, mask_p: Array) -> Array:
    """Convex 8x upsampling in the packed layout — value-equal to
    ``upsample_flow_convex`` with packed[b, h, w, j] ==
    convex[b, 8h+u, 8w+v, c] for j per `_packed_uv_order` (modulo ~1 ulp
    softmax reassociation).  mask_p: (B, H, W, 9*128) from
    PackedMaskConv1x1 (0.25 scale already folded).  No full-res tensor,
    no 6-D transpose: nine 128-lane slices, a softmax over k, and nine
    broadcast FMAs (the channel-tile is a reshape-broadcast, never
    materialized).

    custom_vjp (round 5): AD of the streaming formulation emitted
    ~10 ms/step of add_any/mul/tile passes in the train backward (device
    trace) — the hand derivative is the standard weighted-softmax
    backward, dm_k = s_k (u_k - sum_j s_j u_j) with u_k = tap_k * g, and
    the tap cotangents ride pad+slice (no scatter)."""
    B, H, W, _ = flow.shape
    s, taps = _packed_softmax_taps(flow, mask_p)
    out5 = None
    for sk, tap in zip(s, taps):
        t = sk.reshape(B, H, W, 64, 2) * tap[:, :, :, None, :]
        out5 = t if out5 is None else out5 + t
    return out5.reshape(B, H, W, 128)


def _upsample_packed_fwd(flow, mask_p):
    return upsample_flow_packed(flow, mask_p), (flow, mask_p)


def _upsample_packed_bwd(res, g):
    flow, mask_p = res
    B, H, W, _ = flow.shape
    s, taps = _packed_softmax_taps(flow, mask_p)
    g5 = g.reshape(B, H, W, 64, 2)

    # weighted-softmax backward, exact per mask LANE: the loss saw each
    # of the 128 lanes separately, so dm_k,c = s_k,c (u_k,c - sum_j
    # s_j,c u_j,c) with u_k,c = tap_k,[c-component] * g_c
    dmask = []
    ul = [tap[:, :, :, None, :] * g5 for tap in taps]  # (B,H,W,64,2)
    dotl = None
    for sk, u in zip(s, ul):
        d = sk.reshape(B, H, W, 64, 2) * u
        dotl = d if dotl is None else dotl + d
    for sk, u in zip(s, ul):
        dm = sk.reshape(B, H, W, 64, 2) * (u - dotl)
        dmask.append(dm.reshape(B, H, W, 128))
    dmask_full = jnp.concatenate(dmask, axis=-1)

    # tap cotangent: d_tap_k = sum over the 64 pair slots of s_k * g
    dfp = jnp.zeros((B, H + 2, W + 2, 2), g5.dtype)
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        dtap = jnp.sum(s[k].reshape(B, H, W, 64, 2) * g5, axis=3)
        dfp = dfp + jnp.pad(
            dtap, ((0, 0), (dy, 2 - dy), (dx, 2 - dx), (0, 0)))
    dflow = 8.0 * dfp[:, 1:H + 1, 1:W + 1, :]
    return dflow.astype(flow.dtype), dmask_full.astype(mask_p.dtype)


upsample_flow_packed.defvjp(_upsample_packed_fwd, _upsample_packed_bwd)


def _upsample_packed_remat(flow: Array, mask_p: Array) -> Array:
    """Historical name (round-5 interim shipped jax.checkpoint here for
    +1.4 ms/step): upsample_flow_packed now carries a custom_vjp whose
    residuals are just (flow, mask_p), which subsumes the remat — the
    backward recomputes the softmax from the inputs AND replaces AD's
    ~10 ms/step of add_any/mul/tile passes with the closed-form
    weighted-softmax derivative.  Calls through the module global so the
    decomposition scripts' monkeypatches still take."""
    return upsample_flow_packed(flow, mask_p)


def pack_fullres(x: Array) -> Array:
    """(B, 8h, 8w, C) -> (B, h, w, 64*C) in the packed-upsample channel
    order (`_packed_uv_order`), C minor.  Used once per train step to
    bring the ground truth / masks into the packed space so the sequence
    loss never touches full-res tensors."""
    import numpy as np

    B, H8, W8, C = x.shape
    h, w = H8 // 8, W8 // 8
    x = x.reshape(B, h, 8, w, 8, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, h, w, 64 * C)   # channel (u*8+v)*C + c
    uv64, _ = _packed_uv_order()
    perm = (np.asarray(uv64)[:, None] * C +
            np.arange(C)[None, :]).reshape(-1)
    return x[..., jnp.asarray(perm)]


def upsample_flow_convex(flow: Array, mask: Array) -> Array:
    """Convex-combination 8x upsampling (models/raft/raft.py:111-122).

    flow: (B, H, W, 2); mask: (B, H, W, 64*9).  torch uses
    F.unfold(8*flow, [3,3], padding=1) then a softmax-weighted sum over the
    9 taps per 8x8 output sub-block; here the unfold is 9 static shifts.
    """
    B, H, W, _ = flow.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # unfold(k=3) tap order: (dy, dx) row-major, matching torch.
    taps = jnp.stack(
        [fp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, taps)
    # (B, H, W, 8, 8, 2) -> (B, 8H, 8W, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)
    return up


def upflow8(flow: Array) -> Array:
    """models/raft/utils/utils.py:85-87: 8 * bilinear(align_corners=True)."""
    B, H, W, _ = flow.shape
    return 8.0 * resize_bilinear(flow, 8 * H, 8 * W, align_corners=True)


def scale_flow_head(variables, scale: float):
    """Variables with the update block's FlowHead output conv scaled.

    Random-init RAFT iterates average ~150 px after 12 GRU iterations —
    far wilder than trained checkpoints (5-40 px mean flow on KITTI/
    Sintel, the magnitudes the reference's eval tables operate at).
    FlowHead's conv2 is linear (no activation after it,
    raft_model.py::FlowHead), so scaling its kernel+bias shrinks every
    delta-flow by ``scale``, putting the recurrent iterates at
    checkpoint-like magnitudes for drift / slab-path measurements when no
    zoo checkpoint is reachable (zero-egress environment).  Tree
    structure, names and shapes are unchanged; the input tree is not
    mutated (containers are rebuilt along the edited path)."""

    def _set(d, path):
        d = dict(d)
        if len(path) == 1:
            leaf = dict(d[path[0]])
            leaf["kernel"] = leaf["kernel"] * scale
            leaf["bias"] = leaf["bias"] * scale
            d[path[0]] = leaf
        else:
            d[path[0]] = _set(d[path[0]], path[1:])
        return d

    return _set(variables, ("params", "update_block", "flow_head", "conv2"))


class RAFT(nn.Module):
    """models/raft/raft.py:25-233.

    Call with images in [0, 255] (B, H, W, 3), H and W multiples of 8.
    test_mode (eval): returns (flow_lowres, flow_up).  train: returns the
    per-iteration list of upsampled flows.
    """

    small: bool = False
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    fnorm: str = "instance"
    cnorm: str = "batch"
    no_separate_context: bool = False
    flownetc_encoder: bool = False
    compute_spatial: bool = False
    mixed_precision: bool = False
    return_features: bool = False
    batch_pad_encoders: bool = False
    # "auto" | "alt" | "volume": "alt" fuses the corr lookup straight from
    # the feature maps (ops.alt_corr_features — the TPU alt_cuda_corr,
    # models/raft/corr.py:109-137) and never materializes the all-pairs
    # volume; "volume" precomputes volume + pyramid (CorrBlock,
    # corr.py:26-106).  "auto" picks alt on TPU except when feature taps
    # need the explicit pyramid.  Both are value-equal.
    corr_impl: str = "auto"
    # Deferred-sort corr lookup (ops.alt_corr_features_sorted): queries
    # permuted into flow-y order so the flow-following slab kernel fires
    # for ANY flow field, with the unsort riding the motion encoder's
    # 4x-smaller convc1 output.  MEASURED OFF in production (round 5,
    # same-process A/B at both geometries, scripts/sorted_corr_ab.py):
    # even with scatter-free permutation plumbing (permute_rows,
    # argsort-built inverse, VJP-stashed order) the mode loses e2e —
    # train 168.4 vs 165.6 ms, wild inference 143.5 vs 141.1, calibrated
    # 143.3 vs ~128 — the three (B, N, 256)-class permutation gathers
    # per iteration at XLA's ~145 GB/s gather rate cost more than the
    # slab kernel saves.  "off" (default): never.  "defer": always on
    # (kept correctness-tested for a future backend with line-rate
    # gathers).  "auto": currently = off.
    corr_sort: str = "auto"
    # rematerialize the per-iteration update block in the backward pass
    # (see the instantiation note); measured on/off in round 5
    remat_update: bool = False
    # BasicEncoder space-to-depth layer1 stage (None = auto: on-TPU)
    encoder_s2d: Optional[bool] = None
    dtype: Optional[Any] = None

    @property
    def hidden_dim(self):
        return 96 if self.small else 128

    @property
    def context_dim(self):
        return 64 if self.small else 128

    @property
    def radius(self):
        return 3 if self.small else self.corr_radius

    @nn.compact
    def __call__(
        self,
        image1: Array,
        image2: Array,
        flow_init: Optional[Array] = None,
        train: bool = False,
        test_mode: bool = True,
        packed_train: bool = False,
    ):
        """``packed_train`` (train path only): return per-iteration flow
        predictions in the packed 1/8-res layout (B, H/8, W/8, 128) —
        ``upsample_flow_packed`` — instead of full-res (B, H, W, 2);
        consumed by ``training.losses.sequence_loss(packed=True)``, which
        packs the GT once.  Value-equal training (same loss/grads modulo
        float reassociation) at a fraction of the HBM traffic: the convex
        upsample's 6-D transposes and every full-res loss tensor
        disappear from the step.  Requires the standard (non-small)
        update block and no feature taps."""
        if packed_train and (self.small or test_mode
                             or self.return_features):
            raise ValueError(
                "packed_train requires the standard update block, "
                "test_mode=False, and return_features=False"
            )
        hdim, cdim = self.hidden_dim, self.context_dim
        compute_dtype = (
            self.dtype if self.dtype is not None
            else (jnp.bfloat16 if self.mixed_precision else None)
        )

        x1 = 2.0 * (image1 / 255.0) - 1.0
        x2 = 2.0 * (image2 / 255.0) - 1.0

        # XLA picks a pathologically slow convolution strategy for the
        # encoders at batch sizes 2-4 on v5e (measured 9.4 ms/img at B=4
        # vs 1.5 ms/img at B=8 forward; the round-3 train-step trace shows
        # the same pathology in the cnet backward plus ~15k relayout
        # copies), so padding the batch to >= 8 by tiling and slicing the
        # result is ~3x faster in wall clock.  Value-identical: instance
        # norm is per-sample, and batch norm over EXACTLY duplicated
        # samples has identical mean/variance (the unbiased running-var
        # factor n/(n-1) shifts by ~2e-6 relative at these sizes — the
        # one documented deviation).
        def batched(encoder, x, min_batch=8):
            b = x.shape[0]
            if b >= min_batch or not self.batch_pad_encoders:
                return encoder(x)
            reps = -(-min_batch // b)
            out = encoder(jnp.tile(x, (reps, 1, 1, 1)))
            return out[:b]

        # feature network (batched siamese, raft.py:141)
        if self.flownetc_encoder:
            fnet = FlowNetCEncoder(256, "none", compute_dtype, train, name="fnet")
        elif self.small:
            fnet = SmallEncoder(128, "instance", compute_dtype, train, name="fnet")
        else:
            fnet = BasicEncoder(256, self.fnorm, compute_dtype, train,
                                s2d=self.encoder_s2d, name="fnet")
        fmaps = batched(fnet, jnp.concatenate([x1, x2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        fmap1 = fmap1.astype(jnp.float32)
        fmap2 = fmap2.astype(jnp.float32)

        feats = {"fmap1": fmap1, "fmap2": fmap2}

        # Fused lookup path: skip the all-pairs volume entirely and
        # recompute correlation rows inside the lookup kernel
        # (ops.alt_corr_features).  Feature taps need the explicit pyramid,
        # so return_features falls back to the volume path.
        use_alt = (
            not self.compute_spatial
            and not self.return_features
            and not pallas_disabled()
            and (self.corr_impl == "alt"
                 or (self.corr_impl == "auto"
                     and jax.default_backend() == "tpu"))
        )

        # correlation volume + pyramid
        if use_alt:
            pyramid = None
        elif self.compute_spatial:
            # CorrBlock(compute_spatial=True) (corr.py:33-54): 21x21/dil-2
            # spatial corr, channels become the batch of pyramid "images".
            # the pyramid uses the RAW (unnormalized) spatial correlation;
            # only the visualization copy divides by C (corr.py:42-50)
            sc = spatial_correlation(
                fmap1, fmap2, patch_size=21, dilation_patch=2
            )
            B, h, w, P = sc.shape
            corr0 = sc.transpose(0, 3, 1, 2)  # (B, 441, h, w)
            pyramid = corr_pyramid(corr0, self.corr_levels)
            feats["spatial_corr"] = sc / fmap1.shape[-1]
        else:
            corr0 = all_pairs_correlation(fmap1, fmap2)
            if compute_dtype is not None:
                # cast ONCE before the pyramid: the lookup runs 12x per
                # forward and is HBM-bound on the volume; a per-iteration
                # cast would re-materialize it every iteration
                corr0 = corr0.astype(compute_dtype)
            pyramid = corr_pyramid(corr0, self.corr_levels)
        if pyramid is not None:
            for i, lvl in enumerate(pyramid):
                feats[f"corr_pyramid_{i}"] = lvl

        # context network (raft.py:167-175)
        if self.no_separate_context:
            cnet = TorchConv(hdim + cdim, 1, 1, dtype=compute_dtype,
                             name="conv_redir")(fmap1)
        elif self.flownetc_encoder:
            cnet = batched(
                FlowNetCEncoder(hdim + cdim, "none", compute_dtype, train,
                                name="cnet"), x1)
        elif self.small:
            cnet = batched(
                SmallEncoder(hdim + cdim, "none", compute_dtype, train,
                             name="cnet"), x1)
        else:
            cnet = batched(
                BasicEncoder(hdim + cdim, self.cnorm, compute_dtype, train,
                             s2d=self.encoder_s2d, name="cnet"), x1)
        net, inp = jnp.split(cnet.astype(jnp.float32), [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = jax.nn.relu(inp)
        feats["net"] = net
        feats["inp"] = inp

        B, H8, W8, _ = fmap1.shape
        coords0 = jnp.broadcast_to(
            coords_grid(H8, W8)[None], (B, H8, W8, 2)
        )
        coords1 = coords0
        if flow_init is not None:
            coords1 = coords1 + flow_init

        # The padded fused layout (16x16 window blocks, junk channels
        # zero-weighted) feeds PaddedCorrConv1x1 directly; the small model
        # keeps the compact layout (its motion encoder is not padded-aware).
        use_alt_padded = use_alt and not self.small
        # Volume path on TPU (feature taps / corr_impl="volume"): the
        # fused Pallas kernel with the same padded consumption — its
        # compact-layout form lost its per-level win to the [t,s]->[s,t]
        # relayout (PERF.md design history #2); emitting the lane-stacked
        # padded layout removes that relayout.
        use_vol_padded = (
            not use_alt
            and not self.compute_spatial
            and not self.small
            # feature taps expose the raw lookup as idx_corr_vol_{i}: the
            # padded lane-stacked layout (B,H,W,L*256 with live junk hat
            # channels) would silently replace the documented compact
            # (B,H,W,L*(2r+1)^2) tap, so taps take the compact lookup
            and not self.return_features
            and not pallas_disabled()
            and jax.default_backend() == "tpu"
        )
        # "auto" resolves to OFF: the deferred-sort mode measured slower
        # e2e at every operating point (see the corr_sort attribute note)
        use_alt_sorted = (
            use_alt and use_alt_padded and self.corr_sort == "defer"
        )
        if use_alt_sorted:
            from ..ops import alt_corr_features_sorted

            # ((B, N, Cp) sorted, inv) consumed by the motion encoder's
            # sorted-corr branch; the coordinate cotangent is dead (see
            # the coords_grad note below), and alt_corr_features_sorted
            # never computes it by construction
            def lookup(pyr, c):
                s, order, inv = alt_corr_features_sorted(
                    fmap1, fmap2, c, self.corr_levels, self.radius,
                    compute_dtype=compute_dtype,
                )
                return (s, order, inv)
        elif use_alt:
            # coords_grad=False: coords1 is stop-gradiented every
            # iteration (the reference detaches too, raft.py:188), so the
            # coordinate cotangent is dead — skipping it saves two
            # derivative-selector kernel passes per iteration in the
            # training/attack backward
            lookup = lambda pyr, c: alt_corr_features(
                fmap1, fmap2, c, self.corr_levels, self.radius,
                compute_dtype=compute_dtype, padded=use_alt_padded,
                coords_grad=False,
            )
        elif self.compute_spatial:
            lookup = _spatial_corr_lookup
        elif use_vol_padded:
            lookup = lambda pyr, c: corr_lookup_padded(
                tuple(pyr), c, self.radius, compute_dtype
            )
        else:
            # bf16 lookup traffic under mixed precision: the window lookup
            # is HBM-bound on the (N, H/8, W/8) volume, accumulation f32
            lookup = lambda pyr, c: corr_lookup(
                pyr, c, self.radius, compute_dtype=compute_dtype
            )

        cor_planes = (
            self.corr_levels * (21 ** 2) if self.compute_spatial
            else self.corr_levels * (2 * self.radius + 1) ** 2
        )
        if self.small:
            update_block = SmallUpdateBlock(
                cor_planes, hdim, compute_dtype, name="update_block"
            )
        else:
            # remat_update: rematerialize each iteration's update block in
            # the backward instead of storing its internals (GRU gates,
            # motion-encoder activations) across the 12-iteration unroll —
            # the classic unrolled-RNN HBM/FLOPs trade (jax.checkpoint via
            # flax's lifted nn.remat; params/checkpoints unchanged).
            block_cls = (nn.remat(BasicUpdateBlock) if self.remat_update
                         else BasicUpdateBlock)
            update_block = block_cls(
                cor_planes, hdim, dtype=compute_dtype,
                padded_corr_levels=(
                    self.corr_levels
                    if (use_alt_padded or use_vol_padded) else 0
                ),
                packed_mask=packed_train,
                name="update_block",
            )

        def step(carry, _):
            net, coords1 = carry
            coords1 = lax.stop_gradient(coords1)
            corr = lookup(pyramid, coords1)
            flow = coords1 - coords0
            net, up_mask, delta_flow, extras = update_block(
                net, inp, corr, flow
            )
            coords1 = coords1 + delta_flow.astype(jnp.float32)
            if packed_train:
                flow_up = _upsample_packed_remat(coords1 - coords0, up_mask)
            elif up_mask is None:
                flow_up = upflow8(coords1 - coords0)
            else:
                flow_up = upsample_flow_convex(coords1 - coords0, up_mask)
            return (net, coords1), (flow_up, corr, extras)

        # Unrolled refinement loop.  A lax.scan would give faster compiles,
        # but flax submodule calls inside a raw scan body don't resolve
        # params; the unrolled graph lets XLA share/fuse the iteration
        # bodies and is required anyway for training (per-iteration flows)
        # and feature taps.
        carry = (net, coords1)
        flow_predictions = []
        for it in range(self.iters):
            carry, (flow_up, corr, extras) = step(carry, None)
            flow_predictions.append(flow_up)
            if self.return_features:
                motion_features, cor1, cor, cor_flo = extras
                feats[f"idx_corr_vol_{it}"] = corr
                feats[f"net_{it}"] = carry[0]
                feats[f"motion_features_{it}"] = motion_features
                feats[f"cor1_{it}"] = cor1
                feats[f"cor_{it}"] = cor
                feats[f"cor_flo_{it}"] = cor_flo
                feats[f"flow_pred_{it}"] = flow_up
        net, coords1 = carry
        flow_up = flow_predictions[-1]

        if not test_mode:
            return flow_predictions
        flow_low = coords1 - coords0
        if self.return_features:
            return flow_low, flow_up, feats
        return flow_low, flow_up


def _spatial_corr_lookup(pyramid: list[Array], coords: Array) -> Array:
    """Spatial-corr mode lookup (corr.py:85-94): no sampling, each level is
    nearest-upsampled back to full lookup resolution and then C-order
    RESHAPED (not transposed) to (B, H1, W1, -1) — the reference's
    ``corr.view(batch, h1, w1, -1)`` on a (B*441, 1, h, w) tensor
    reinterprets memory, interleaving window channels with spatial
    positions; models trained in this mode expect exactly that layout."""
    B, N, h0, w0 = pyramid[0].shape
    H1, W1 = coords.shape[1], coords.shape[2]
    out = []
    for i, corr in enumerate(pyramid):
        x = corr  # (B, 441, h, w)
        for _ in range(i):
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        out.append(x.reshape(B, H1, W1, -1))
    return jnp.concatenate(out, axis=-1)
