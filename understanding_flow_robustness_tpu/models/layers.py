"""torch-parity neural-net primitives on flax.linen (NHWC).

The reference models were trained in PyTorch; to load their checkpoints and
match outputs within EPE tolerance, the layer semantics here reproduce
``nn.Conv2d`` / ``nn.ConvTranspose2d`` / norm layers exactly:

* ``TorchConv``          — Conv2d with symmetric (k-1)//2-style padding.
* ``TorchConvTranspose`` — ConvTranspose2d(k, s, p) via an input-dilated
  conv with a spatially flipped kernel; kernel stored as (kh, kw, I, O)
  (= torch's (I, O, kh, kw) transposed), so converted checkpoints load
  without re-flipping.
* ``InstanceNorm2d``     — affine-free, eps 1e-5 (torch default).
* ``TorchGroupNorm`` / ``TorchBatchNorm`` — affine, eps 1e-5.

Compute dtype is configurable (bf16 on TPU for speed); parameters stay f32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Array = jax.Array
Dtype = Any


def leaky_relu(x: Array, negative_slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * negative_slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_fast_dgrad(x: Array, w: Array, stride, padding) -> Array:
    """Stride-s conv whose input-gradient is a col2im matmul.

    XLA's dgrad of a strided conv with a tiny input-channel count emits a
    transposed conv whose output channels (= Ci) occupy 3 of 128 MXU
    lanes: FlowNetC's conv1 (7x7 s2, 3->64) costs 0.65 ms forward but
    6.7 ms backward at the attack geometry (measured, b2 384x1280) — the
    patch-attack bottleneck (patch_attacks/main.py:546-611 is fwd+bwd per
    iteration).  Here the backward is (B*Ho*Wo, Co) @ (Co, k*k*Ci)
    (k*k*Ci = 147 lanes for conv1 — dense) followed by a strided
    overlap-add of the k*k patch planes.  Mathematically identical to the
    AD backward (same sums, different association).
    """
    (sh, sw), (ph, pw) = stride, padding
    return lax.conv_general_dilated(
        x, w, (sh, sw), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_fd_fwd(x, w, stride, padding):
    return conv2d_fast_dgrad(x, w, stride, padding), (x, w)


def _conv_fd_bwd(stride, padding, res, g):
    from ..ops.s2d import dgrad_conv_s2d

    x, w = res
    (sh, sw), (ph, pw) = stride, padding
    B, Hin, Win, Ci = x.shape
    Ho, Wo = g.shape[1:3]

    if (
        (sh, sw) == (2, 2)
        and ph == pw
        and Hin % 4 == 0 and Win % 4 == 0
        and Ho % 2 == 0 and Wo % 2 == 0
    ):
        dx = dgrad_conv_s2d(g, w.astype(g.dtype), ph, x.shape)
    else:
        # geometry the packed formulation doesn't cover: AD's dgrad
        _, xvjp = jax.vjp(
            lambda xx: lax.conv_general_dilated(
                xx, w.astype(g.dtype), (sh, sw), ((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            x,
        )
        (dx,) = xvjp(g)

    # weight gradient via AD of the conv w.r.t. w only (XLA's wgrad conv
    # is fine; it is DCE'd when the caller never uses parameter grads)
    _, wvjp = jax.vjp(
        lambda ww: lax.conv_general_dilated(
            x, ww, (sh, sw), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        w,
    )
    (dw,) = wvjp(g)
    return dx, dw


conv2d_fast_dgrad.defvjp(_conv_fd_fwd, _conv_fd_bwd)


class TorchConv(nn.Module):
    """nn.Conv2d parity: explicit symmetric padding, HWIO kernel."""

    features: int
    kernel_size: int | tuple[int, int]
    stride: int | tuple[int, int] = 1
    padding: Optional[int | tuple[int, int]] = None  # default (k-1)//2 * dil
    dilation: int | tuple[int, int] = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # Compute the conv in 2x2 space-to-depth space (ops/s2d.py): exact,
    # same params, 4x the MXU lane occupancy — the fast path for stride-1
    # small-channel convs (SpyNet's full-res 7x7 G-units).  Input expects
    # the s2d layout; the caller brackets the stack with
    # space_to_depth/depth_to_space.
    s2d: bool = False
    # With s2d: the input is a concatenation of per-source s2d tensors with
    # these channel counts (e.g. (64, 16, 2)) instead of the canonical s2d
    # layout of their concatenation; the kernel's input channels are
    # permuted at trace time to consume it directly (ops/s2d.py::
    # s2d_concat_perm), so the activations never relayout.
    s2d_concat: Optional[Sequence[int]] = None
    # Stride-2 conv whose *input* is in s2d layout (output in normal
    # layout at input-block resolution): the packed stride-1 form of
    # ops/s2d.py::s2_conv_s2d_in_kernel.
    s2d_in: bool = False
    # col2im-matmul input gradient (conv2d_fast_dgrad): None = auto (TPU,
    # strided, tiny input-channel count — the attack-backward bottleneck).
    fast_dgrad: Optional[bool] = None

    @nn.compact
    def __call__(self, x) -> Array:
        # A tuple/list input means "conv of the channel-concat of these
        # sources" computed WITHOUT materializing the concat:
        # conv(cat(a, b), W) == conv(a, Wa) + conv(b, Wb) with Wa/Wb input-
        # channel slices of W — the concat buffers of the FlowNet decoders
        # are hundreds of MB at batch 8 full-res, and XLA does not fuse a
        # concatenate into a convolution operand (measured ~3 ms/concat in
        # FlowNetFusion).  Parameter shape/name unchanged.
        sources = None
        if isinstance(x, (tuple, list)):
            sources = tuple(x)
            x = sources[0]
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        dh, dw = _pair(self.dilation)
        if self.padding is None:
            ph, pw = ((kh - 1) // 2) * dh, ((kw - 1) // 2) * dw
        else:
            ph, pw = _pair(self.padding)
        packed_in = self.s2d or self.s2d_in
        if sources is not None:
            tot = sum(s.shape[-1] for s in sources)
            in_ch = tot // 4 if packed_in else tot
        else:
            in_ch = x.shape[-1] // 4 if packed_in else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype

        if self.s2d:
            from ..ops.s2d import s2d_conv_kernel, s2d_concat_perm

            assert (sh, sw) == (1, 1) and (dh, dw) == (1, 1)
            assert (ph, pw) == ((kh - 1) // 2, (kw - 1) // 2)
            pad = (kh // 2 + 2) // 2

            def run(xk, wk):
                k2 = s2d_conv_kernel(wk).astype(dtype)
                if sources is None and self.s2d_concat is not None:
                    assert sum(self.s2d_concat) == in_ch
                    k2 = k2[:, :, jnp.asarray(
                        s2d_concat_perm(self.s2d_concat)), :]
                return lax.conv_general_dilated(
                    xk.astype(dtype), k2,
                    window_strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        elif self.s2d_in:
            from ..ops.s2d import s2_conv_s2d_in_kernel

            assert (sh, sw) == (2, 2) and (dh, dw) == (1, 1) and ph == pw

            def run(xk, wk):
                k2, (plo, phi) = s2_conv_s2d_in_kernel(wk, ph)
                return lax.conv_general_dilated(
                    xk.astype(dtype), k2.astype(dtype),
                    window_strides=(1, 1),
                    padding=((plo, phi), (plo, phi)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:
            fast = self.fast_dgrad
            if fast is None:
                fast = (
                    in_ch <= 8
                    and (sh, sw) != (1, 1)
                    and jax.default_backend() == "tpu"
                )
            fast = fast and (dh, dw) == (1, 1)  # dilation unsupported

            def run(xk, wk):
                if fast:
                    return conv2d_fast_dgrad(
                        xk.astype(dtype), wk.astype(dtype), (sh, sw),
                        (ph, pw),
                    )
                return lax.conv_general_dilated(
                    xk.astype(dtype),
                    wk.astype(dtype),
                    window_strides=(sh, sw),
                    padding=((ph, ph), (pw, pw)),
                    rhs_dilation=(dh, dw),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

        if sources is None:
            y = run(x, kernel)
        else:
            # per-source input-channel slices of the ORIGINAL kernel; each
            # slice goes through the same (s2d/s2d_in) transform, so packed
            # sources are consumed in their own canonical layout and no
            # concat buffer ever materializes.
            y = None
            off = 0
            for src in sources:
                ck = src.shape[-1] // 4 if packed_in else src.shape[-1]
                yk = run(src, kernel[:, :, off: off + ck, :])
                y = yk if y is None else y + yk
                off += ck
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.s2d:
                y = y + jnp.broadcast_to(
                    bias.astype(dtype), (4, self.features)
                ).reshape(-1)
            else:
                y = y + bias.astype(dtype)
        return y


class TorchConvTranspose(nn.Module):
    """nn.ConvTranspose2d parity (output_padding=0).

    Output size = (in - 1) * stride - 2 * padding + kernel.  Implemented as
    lhs-dilated convolution with padding (k - 1 - p) and the kernel flipped
    spatially, which is exactly torch's gradient-of-conv definition.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # Emit the output in space-to-depth layout: a (3, 3, I, 4O) stride-1
    # conv at the *input* resolution (ops/s2d.py::deconv4s2p1_s2d_out_kernel)
    # — avoids the lane-starved lhs-dilated conv entirely.
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x) -> Array:
        # Tuple/list input: transpose-conv of the channel-concat of the
        # sources, computed per source with kernel slices and summed —
        # the concat buffer never materializes (see TorchConv).
        sources = None
        if isinstance(x, (tuple, list)):
            sources = tuple(x)
            x = sources[0]
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = (sum(sc.shape[-1] for sc in sources)
                 if sources is not None else x.shape[-1])
        # stored as (kh, kw, I, O): torch (I, O, kh, kw).transpose(2, 3, 0, 1)
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if self.s2d_out:
            from ..ops.s2d import deconv4s2p1_s2d_out_kernel

            assert (k, s, p) == (4, 2, 1)

            def run(xk, wk):
                k2 = deconv4s2p1_s2d_out_kernel(wk).astype(dtype)
                return lax.conv_general_dilated(
                    xk.astype(dtype), k2, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:
            def run(xk, wk):
                return lax.conv_general_dilated(
                    xk.astype(dtype),
                    wk[::-1, ::-1].astype(dtype),
                    window_strides=(1, 1),
                    padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
                    lhs_dilation=(s, s),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

        if sources is None:
            y = run(x, kernel)
        else:
            y = None
            off = 0
            for src in sources:
                ck = src.shape[-1]
                yk = run(src, kernel[:, :, off: off + ck, :])
                y = yk if y is None else y + yk
                off += ck
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.s2d_out:
                y = y + jnp.broadcast_to(
                    bias.astype(dtype), (4, self.features)
                ).reshape(-1)
            else:
                y = y + bias.astype(dtype)
        return y


class InstanceNorm2d(nn.Module):
    """torch nn.InstanceNorm2d defaults: affine=False, eps=1e-5, per-sample
    per-channel normalization over (H, W).

    ``s2d``: the input is in 2x2 space-to-depth layout (B, H/2, W/2, 4C),
    channel (p*2+q)*C + c (ops/s2d.py) — statistics reduce over the four
    phase copies of each ORIGINAL channel as well as space, which is
    exactly the full-resolution per-channel reduction over the same
    elements (value-identical modulo float reassociation)."""

    eps: float = 1e-5
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x32 = x.astype(jnp.float32)
        if self.s2d:
            B, H2, W2, C4 = x.shape
            x5 = x32.reshape(B, H2, W2, 4, C4 // 4)
            mean = jnp.mean(x5, axis=(1, 2, 3), keepdims=True)
            var = jnp.var(x5, axis=(1, 2, 3), keepdims=True)
            y = (x5 - mean) * lax.rsqrt(var + self.eps)
            return y.reshape(x.shape).astype(x.dtype)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mean) * lax.rsqrt(var + self.eps)).astype(x.dtype)


class TorchGroupNorm(nn.Module):
    """torch nn.GroupNorm parity (affine, eps=1e-5)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        x32 = x.astype(jnp.float32).reshape(B, H, W, g, C // g)
        mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
        y = (x32 - mean) * lax.rsqrt(var + self.eps)
        y = y.reshape(B, H, W, C) * scale + bias
        return y.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """torch nn.BatchNorm2d parity (eps=1e-5, momentum=0.1).

    ``use_running_average=True`` (inference) uses the converted running
    stats; training mode computes batch stats and updates the ``batch_stats``
    collection like flax's BatchNorm.
    """

    use_running_average: bool = True
    eps: float = 1e-5
    momentum: float = 0.1
    # 2x2 space-to-depth input layout: stats/affine per ORIGINAL channel
    # (reduced over the 4 phase copies too — the same elements as the
    # full-res reduction); params and running stats keep shape (C,), so
    # checkpoints are untouched.
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        if self.s2d:
            x32 = x32.reshape(x.shape[:-1] + (4, C))
            red = (0, 1, 2, 3)
            n = x.shape[0] * x.shape[1] * x.shape[2] * 4
        else:
            red = (0, 1, 2)
            n = x.shape[0] * x.shape[1] * x.shape[2]
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x32, axis=red)
            var = jnp.var(x32, axis=red)
            if not self.is_initializing():
                unbiased = var * n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (x32 - mean) * lax.rsqrt(var + self.eps) * scale + bias
        return y.reshape(x.shape).astype(x.dtype)


class ConvBlock(nn.Module):
    """The reference's ``conv()`` helper (models/submodules.py:18-43):
    Conv2d (+ optional BatchNorm) + LeakyReLU(0.1).  With batch_norm the
    conv drops its bias, as in the reference."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    batch_norm: bool = False
    act: Optional[Callable[[Array], Array]] = leaky_relu
    dtype: Optional[Dtype] = None
    train: bool = False
    s2d: bool = False
    s2d_concat: Optional[Sequence[int]] = None
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = TorchConv(
            self.features,
            self.kernel_size,
            self.stride,
            dilation=self.dilation,
            use_bias=not self.batch_norm,
            dtype=self.dtype,
            s2d=self.s2d,
            s2d_concat=self.s2d_concat,
            s2d_in=self.s2d_in,
            name="conv",
        )(x)
        if self.batch_norm:
            bn = TorchBatchNorm(use_running_average=not self.train, name="bn")
            if self.s2d:
                # s2d layout: channels are (p, q, c); fold the 2x2 block
                # into the W axis so stats/affine stay per-c.
                B, H2, W2, C4 = y.shape
                y = bn(y.reshape(B, H2, W2 * 4, C4 // 4)).reshape(y.shape)
            else:
                y = bn(y)
        if self.act is not None:
            y = self.act(y)
        return y


class DeconvBlock(nn.Module):
    """The reference's ``deconv()``: ConvTranspose2d(4, 2, 1) + LeakyReLU(0.1).
    FlowNetS uses bias=False (models/FlowNetS.py:43-49), FlowNetC bias=True
    (models/submodules.py:76-82)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = TorchConvTranspose(
            self.features, 4, 2, 1, use_bias=self.use_bias,
            dtype=self.dtype, s2d_out=self.s2d_out, name="deconv",
        )(x)
        return leaky_relu(y)


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)  # type: ignore[return-value]
    return (v, v)


def crop_like(x: Array, target: Array) -> Array:
    """models/FlowNetS.py:52-57 — crop trailing spatial rows/cols."""
    if x.shape[1:3] == target.shape[1:3]:
        return x
    return x[:, : target.shape[1], : target.shape[2], :]
