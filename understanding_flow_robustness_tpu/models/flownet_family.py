"""FlowNetS / FlowNetC / robust-FlowNetC (flexible larger-field) in flax.

Reference architectures:
  * FlowNetS — models/FlowNetS.py:56-144 (6-ch input encoder/decoder with
    learned ConvTranspose flow upsampling and crop_like; eval returns
    5 * flow2 at quarter resolution).
  * FlowNetC — models/FlowNetC.py:11-197 (siamese conv1-3, 441-ch correlation
    with LeakyReLU, conv_redir, decoder; eval returns x4-bilinear-upsampled
    flow2 * div_flow(=20); RGB mean subtraction at :73-79).
  * FlowNetC_flexible_larger_field — models/FlowNetC_flexible_larger_field.py:
    90-329 (conv stages as repeated-conv lists, div_flow=1, bias-free
    deconvs).  FlowNetC_predict_bias (models/FlowNetC_predict_bias.py) is the
    same topology with kernel_size=5/reps=0 and flat stage names; selected by
    the factory for ``k5_reps0`` checkpoints (models/utils_model.py:81-89).

Feature taps: PyTorch forward hooks / ``overwrite_feat_maps`` become an
explicit functional interface — models return ``(flow, features)`` when
``return_features`` and accept an ``overrides`` dict injected at the same
points the reference supports (conv3a/conv3b/corr/conv_redir/conv3_1,
models/FlowNetC.py:118-155).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear, spatial_correlation
from .layers import (
    ConvBlock,
    DeconvBlock,
    TorchConv,
    TorchConvTranspose,
    crop_like,
    leaky_relu,
)

Array = jax.Array

# RGB mean used by FlowNetC-family normalize (models/FlowNetC.py:73-79).
FLOWNETC_RGB_MEAN = (0.40066648, 0.39482617, 0.3784785)


def flownetc_normalize(im: Array) -> Array:
    mean = jnp.asarray(FLOWNETC_RGB_MEAN, im.dtype)
    return im - mean


def correlate_flownetc(f1: Array, f2: Array) -> Array:
    """models/submodules.py:124-138: patch 21, dilation_patch 2, /C.
    Returns the raw (pre-activation) 441-channel cost volume."""
    corr = spatial_correlation(f1, f2, patch_size=21, dilation_patch=2)
    return corr / f1.shape[-1]


def _maybe(overrides: Optional[dict], key: str, value: Array) -> Array:
    if overrides is not None and key in overrides:
        return overrides[key].astype(value.dtype)
    return value


class FlowNetS(nn.Module):
    """models/FlowNetS.py:56-144.  Input: two (B, H, W, 3) images in [0, 1]
    (concatenated internally).  Eval output: 5 * flow2 at H/4 x W/4."""

    batch_norm: bool = False
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        conv_kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        x = jnp.concatenate([x1, x2], axis=-1)

        out_conv1 = ConvBlock(64, 7, 2, name="conv1", **conv_kw)(x)
        out_conv2 = ConvBlock(128, 5, 2, name="conv2", **conv_kw)(out_conv1)
        out_conv3 = ConvBlock(256, 5, 2, name="conv3", **conv_kw)(out_conv2)
        out_conv3 = ConvBlock(256, 3, 1, name="conv3_1", **conv_kw)(out_conv3)
        out_conv4 = ConvBlock(512, 3, 2, name="conv4", **conv_kw)(out_conv3)
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 2, name="conv5", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 2, name="conv6", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **conv_kw)(out_conv6)

        def pflow(name):
            # predict_flow: 3x3 conv, bias=False (models/FlowNetS.py:37-38)
            return TorchConv(2, 3, 1, use_bias=False, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(
                2, 4, 2, 1, use_bias=False, dtype=self.dtype, name=name
            )

        flow6 = pflow("predict_flow6")(out_conv6)
        flow6_up = crop_like(upflow("upsampled_flow6_to_5")(flow6), out_conv5)
        out_deconv5 = crop_like(
            DeconvBlock(512, use_bias=False, dtype=self.dtype, name="deconv5")(
                out_conv6
            ),
            out_conv5,
        )

        concat5 = (out_conv5, out_deconv5, flow6_up)
        flow5 = pflow("predict_flow5")(concat5)
        flow5_up = crop_like(upflow("upsampled_flow5_to_4")(flow5), out_conv4)
        out_deconv4 = crop_like(
            DeconvBlock(256, use_bias=False, dtype=self.dtype, name="deconv4")(
                concat5
            ),
            out_conv4,
        )

        concat4 = (out_conv4, out_deconv4, flow5_up)
        flow4 = pflow("predict_flow4")(concat4)
        flow4_up = crop_like(upflow("upsampled_flow4_to_3")(flow4), out_conv3)
        out_deconv3 = crop_like(
            DeconvBlock(128, use_bias=False, dtype=self.dtype, name="deconv3")(
                concat4
            ),
            out_conv3,
        )

        concat3 = (out_conv3, out_deconv3, flow4_up)
        flow3 = pflow("predict_flow3")(concat3)
        flow3_up = crop_like(upflow("upsampled_flow3_to_2")(flow3), out_conv2)
        out_deconv2 = crop_like(
            DeconvBlock(64, use_bias=False, dtype=self.dtype, name="deconv2")(
                concat3
            ),
            out_conv2,
        )

        concat2 = (out_conv2, out_deconv2, flow3_up)
        flow2 = pflow("predict_flow2")(concat2)

        if train:
            return 5 * flow2, 5 * flow3, 5 * flow4, 5 * flow5, 5 * flow6
        if self.return_features:
            return 5 * flow2, {}
        return 5 * flow2


class FlowNetC(nn.Module):
    """models/FlowNetC.py:11-197.  Eval output: x4-bilinear-upsampled
    flow2 * div_flow at full resolution."""

    batch_norm: bool = False
    div_flow: float = 20.0
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x1: Array,
        x2: Array,
        train: bool = False,
        overrides: Optional[dict] = None,
    ):
        conv_kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        x1 = flownetc_normalize(x1)
        x2 = flownetc_normalize(x2)

        conv1 = ConvBlock(64, 7, 2, name="conv1", **conv_kw)
        conv2 = ConvBlock(128, 5, 2, name="conv2", **conv_kw)
        conv3 = ConvBlock(256, 5, 2, name="conv3", **conv_kw)

        out_conv1a = conv1(x1)
        out_conv2a = conv2(out_conv1a)
        out_conv3a = conv3(out_conv2a)
        out_conv1b = conv1(x2)
        out_conv2b = conv2(out_conv1b)
        out_conv3b = conv3(out_conv2b)

        # conv3a/conv3b are replaced only when BOTH keys are present
        # (FlowNetC.py:121-130 requires the pair; a singleton is a no-op)
        if overrides is not None and "conv3a" in overrides \
                and "conv3b" in overrides:
            out_conv3a = overrides["conv3a"].astype(out_conv3a.dtype)
            out_conv3b = overrides["conv3b"].astype(out_conv3b.dtype)

        out_corr = correlate_flownetc(out_conv3a, out_conv3b)
        feats = {
            "conv1a": out_conv1a, "conv2a": out_conv2a, "conv3a": out_conv3a,
            "conv1b": out_conv1b, "conv2b": out_conv2b, "conv3b": out_conv3b,
            "corr": out_corr,
        }
        out_corr = _maybe(overrides, "corr", out_corr)
        out_corr = leaky_relu(out_corr)

        out_conv_redir = ConvBlock(32, 1, 1, name="conv_redir", **conv_kw)(
            out_conv3a
        )
        feats["conv_redir"] = out_conv_redir
        out_conv_redir = _maybe(overrides, "conv_redir", out_conv_redir)

        in_conv3_1 = (out_conv_redir, out_corr)
        out_conv3_1 = ConvBlock(256, 3, 1, name="conv3_1", **conv_kw)(in_conv3_1)
        feats["conv3_1"] = out_conv3_1
        out_conv3_1 = _maybe(overrides, "conv3_1", out_conv3_1)

        out_conv4 = ConvBlock(512, 3, 2, name="conv4", **conv_kw)(out_conv3_1)
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 2, name="conv5", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 2, name="conv6", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **conv_kw)(out_conv6)

        def pflow(name):
            # FlowNetC predict_flow has bias (models/submodules.py:71-72)
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(
                2, 4, 2, 1, use_bias=True, dtype=self.dtype, name=name
            )

        flow6 = pflow("predict_flow6")(out_conv6)
        flow6_up = upflow("upsampled_flow6_to_5")(flow6)
        out_deconv5 = DeconvBlock(512, dtype=self.dtype, name="deconv5")(out_conv6)

        concat5 = (out_conv5, out_deconv5, flow6_up)
        flow5 = pflow("predict_flow5")(concat5)
        flow5_up = upflow("upsampled_flow5_to_4")(flow5)
        out_deconv4 = DeconvBlock(256, dtype=self.dtype, name="deconv4")(concat5)

        concat4 = (out_conv4, out_deconv4, flow5_up)
        flow4 = pflow("predict_flow4")(concat4)
        flow4_up = upflow("upsampled_flow4_to_3")(flow4)
        out_deconv3 = DeconvBlock(128, dtype=self.dtype, name="deconv3")(concat4)

        concat3 = (out_conv3_1, out_deconv3, flow4_up)
        flow3 = pflow("predict_flow3")(concat3)
        flow3_up = upflow("upsampled_flow3_to_2")(flow3)
        out_deconv2 = DeconvBlock(64, dtype=self.dtype, name="deconv2")(concat3)

        concat2 = (out_conv2a, out_deconv2, flow3_up)
        flow2 = pflow("predict_flow2")(concat2)

        def up4(f):
            B, H, W, _ = f.shape
            return resize_bilinear(
                f * self.div_flow, 4 * H, 4 * W, align_corners=False
            )

        if train:
            return tuple(up4(f) for f in (flow2, flow3, flow4, flow5, flow6))
        if self.return_features:
            return up4(flow2), feats
        return up4(flow2)


class FlowNetCFlex(nn.Module):
    """models/FlowNetC_flexible_larger_field.py:90-329 ("Robust FlowNetC").

    kernel_size in {3, 5}, number_of_reps in 0..3, div_flow=1.  With
    ``flat_entry_names=True`` the stage convs are named conv1/conv2/conv3,
    matching FlowNetC_predict_bias checkpoints (k5_reps0,
    models/utils_model.py:81-89).
    """

    kernel_size: int = 3
    number_of_reps: int = 3
    dilation: int = 1
    div_flow: float = 1.0
    batch_norm: bool = False
    flat_entry_names: bool = False
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x1: Array,
        x2: Array,
        train: bool = False,
        overrides: Optional[dict] = None,
    ):
        conv_kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        x1 = flownetc_normalize(x1)
        x2 = flownetc_normalize(x2)

        def stage(idx, features, entry_kernel, entry_stride):
            blocks = []
            name = (
                f"conv{idx}" if self.flat_entry_names else f"convs{idx}_0"
            )
            blocks.append(
                ConvBlock(
                    features, entry_kernel, entry_stride,
                    dilation=self.dilation, name=name, **conv_kw,
                )
            )
            for r in range(self.number_of_reps):
                blocks.append(
                    ConvBlock(
                        features, self.kernel_size, 1,
                        name=f"convs{idx}_{r + 1}", **conv_kw,
                    )
                )
            return blocks

        convs1 = stage(1, 64, 7, 2)
        convs2 = stage(2, 128, self.kernel_size, 2)
        convs3 = stage(3, 256, self.kernel_size, 2)

        def run(blocks, x):
            for b in blocks:
                x = b(x)
            return x

        out_conv1a = run(convs1, x1)
        out_conv2a = run(convs2, out_conv1a)
        out_conv3a = run(convs3, out_conv2a)
        out_conv1b = run(convs1, x2)
        out_conv2b = run(convs2, out_conv1b)
        out_conv3b = run(convs3, out_conv2b)

        # conv3a/conv3b are replaced only when BOTH keys are present
        # (FlowNetC.py:121-130 requires the pair; a singleton is a no-op)
        if overrides is not None and "conv3a" in overrides \
                and "conv3b" in overrides:
            out_conv3a = overrides["conv3a"].astype(out_conv3a.dtype)
            out_conv3b = overrides["conv3b"].astype(out_conv3b.dtype)

        out_conv_redir = ConvBlock(32, 1, 1, name="conv_redir", **conv_kw)(
            out_conv3a
        )

        out_corr_raw = correlate_flownetc(out_conv3a, out_conv3b)
        feats = {
            "conv1a": out_conv1a, "conv2a": out_conv2a, "conv3a": out_conv3a,
            "conv1b": out_conv1b, "conv2b": out_conv2b, "conv3b": out_conv3b,
            "corr": out_corr_raw, "conv_redir": out_conv_redir,
        }
        out_corr_raw = _maybe(overrides, "corr", out_corr_raw)
        # flexible variant's correlate() applies the activation itself
        # (FlowNetC_flexible_larger_field.py:70-87)
        out_corr = leaky_relu(out_corr_raw)
        out_conv_redir = _maybe(overrides, "conv_redir", out_conv_redir)

        in_conv3_1 = (out_conv_redir, out_corr)
        out_conv3_1 = ConvBlock(256, 3, 1, name="conv3_1", **conv_kw)(in_conv3_1)
        feats["conv3_1"] = out_conv3_1
        out_conv3_1 = _maybe(overrides, "conv3_1", out_conv3_1)

        out_conv4 = ConvBlock(512, 3, 2, name="conv4", **conv_kw)(out_conv3_1)
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 2, name="conv5", **conv_kw)(out_conv4)
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 2, name="conv6", **conv_kw)(out_conv5)
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **conv_kw)(out_conv6)

        def pflow(name):
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(
                2, 4, 2, 1, use_bias=False, dtype=self.dtype, name=name
            )

        flow6 = pflow("predict_flow6")(out_conv6)
        flow6_up = upflow("upsampled_flow6_to_5")(flow6)
        out_deconv5 = DeconvBlock(512, use_bias=False, dtype=self.dtype,
                                  name="deconv5")(out_conv6)

        concat5 = (out_conv5, out_deconv5, flow6_up)
        flow5 = pflow("predict_flow5")(concat5)
        flow5_up = upflow("upsampled_flow5_to_4")(flow5)
        out_deconv4 = DeconvBlock(256, use_bias=False, dtype=self.dtype,
                                  name="deconv4")(concat5)

        concat4 = (out_conv4, out_deconv4, flow5_up)
        flow4 = pflow("predict_flow4")(concat4)
        flow4_up = upflow("upsampled_flow4_to_3")(flow4)
        out_deconv3 = DeconvBlock(128, use_bias=False, dtype=self.dtype,
                                  name="deconv3")(concat4)

        concat3 = (out_conv3_1, out_deconv3, flow4_up)
        flow3 = pflow("predict_flow3")(concat3)
        flow3_up = upflow("upsampled_flow3_to_2")(flow3)
        out_deconv2 = DeconvBlock(64, use_bias=False, dtype=self.dtype,
                                  name="deconv2")(concat3)

        concat2 = (out_conv2a, out_deconv2, flow3_up)
        flow2 = pflow("predict_flow2")(concat2)

        if train:
            # training returns the raw pyramid, NOT upsampled
            # (FlowNetC_flexible_larger_field.py:318-319)
            return flow2, flow3, flow4, flow5, flow6

        B, H, W, _ = flow2.shape
        out = resize_bilinear(
            flow2 * self.div_flow, 4 * H, 4 * W, align_corners=False
        )
        if self.return_features:
            return out, feats
        return out
