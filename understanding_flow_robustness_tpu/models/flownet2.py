"""FlowNet2 cascade and its sub-networks in flax.

Reference: models/flownet2_models.py:14-205 (cascade), sub-nets at
models/flownet2/FlowNetC.py (131), FlowNetS.py (93), FlowNetSD.py (103),
FlowNetFusion.py (65).  The Resample2d / ChannelNorm CUDA ops become
ops.warp_backward(mode="border") / ops.channel_norm.

All sub-nets here take an already-concatenated NHWC input (like the
reference passes ``x = cat(x1, x2)``) and return the finest flow map(s).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import channel_norm, resize_bilinear, upsample_nearest, warp_backward
from .flownet_family import flownetc_normalize
from .layers import ConvBlock, DeconvBlock, TorchConv, TorchConvTranspose


def _stage_input(x):
    """Materialize a cascade stage's full-res input concat exactly once.

    Without the barrier XLA fuses the inter-stage glue (warp + channel
    norms + 12-channel concat) into several of the consumer sub-net's
    convolution fusions, re-computing it per consumer: measured +46 ms per
    stage at batch 8 384x1280 on v5e (84.5 -> 38.4 ms for the CS stage —
    PERF.md).  Semantically the identity."""
    return jax.lax.optimization_barrier(x)

Array = jax.Array


class FlowNet2CSub(nn.Module):
    """models/flownet2/FlowNetC.py:10-131 — FlowNetC taking a stacked
    6-channel input, returning quarter-res flow2 (eval)."""

    batch_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        from .flownet_family import correlate_flownetc
        from .layers import leaky_relu

        kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        x1, x2 = x[..., :3], x[..., 3:]

        conv1 = ConvBlock(64, 7, 2, name="conv1", **kw)
        conv2 = ConvBlock(128, 5, 2, name="conv2", **kw)
        conv3 = ConvBlock(256, 5, 2, name="conv3", **kw)
        out_conv1a = conv1(x1)
        out_conv2a = conv2(out_conv1a)
        out_conv3a = conv3(out_conv2a)
        out_conv3b = conv3(conv2(conv1(x2)))

        out_corr = leaky_relu(correlate_flownetc(out_conv3a, out_conv3b))
        out_conv_redir = ConvBlock(32, 1, 1, name="conv_redir", **kw)(out_conv3a)
        out_conv3_1 = ConvBlock(256, 3, 1, name="conv3_1", **kw)(
            (out_conv_redir, out_corr)
        )
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **kw)(
            ConvBlock(512, 3, 2, name="conv4", **kw)(out_conv3_1)
        )
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **kw)(
            ConvBlock(512, 3, 2, name="conv5", **kw)(out_conv4)
        )
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **kw)(
            ConvBlock(1024, 3, 2, name="conv6", **kw)(out_conv5)
        )

        def pflow(name):
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      dtype=self.dtype, name=name)

        flow6 = pflow("predict_flow6")(out_conv6)
        concat5 = (
            out_conv5,
             DeconvBlock(512, dtype=self.dtype, name="deconv5")(out_conv6),
             upflow("upsampled_flow6_to_5")(flow6))
        flow5 = pflow("predict_flow5")(concat5)
        concat4 = (
            out_conv4,
             DeconvBlock(256, dtype=self.dtype, name="deconv4")(concat5),
             upflow("upsampled_flow5_to_4")(flow5))
        flow4 = pflow("predict_flow4")(concat4)
        concat3 = (
            out_conv3_1,
             DeconvBlock(128, dtype=self.dtype, name="deconv3")(concat4),
             upflow("upsampled_flow4_to_3")(flow4))
        flow3 = pflow("predict_flow3")(concat3)
        concat2 = (
            out_conv2a,
             DeconvBlock(64, dtype=self.dtype, name="deconv2")(concat3),
             upflow("upsampled_flow3_to_2")(flow3))
        flow2 = pflow("predict_flow2")(concat2)

        if train:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)


class FlowNet2SSub(nn.Module):
    """models/flownet2/FlowNetS.py:14-93 — FlowNetS with configurable input
    channels (12 in the cascade), bias-free learned flow upsamplers."""

    batch_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        out_conv1 = ConvBlock(64, 7, 2, name="conv1", **kw)(x)
        out_conv2 = ConvBlock(128, 5, 2, name="conv2", **kw)(out_conv1)
        out_conv3 = ConvBlock(256, 3, 1, name="conv3_1", **kw)(
            ConvBlock(256, 5, 2, name="conv3", **kw)(out_conv2)
        )
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **kw)(
            ConvBlock(512, 3, 2, name="conv4", **kw)(out_conv3)
        )
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **kw)(
            ConvBlock(512, 3, 2, name="conv5", **kw)(out_conv4)
        )
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **kw)(
            ConvBlock(1024, 3, 2, name="conv6", **kw)(out_conv5)
        )

        def pflow(name):
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(2, 4, 2, 1, use_bias=False,
                                      dtype=self.dtype, name=name)

        flow6 = pflow("predict_flow6")(out_conv6)
        concat5 = (
            out_conv5,
             DeconvBlock(512, dtype=self.dtype, name="deconv5")(out_conv6),
             upflow("upsampled_flow6_to_5")(flow6))
        flow5 = pflow("predict_flow5")(concat5)
        concat4 = (
            out_conv4,
             DeconvBlock(256, dtype=self.dtype, name="deconv4")(concat5),
             upflow("upsampled_flow5_to_4")(flow5))
        flow4 = pflow("predict_flow4")(concat4)
        concat3 = (
            out_conv3,
             DeconvBlock(128, dtype=self.dtype, name="deconv3")(concat4),
             upflow("upsampled_flow4_to_3")(flow4))
        flow3 = pflow("predict_flow3")(concat3)
        concat2 = (
            out_conv2,
             DeconvBlock(64, dtype=self.dtype, name="deconv2")(concat3),
             upflow("upsampled_flow3_to_2")(flow3))
        flow2 = pflow("predict_flow2")(concat2)

        if train:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)


class FlowNetSD(nn.Module):
    """models/flownet2/FlowNetSD.py:11-103 — small-displacement net with
    inter_conv feature heads before each flow prediction.

    The full-resolution head (stride-1 conv0 into stride-2 conv1, 64
    channels at 384x1280) runs in space-to-depth layout on TPU — conv0's
    output feeds only conv1, which consumes the s2d activation directly
    (``s2d_in``).  Exact; parameter shapes unchanged.
    """

    batch_norm: bool = False
    dtype: Optional[Any] = None
    use_s2d: Optional[bool] = None  # None = auto (TPU + even dims)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        s2d = self.use_s2d
        if s2d is None:
            s2d = (
                jax.default_backend() == "tpu"
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
        kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)
        if s2d:
            from ..ops.s2d import space_to_depth

            out_conv0 = ConvBlock(64, 3, 1, s2d=True, name="conv0", **kw)(
                space_to_depth(x)
            )
            out_conv1 = ConvBlock(128, 3, 1, name="conv1_1", **kw)(
                ConvBlock(64, 3, 2, s2d_in=True, name="conv1", **kw)(out_conv0)
            )
        else:
            out_conv0 = ConvBlock(64, 3, 1, name="conv0", **kw)(x)
            out_conv1 = ConvBlock(128, 3, 1, name="conv1_1", **kw)(
                ConvBlock(64, 3, 2, name="conv1", **kw)(out_conv0)
            )
        out_conv2 = ConvBlock(128, 3, 1, name="conv2_1", **kw)(
            ConvBlock(128, 3, 2, name="conv2", **kw)(out_conv1)
        )
        out_conv3 = ConvBlock(256, 3, 1, name="conv3_1", **kw)(
            ConvBlock(256, 3, 2, name="conv3", **kw)(out_conv2)
        )
        out_conv4 = ConvBlock(512, 3, 1, name="conv4_1", **kw)(
            ConvBlock(512, 3, 2, name="conv4", **kw)(out_conv3)
        )
        out_conv5 = ConvBlock(512, 3, 1, name="conv5_1", **kw)(
            ConvBlock(512, 3, 2, name="conv5", **kw)(out_conv4)
        )
        out_conv6 = ConvBlock(1024, 3, 1, name="conv6_1", **kw)(
            ConvBlock(1024, 3, 2, name="conv6", **kw)(out_conv5)
        )

        def pflow(name):
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype, name=name)

        def upflow(name):
            return TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      dtype=self.dtype, name=name)

        def iconv(feat, name):
            # i_conv: conv + no activation (models/submodules.py:46-68)
            return ConvBlock(feat, 3, 1, act=None, name=name,
                             batch_norm=self.batch_norm, dtype=self.dtype,
                             train=train)

        flow6 = pflow("predict_flow6")(out_conv6)
        concat5 = (
            out_conv5,
             DeconvBlock(512, dtype=self.dtype, name="deconv5")(out_conv6),
             upflow("upsampled_flow6_to_5")(flow6))
        flow5 = pflow("predict_flow5")(iconv(512, "inter_conv5")(concat5))
        concat4 = (
            out_conv4,
             DeconvBlock(256, dtype=self.dtype, name="deconv4")(concat5),
             upflow("upsampled_flow5_to_4")(flow5))
        flow4 = pflow("predict_flow4")(iconv(256, "inter_conv4")(concat4))
        concat3 = (
            out_conv3,
             DeconvBlock(128, dtype=self.dtype, name="deconv3")(concat4),
             upflow("upsampled_flow4_to_3")(flow4))
        flow3 = pflow("predict_flow3")(iconv(128, "inter_conv3")(concat3))
        concat2 = (
            out_conv2,
             DeconvBlock(64, dtype=self.dtype, name="deconv2")(concat3),
             upflow("upsampled_flow3_to_2")(flow3))
        flow2 = pflow("predict_flow2")(iconv(64, "inter_conv2")(concat2))

        if train:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)


class FlowNetFusion(nn.Module):
    """models/flownet2/FlowNetFusion.py:10-65 — 11-channel fusion net
    returning full-resolution flow0.

    The full-resolution island (conv0, inter_conv0, predict_flow0, and the
    two full-res upsamplers) is the cascade's last lane-starved hot spot
    (16-64 output channels at 384x1280).  On TPU it runs entirely in 2x2
    space-to-depth space (ops/s2d.py): one space_to_depth on the 11-channel
    input, one depth_to_space on the 2-channel flow, everything between is
    lane-dense stride-1 convs at half resolution — conv1 consumes the s2d
    activation directly (s2d_in), deconv0/upsampled_flow1_to_0 emit s2d
    layout (s2d_out), and inter_conv0's kernel is channel-permuted at trace
    time to read the concatenated per-source s2d tensors.  Exact modulo
    float reassociation; parameter shapes/names unchanged.
    """

    batch_norm: bool = False
    dtype: Optional[Any] = None
    use_s2d: Optional[bool] = None  # None = auto (TPU + even dims)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        s2d = self.use_s2d
        if s2d is None:
            s2d = (
                jax.default_backend() == "tpu"
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
        kw = dict(batch_norm=self.batch_norm, dtype=self.dtype, train=train)

        def pflow(name, **pkw):
            return TorchConv(2, 3, 1, use_bias=True, dtype=self.dtype,
                             name=name, **pkw)

        def upflow(name, **ukw):
            return TorchConvTranspose(2, 4, 2, 1, use_bias=True,
                                      dtype=self.dtype, name=name, **ukw)

        def iconv(feat, name, **ikw):
            return ConvBlock(feat, 3, 1, act=None, name=name,
                             batch_norm=self.batch_norm, dtype=self.dtype,
                             train=train, **ikw)

        if s2d:
            from ..ops.s2d import depth_to_space, space_to_depth

            xs = space_to_depth(x)
            out_conv0 = ConvBlock(64, 3, 1, s2d=True, name="conv0", **kw)(xs)
            out_conv1 = ConvBlock(128, 3, 1, name="conv1_1", **kw)(
                ConvBlock(64, 3, 2, s2d_in=True, name="conv1", **kw)(out_conv0)
            )
        else:
            out_conv0 = ConvBlock(64, 3, 1, name="conv0", **kw)(x)
            out_conv1 = ConvBlock(128, 3, 1, name="conv1_1", **kw)(
                ConvBlock(64, 3, 2, name="conv1", **kw)(out_conv0)
            )
        out_conv2 = ConvBlock(128, 3, 1, name="conv2_1", **kw)(
            ConvBlock(128, 3, 2, name="conv2", **kw)(out_conv1)
        )

        flow2 = pflow("predict_flow2")(out_conv2)
        # concat1/concat0 are passed as source TUPLES: every consumer conv
        # slices its kernel per source and sums, so the multi-hundred-MB
        # concat buffers never materialize (TorchConv docstring).
        concat1 = (out_conv1,
                   DeconvBlock(32, dtype=self.dtype, name="deconv1")(out_conv2),
                   upflow("upsampled_flow2_to_1")(flow2))
        flow1 = pflow("predict_flow1")(iconv(32, "inter_conv1")(concat1))
        if s2d:
            concat0 = (out_conv0,
                       DeconvBlock(16, dtype=self.dtype, s2d_out=True,
                                   name="deconv0")(concat1),
                       upflow("upsampled_flow1_to_0", s2d_out=True)(flow1))
            flow0 = pflow("predict_flow0", s2d=True)(
                iconv(16, "inter_conv0", s2d=True)(concat0))
            return depth_to_space(flow0)
        concat0 = (out_conv0,
                   DeconvBlock(16, dtype=self.dtype, name="deconv0")(concat1),
                   upflow("upsampled_flow1_to_0")(flow1))
        flow0 = pflow("predict_flow0")(iconv(16, "inter_conv0")(concat0))
        return flow0


class FlowNetS2(nn.Module):
    """Standalone FlowNetS as the factory's "FlowNetS" model ID.

    models/__init__.py:3 aliases ``FlowNetS`` to models/FlowNet2S.py's
    FlowNet2S (6-channel input, RGB-mean [0.4114511, 0.43205959, 0.45015125]
    subtraction at :63-69, eval output = x4-bilinear-upsampled flow2 * 20 at
    :111-115).  Loads FlowNet2-S_checkpoint.pth.tar
    (models/utils_model.py:121-124).
    """

    batch_norm: bool = False
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        mean = jnp.asarray((0.4114511, 0.43205959, 0.45015125), x1.dtype)
        x = jnp.concatenate([x1 - mean, x2 - mean], axis=-1)
        flows = FlowNet2SSub(self.batch_norm, self.dtype, name="net")(
            x, train=train
        )
        if train:
            return flows
        flow2 = flows[0]
        B, H, W, _ = flow2.shape
        out = resize_bilinear(20.0 * flow2, 4 * H, 4 * W, align_corners=False)
        if self.return_features:
            return out, {}
        return out


class FlowNet2Single(nn.Module):
    """Single-subnet cascade variants (models/flownet2_models.py:208-417):
    FlowNet2C / FlowNet2S / FlowNet2SD with per-image rgb-mean input
    normalization and x4-bilinear-upsampled flow2 * div_flow output."""

    subnet: str = "C"  # C | S | SD
    batch_norm: bool = False
    div_flow: float = 20.0
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        stacked = jnp.stack([x1, x2], axis=1)
        rgb_mean = jnp.mean(stacked, axis=(1, 2, 3), keepdims=True)
        x1 = x1 - rgb_mean[:, 0]
        x2 = x2 - rgb_mean[:, 0]
        x = jnp.concatenate([x1, x2], axis=-1)
        if self.subnet == "C":
            net = FlowNet2CSub(self.batch_norm, self.dtype, name="flownetc")
        elif self.subnet == "S":
            net = FlowNet2SSub(self.batch_norm, self.dtype, name="flownets")
        elif self.subnet == "SD":
            net = FlowNetSD(self.batch_norm, self.dtype, name="flownets_d")
        else:
            raise ValueError(self.subnet)
        flows = net(x, train=train)
        if train:
            return flows
        flow2 = flows[0]
        B, H, W, _ = flow2.shape
        out = resize_bilinear(
            flow2 * self.div_flow, 4 * H, 4 * W, align_corners=False
        )
        if self.return_features:
            return out, {}
        return out


class FlowNet2CS(nn.Module):
    """models/flownet2_models.py:419-497 — FlowNetC + one FlowNetS stage.

    Input normalization: per-image RGB-mean subtraction across BOTH frames
    (the cascade variants' rgb_mean convention at :459-475).
    """

    batch_norm: bool = False
    div_flow: float = 20.0
    stages: int = 1  # 1 = CS, 2 = CSS (flownet2_models.py:499-600)
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        stacked = jnp.stack([x1, x2], axis=1)  # (B, 2, H, W, 3)
        rgb_mean = jnp.mean(stacked, axis=(1, 2, 3), keepdims=True)
        x1 = x1 - rgb_mean[:, 0]
        x2 = x2 - rgb_mean[:, 0]
        x = jnp.concatenate([x1, x2], axis=-1)
        img0, img1 = x1, x2
        B, H, W, _ = x1.shape

        def up4(f):
            return resize_bilinear(f, H, W, align_corners=False)

        flow2 = FlowNet2CSub(self.batch_norm, self.dtype, name="flownetc")(x)[0]
        flow = up4(flow2 * self.div_flow)

        for i in range(self.stages):
            resampled1 = warp_backward(img1, flow, mode="border")
            norm_diff0 = channel_norm(img0 - resampled1)
            concat = _stage_input(jnp.concatenate(
                [x, resampled1, flow / self.div_flow, norm_diff0], axis=-1
            ))
            flow2 = FlowNet2SSub(
                self.batch_norm, self.dtype, name=f"flownets_{i + 1}"
            )(concat)[0]
            flow = up4(flow2 * self.div_flow)

        if self.return_features:
            return flow, {}
        return flow


class FlowNet2(nn.Module):
    """models/flownet2_models.py:14-205 — the 5-net cascade.

    Input: two (B, H, W, 3) RGB images in [0, 1]; H, W multiples of 64.
    Output: full-resolution fused flow (B, H, W, 2).
    """

    batch_norm: bool = False
    div_flow: float = 20.0
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        x1 = flownetc_normalize(x1)
        x2 = flownetc_normalize(x2)
        x = jnp.concatenate([x1, x2], axis=-1)
        img0, img1 = x1, x2
        B, H, W, _ = x1.shape

        def up4_bilinear(f):
            return resize_bilinear(f, H, W, align_corners=False)

        # --- FlowNetC stage (flownet2_models.py:131-141)
        flownetc_flow2 = FlowNet2CSub(
            self.batch_norm, self.dtype, name="flownetc"
        )(x)[0]
        flownetc_flow = up4_bilinear(flownetc_flow2 * self.div_flow)

        resampled1 = warp_backward(img1, flownetc_flow, mode="border")
        diff0 = img0 - resampled1
        norm_diff0 = channel_norm(diff0)
        concat1 = _stage_input(jnp.concatenate(
            [x, resampled1, flownetc_flow / self.div_flow, norm_diff0], axis=-1
        ))

        # --- FlowNetS1 (flownet2_models.py:143-155)
        flownets1_flow2 = FlowNet2SSub(
            self.batch_norm, self.dtype, name="flownets_1"
        )(concat1)[0]
        flownets1_flow = up4_bilinear(flownets1_flow2 * self.div_flow)

        resampled1 = warp_backward(img1, flownets1_flow, mode="border")
        norm_diff0 = channel_norm(img0 - resampled1)
        concat2 = _stage_input(jnp.concatenate(
            [x, resampled1, flownets1_flow / self.div_flow, norm_diff0], axis=-1
        ))

        # --- FlowNetS2 (flownet2_models.py:157-169); nearest x4 upsample
        flownets2_flow2 = FlowNet2SSub(
            self.batch_norm, self.dtype, name="flownets_2"
        )(concat2)[0]
        flownets2_flow = upsample_nearest(flownets2_flow2 * self.div_flow, 4)
        norm_flownets2_flow = channel_norm(flownets2_flow)
        diff_flownets2 = warp_backward(img1, flownets2_flow, mode="border")
        diff_flownets2_img1 = channel_norm(img0 - diff_flownets2)

        # --- FlowNetSD branch (flownet2_models.py:171-183)
        flownetsd_flow2 = FlowNetSD(
            self.batch_norm, self.dtype, name="flownets_d"
        )(x)[0]
        flownetsd_flow = upsample_nearest(flownetsd_flow2 / self.div_flow, 4)
        norm_flownetsd_flow = channel_norm(flownetsd_flow)
        diff_flownetsd = warp_backward(img1, flownetsd_flow, mode="border")
        diff_flownetsd_img1 = channel_norm(img0 - diff_flownetsd)

        # --- Fusion (flownet2_models.py:185-203)
        concat3 = _stage_input(jnp.concatenate(
            [img0, flownetsd_flow, flownets2_flow,
             norm_flownetsd_flow, norm_flownets2_flow,
             diff_flownetsd_img1, diff_flownets2_img1], axis=-1
        ))
        flow = FlowNetFusion(
            self.batch_norm, self.dtype, name="flownetfusion"
        )(concat3)

        if self.return_features:
            return flow, {}
        return flow
