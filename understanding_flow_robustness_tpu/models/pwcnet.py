"""PWC-Net (PWC-DC) in flax (reference: models/PWCNet.py:53-402).

6-level siamese feature pyramid; per level: warp the second feature map by
the upsampled flow, 81-channel correlation (patch 9), DenseNet-connected
decoder, learned-deconv flow/feature upsampling; dilated context network on
the finest level.  Inputs are RGB in [0, 1] and converted to BGR at entry
(models/PWCNet.py:230-231); eval output is 20 * x4-bilinear-upsampled flow2
(models/PWCNet.py:349-359).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear, spatial_correlation, warp_backward
from .layers import TorchConv, TorchConvTranspose, leaky_relu

Array = jax.Array

_DD = (128, 256, 352, 416, 448)  # cumsum([128,128,96,64,32])
_WARP_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def correlate_pwc(f1: Array, f2: Array) -> Array:
    """models/PWCNet.py:42-50: patch 9, /C, no activation (applied after)."""
    corr = spatial_correlation(f1, f2, patch_size=9)
    return corr / f1.shape[-1]


class PWCNet(nn.Module):
    """PWCDCNet(md=4)."""

    md: int = 4
    return_features: bool = False
    dtype: Optional[Any] = None
    # bf16 compute / f32 params + f32 flow heads (predict_flow*, the flow
    # deconvs, dc_conv7) — the reference's own AMP training runs its convs
    # in fp16 (training/train.py GradScaler), so this is the
    # reference-equivalent mixed policy, same pattern as RAFT's
    # mixed_precision.  Measured at b8 384x1280: 53.7 -> ~45 ms; flow
    # drift vs f32 ~0.9% relative on random weights (pessimistic proxy —
    # see PERF.md drift table).  `dtype` overrides when set.
    mixed_precision: bool = False
    # DenseNet decoder source handling.  The tuple-split form (conv per
    # source, summed — models/layers.py TorchConv) wins standalone at
    # every level, but LOSES ~6 ms e2e at b8 384x1280 (measured by
    # scripts/pwc_knockout.py: 59.3 -> 53.0 with materialized concats) —
    # XLA schedules the fused per-source convs worse across the stage
    # boundary.  Default: materialize the concat like the reference.
    split_decoder: bool = False

    @nn.compact
    def __call__(self, im1: Array, im2: Array, train: bool = False):
        dt = (self.dtype if self.dtype is not None
              else (jnp.bfloat16 if self.mixed_precision else None))
        # flow heads stay f32 under mixed precision (flow values are the
        # output quantity; the heads are a negligible fraction of FLOPs)
        head_dt = jnp.float32 if self.mixed_precision else dt

        def conv(feat, name, stride=1, dilation=1):
            c = TorchConv(feat, 3, stride, dilation=dilation, dtype=dt, name=name)
            return lambda x: leaky_relu(c(x))

        def deconv(feat, name, dtype=dt):
            return TorchConvTranspose(feat, 4, 2, 1, dtype=dtype, name=name)

        # RGB -> BGR (models/PWCNet.py:230-231)
        im1 = im1[..., ::-1]
        im2 = im2[..., ::-1]

        # siamese pyramid (weights shared across the two streams)
        stages = []
        specs = [
            (16, "1a", "1aa", "1b"), (32, "2a", "2aa", "2b"),
            (64, "3a", "3aa", "3b"), (96, "4a", "4aa", "4b"),
            (128, "5a", "5aa", "5b"),
        ]
        for feat, a, aa, b in specs:
            stages.append(
                (conv(feat, f"conv{a}", stride=2), conv(feat, f"conv{aa}"),
                 conv(feat, f"conv{b}"))
            )
        conv6 = (conv(196, "conv6aa", stride=2), conv(196, "conv6a"),
                 conv(196, "conv6b"))

        def pyramid(x):
            feats = []
            for s2, s1, s1b in stages:
                x = s1b(s1(s2(x)))
                feats.append(x)
            x = conv6[2](conv6[1](conv6[0](x)))
            feats.append(x)
            return feats  # levels 1..6 (stride 2..64)

        c1 = pyramid(im1)
        c2 = pyramid(im2)

        feats_out = {}
        # pyramid taps, interleaved like the reference capture order
        # (PWCNet.py:236-271: c11, c21, c12, c22, ..., c16, c26)
        for i in range(6):
            feats_out[f"c1{i + 1}"] = c1[i]
            feats_out[f"c2{i + 1}"] = c2[i]
        flows = {}

        def dense_decoder(x, lvl):
            # DenseNet chain; source order matches torch.cat((y, x), 1).
            # split_decoder=True keeps the sources as a TUPLE (per-source
            # kernel-slice convs, no concat buffers); the default
            # materializes progressive concats — see the class docstring
            # knob note for the measured e2e tradeoff.
            srcs = x if isinstance(x, tuple) else (x,)
            if not self.split_decoder and len(srcs) > 1:
                srcs = (jnp.concatenate(srcs, axis=-1),)
            for i, feat in enumerate([128, 128, 96, 64, 32]):
                y = conv(feat, f"conv{lvl}_{i}")(srcs)
                feats_out[f"conv{lvl}_{i}"] = y
                srcs = (y,) + srcs
                if not self.split_decoder and len(srcs) > 1:
                    srcs = (jnp.concatenate(srcs, axis=-1),)
            flow = TorchConv(2, 3, 1, dtype=head_dt,
                             name=f"predict_flow{lvl}")(srcs)
            feats_out[f"predict_flow{lvl}"] = flow
            return srcs, flow

        # level 6 (coarsest)
        corr6 = correlate_pwc(c1[5], c2[5])
        feats_out["corr6"] = corr6
        x, flow6 = dense_decoder(leaky_relu(corr6), 6)
        up_flow = deconv(2, "deconv6", dtype=head_dt)(flow6)
        up_feat = deconv(2, "upfeat6")(x)
        feats_out["deconv6"], feats_out["upfeat6"] = up_flow, up_feat
        flows[6] = flow6

        for lvl in (5, 4, 3, 2):
            i = lvl - 1
            warped = warp_backward(
                c2[i], up_flow * _WARP_SCALE[lvl], mode="zeros_mask"
            )
            corr = correlate_pwc(c1[i], warped)
            if lvl == 2:
                # reference quirk: the capture at the corr2 site appends
                # corr5 AGAIN (PWCNet.py:336 'return_feat_maps.append(
                # corr5.clone())'), so the exposed 'corr2' tensor is corr5
                feats_out["corr2"] = feats_out["corr5"]
            else:
                feats_out[f"corr{lvl}"] = corr
            corr = leaky_relu(corr)
            # barrier: see models/flownet2.py::_stage_input (XLA otherwise
            # duplicates the warp/corr glue across decoder conv fusions)
            x = jax.lax.optimization_barrier(
                (corr, c1[i], up_flow, up_feat)
            )
            x, flow = dense_decoder(x, lvl)
            flows[lvl] = flow
            if lvl > 2:
                up_flow = deconv(2, f"deconv{lvl}", dtype=head_dt)(flow)
                up_feat = deconv(2, f"upfeat{lvl}")(x)
                feats_out[f"deconv{lvl}"] = up_flow
                feats_out[f"upfeat{lvl}"] = up_feat

        # context network (models/PWCNet.py:145-154, dilations 1..16)
        y = conv(128, "dc_conv1")(x)
        feats_out["dc_conv1"] = y
        y = conv(128, "dc_conv2", dilation=2)(y)
        feats_out["dc_conv2"] = y
        y = conv(128, "dc_conv3", dilation=4)(y)
        feats_out["dc_conv3"] = y
        y = conv(96, "dc_conv4", dilation=8)(y)
        feats_out["dc_conv4"] = y
        y = conv(64, "dc_conv5", dilation=16)(y)
        feats_out["dc_conv5"] = y
        y = conv(32, "dc_conv6")(y)
        feats_out["dc_conv6"] = y
        residual = TorchConv(2, 3, 1, dtype=head_dt, name="dc_conv7")(y)
        feats_out["dc_conv7"] = residual
        flows[2] = flows[2] + residual

        def up4(f):
            B, H, W, _ = f.shape
            return resize_bilinear(f, 4 * H, 4 * W, align_corners=False)

        if train:
            return tuple(up4(flows[l]) for l in (2, 3, 4, 5, 6))
        out = 20.0 * up4(flows[2])
        if self.return_features:
            return out, feats_out
        return out
