"""SPyNet in flax (reference: models/spynet.py:9-281).

Coarse-to-fine residual pyramid: 6 levels, each a 5-conv "Basic" G-unit fed
with (first-image, backward-warped second image, upsampled flow).  The
reference loads per-level per-conv weight files
(pretrained_models/spynet_models/modelL{L}_{M}-{k}-{weight,bias}.pth.tar,
models/spynet.py:81-127); the converter reassembles them into this module's
pytree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import avg_pool2, resize_bilinear, warp_backward
from .layers import TorchConv

Array = jax.Array

# ImageNet statistics (models/spynet.py:39-45)
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def spynet_preprocess(im: Array) -> Array:
    mean = jnp.asarray(_MEAN, im.dtype)
    std = jnp.asarray(_STD, im.dtype)
    return (im - mean) / std


class SpyNetBasic(nn.Module):
    """models/spynet.py:51-130: conv7x7 stack 8->32->64->32->16->2, ReLU
    between (none after the last).

    On TPU the whole stack runs in 2x2 space-to-depth space (ops/s2d.py):
    these full-res small-channel 7x7 convs otherwise pad their output
    channels 4-8x on the MXU lane tile (95 of SpyNet's 189 ms at b8,
    measured) — the transform is exact and uses the same params.
    """

    dtype: Optional[Any] = None
    use_s2d: Optional[bool] = None  # None = auto (TPU + even dims)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s2d = self.use_s2d
        if s2d is None:
            s2d = (
                jax.default_backend() == "tpu"
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
        if s2d:
            from ..ops.s2d import depth_to_space, space_to_depth

            x = space_to_depth(x)
        for i, feat in enumerate([32, 64, 32, 16]):
            x = jax.nn.relu(
                TorchConv(feat, 7, 1, dtype=self.dtype, s2d=s2d,
                          name=f"conv{i}")(x)
            )
        x = TorchConv(2, 7, 1, dtype=self.dtype, s2d=s2d, name="conv4")(x)
        if s2d:
            x = depth_to_space(x)
        return x


class SpyNet(nn.Module):
    """models/spynet.py:183-281 (``Network``)."""

    nlevels: int = 6
    return_features: bool = False
    dtype: Optional[Any] = None
    use_s2d: Optional[bool] = None  # forwarded to SpyNetBasic

    @nn.compact
    def __call__(self, im1: Array, im2: Array, train: bool = False):
        x1 = [spynet_preprocess(im1)]
        x2 = [spynet_preprocess(im2)]
        for _ in range(self.nlevels - 1):
            x1.insert(0, avg_pool2(x1[0]))
            x2.insert(0, avg_pool2(x2[0]))

        B = im1.shape[0]
        h0, w0 = x1[0].shape[1], x1[0].shape[2]
        flow = jnp.zeros((B, h0 // 2, w0 // 2, 2), jnp.float32)

        all_flows = []
        for level in range(self.nlevels):
            h, w = x1[level].shape[1], x1[level].shape[2]
            # x2 bilinear upsample (align_corners=False) of the flow, values
            # doubled (models/spynet.py:232-238)
            up = 2.0 * resize_bilinear(
                flow, 2 * flow.shape[1], 2 * flow.shape[2], align_corners=False
            )
            # replicate-pad one row/col if the finer level is odd
            # (models/spynet.py:240-247)
            if up.shape[1] != h:
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
            if up.shape[2] != w:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")

            warped = warp_backward(x2[level], up, mode="spynet")
            # materialize the level input once: without the barrier XLA
            # re-fuses the warp + concat into several G-unit conv fusions
            # (same pathology as the FlowNet2 cascade, models/flownet2.py
            # _stage_input)
            inp = jax.lax.optimization_barrier(
                jnp.concatenate([x1[level], warped, up], axis=-1)
            )
            flow = (
                SpyNetBasic(dtype=self.dtype, use_s2d=self.use_s2d,
                            name=f"basic{level}")(inp) + up
            )
            all_flows.append(flow)

        if train:
            # reference returns the list coarsest-last reversed
            # (models/spynet.py:272-276): variableAllFlows[n-1-level] = flow
            return all_flows[::-1]
        if self.return_features:
            return flow, {}
        return flow
