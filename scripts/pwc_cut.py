"""PWC-Net progressive-truncation timing: jit the forward cut after each
stage and difference consecutive cuts — in-graph stage costs including all
glue/layout work that standalone decomposition misses (~15 ms at b8
384x1280 was unaccounted for).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_cut.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from understanding_flow_robustness_tpu.models.pwcnet import (
    correlate_pwc,
    _WARP_SCALE,
)
from understanding_flow_robustness_tpu.models.layers import (
    TorchConv,
    TorchConvTranspose,
    leaky_relu,
)
from understanding_flow_robustness_tpu.ops import resize_bilinear, warp_backward
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

CUTS = ("pyramid", "L6", "L5", "L4", "L3", "L2", "context", "full")


class PWCCut(nn.Module):
    cut: str = "full"

    @nn.compact
    def __call__(self, im1, im2):
        def conv(feat, name, stride=1, dilation=1):
            c = TorchConv(feat, 3, stride, dilation=dilation, name=name)
            return lambda x: leaky_relu(c(x))

        def deconv(feat, name):
            return TorchConvTranspose(feat, 4, 2, 1, name=name)

        im1 = im1[..., ::-1]
        im2 = im2[..., ::-1]
        stages = []
        for feat, a, aa, b in [
            (16, "1a", "1aa", "1b"), (32, "2a", "2aa", "2b"),
            (64, "3a", "3aa", "3b"), (96, "4a", "4aa", "4b"),
            (128, "5a", "5aa", "5b"),
        ]:
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
            feats.append(conv6[2](conv6[1](conv6[0](x))))
            return feats

        c1 = pyramid(im1)
        c2 = pyramid(im2)
        if self.cut == "pyramid":
            return c1[-1] + c2[-1]

        def dense_decoder(x, lvl):
            srcs = x if isinstance(x, tuple) else (x,)
            if len(srcs) > 1:
                srcs = (jnp.concatenate(srcs, axis=-1),)
            for i, feat in enumerate([128, 128, 96, 64, 32]):
                y = conv(feat, f"conv{lvl}_{i}")(srcs)
                srcs = (jnp.concatenate((y,) + srcs, axis=-1),)
            flow = TorchConv(2, 3, 1, name=f"predict_flow{lvl}")(srcs)
            return srcs, flow

        corr6 = correlate_pwc(c1[5], c2[5])
        x, flow6 = dense_decoder(leaky_relu(corr6), 6)
        up_flow = deconv(2, "deconv6")(flow6)
        up_feat = deconv(2, "upfeat6")(x)
        if self.cut == "L6":
            return up_flow + jnp.mean(up_feat, -1, keepdims=True)

        for lvl in (5, 4, 3, 2):
            i = lvl - 1
            warped = warp_backward(
                c2[i], up_flow * _WARP_SCALE[lvl], mode="zeros_mask"
            )
            corr = leaky_relu(correlate_pwc(c1[i], warped))
            x = jax.lax.optimization_barrier((corr, c1[i], up_flow, up_feat))
            x, flow = dense_decoder(x, lvl)
            if lvl > 2:
                up_flow = deconv(2, f"deconv{lvl}")(flow)
                up_feat = deconv(2, f"upfeat{lvl}")(x)
            if self.cut == f"L{lvl}":
                if lvl > 2:
                    return up_flow + jnp.mean(up_feat, -1, keepdims=True)
                return flow + jnp.mean(x[0], -1, keepdims=True)

        y = conv(128, "dc_conv1")(x)
        y = conv(128, "dc_conv2", dilation=2)(y)
        y = conv(128, "dc_conv3", dilation=4)(y)
        y = conv(96, "dc_conv4", dilation=8)(y)
        y = conv(64, "dc_conv5", dilation=16)(y)
        y = conv(32, "dc_conv6")(y)
        flow = flow + TorchConv(2, 3, 1, name="dc_conv7")(y)
        if self.cut == "context":
            return flow
        B, H, W, _ = flow.shape
        return 20.0 * resize_bilinear(flow, 4 * H, 4 * W, align_corners=False)


def main():
    enable_compilation_cache()
    B, H, W = 8, 384, 1280
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    prev = 0.0
    for cut in CUTS:
        mod = PWCCut(cut=cut)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), a[:1, :128, :128],
                              b[:1, :128, :128])
        fn = jax.jit(mod.apply)
        dt = timed_loop(lambda x, y, vv: fn(vv, x, y), (a, b, v), n=15)
        ms = dt * 1000
        print(f"cut {cut:8s}: {ms:7.2f} ms  (stage {ms - prev:+6.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
