"""PWC-Net e2e knockout ablation: copy of the PWCNet forward with stages
stubbed one at a time, timed at b8 384x1280.  Differences between variants
give the TRUE in-graph cost of each stage (standalone decomposition has
repeatedly disagreed with e2e on this model).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_knockout.py
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


class PWCKnock(nn.Module):
    """PWCNet forward with knockouts (timing only; params match full)."""

    no_warp: bool = False
    no_corr: bool = False
    no_context: bool = False
    no_up4: bool = False
    no_barrier: bool = False
    concat_decoder: bool = False

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
            return feats

        c1 = pyramid(im1)
        c2 = pyramid(im2)
        flows = {}

        def dense_decoder(x, lvl):
            srcs = x if isinstance(x, tuple) else (x,)
            if self.concat_decoder:
                srcs = (jnp.concatenate(srcs, -1),) if len(srcs) > 1 else srcs
            for i, feat in enumerate([128, 128, 96, 64, 32]):
                y = conv(feat, f"conv{lvl}_{i}")(srcs)
                srcs = (y,) + srcs
                if self.concat_decoder:
                    srcs = (jnp.concatenate(srcs, -1),)
            flow = TorchConv(2, 3, 1, name=f"predict_flow{lvl}")(srcs)
            return srcs, flow

        corr6 = correlate_pwc(c1[5], c2[5])
        x, flow6 = dense_decoder(leaky_relu(corr6), 6)
        up_flow = deconv(2, "deconv6")(flow6)
        up_feat = deconv(2, "upfeat6")(x)
        flows[6] = flow6

        for lvl in (5, 4, 3, 2):
            i = lvl - 1
            if self.no_warp:
                warped = c2[i]
            else:
                warped = warp_backward(
                    c2[i], up_flow * _WARP_SCALE[lvl], mode="zeros_mask"
                )
            if self.no_corr:
                corr = jnp.zeros(c1[i].shape[:3] + (81,), c1[i].dtype) + (
                    jnp.mean(warped, axis=-1, keepdims=True)
                )
            else:
                corr = correlate_pwc(c1[i], warped)
            corr = leaky_relu(corr)
            if self.no_barrier:
                x = (corr, c1[i], up_flow, up_feat)
            else:
                x = jax.lax.optimization_barrier(
                    (corr, c1[i], up_flow, up_feat)
                )
            x, flow = dense_decoder(x, lvl)
            flows[lvl] = flow
            if lvl > 2:
                up_flow = deconv(2, f"deconv{lvl}")(flow)
                up_feat = deconv(2, f"upfeat{lvl}")(x)

        if not self.no_context:
            y = conv(128, "dc_conv1")(x)
            y = conv(128, "dc_conv2", dilation=2)(y)
            y = conv(128, "dc_conv3", dilation=4)(y)
            y = conv(96, "dc_conv4", dilation=8)(y)
            y = conv(64, "dc_conv5", dilation=16)(y)
            y = conv(32, "dc_conv6")(y)
            flows[2] = flows[2] + TorchConv(2, 3, 1, name="dc_conv7")(y)

        if self.no_up4:
            return 20.0 * flows[2]
        B, H, W, _ = flows[2].shape
        return 20.0 * resize_bilinear(flows[2], 4 * H, 4 * W,
                                      align_corners=False)


def main():
    enable_compilation_cache()
    B, H, W = 8, 384, 1280
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    variants = [
        ("full", {}),
        ("no_up4", {"no_up4": True}),
        ("no_warp", {"no_warp": True}),
        ("no_corr", {"no_corr": True}),
        ("no_context", {"no_context": True}),
        ("no_barrier", {"no_barrier": True}),
        ("concat_decoder", {"concat_decoder": True}),
        ("no_warp+no_corr", {"no_warp": True, "no_corr": True}),
    ]
    base = None
    for name, kw in variants:
        mod = PWCKnock(**kw)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), a[:1, :128, :128],
                              b[:1, :128, :128])
        fn = jax.jit(mod.apply)
        dt = timed_loop(lambda x, y, vv: fn(vv, x, y), (a, b, v), n=15)
        ms = dt * 1000
        if name == "full":
            base = ms
            print(f"{name:16s}: {ms:7.2f} ms", flush=True)
        else:
            print(f"{name:16s}: {ms:7.2f} ms  (delta {base - ms:+6.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
