"""PWC glue costs not covered by pwc_decomp.py: the upfeat/deconv
transpose-convs and the context-net entry, tuple-split vs materialized
concat, at the real level shapes (b8, 384x1280 input).

The zoo re-measurement after the tuple-split change showed PWC regressing
59.7 -> 71 ms e2e while the decoder chains measure split ~= concat
standalone; the deconvs were never measured split.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_glue_ablate.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

B = 8
rng = np.random.RandomState(0)


def rnd(*s):
    return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)


# decoder srcs channel stacks: (32, 64, 96, 128, 128, cin)
LVL = {6: (6, 20, 81), 5: (12, 40, 213), 4: (24, 80, 181),
       3: (48, 160, 149), 2: (96, 320, 117)}


def deconv_lhs(x, w):
    return lax.conv_general_dilated(
        x, w[::-1, ::-1], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench(tag, fn, args, n=30):
    dt = timed_loop(fn, args, n=n)
    print(f"{tag}: {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    enable_compilation_cache()
    tot = {"split": 0.0, "concat": 0.0}
    for lvl in (6, 5, 4, 3):
        h, w, cin = LVL[lvl]
        chs = (32, 64, 96, 128, 128, cin)
        srcs = tuple(rnd(B, h, w, c) for c in chs)
        ctot = sum(chs)
        k = rnd(4, 4, ctot, 2)

        def up_split(*ss):
            y = None
            off = 0
            for s in ss:
                kk = k[:, :, off:off + s.shape[-1]]
                yk = deconv_lhs(s, kk)
                y = yk if y is None else y + yk
                off += s.shape[-1]
            return y

        def up_concat(*ss):
            return deconv_lhs(jnp.concatenate(ss, -1), k)

        # x2: upfeat + deconv(flow) is cheap; two upfeats per level pair
        a = bench(f"upfeat L{lvl} split ", jax.jit(up_split), srcs)
        b = bench(f"upfeat L{lvl} concat", jax.jit(up_concat), srcs)
        tot["split"] += a
        tot["concat"] += b
    print(f"upfeat totals: split {tot['split']*1000:.2f} ms, "
          f"concat {tot['concat']*1000:.2f} ms", flush=True)

    # context entry at L2 (96x320, 565 ch over 6 sources)
    h, w, cin = LVL[2]
    chs = (32, 64, 96, 128, 128, cin)
    srcs = tuple(rnd(B, h, w, c) for c in chs)
    k = rnd(3, 3, sum(chs), 128)

    def dc_split(*ss):
        y = None
        off = 0
        for s in ss:
            yk = conv3(s, k[:, :, off:off + s.shape[-1]])
            y = yk if y is None else y + yk
            off += s.shape[-1]
        return y

    def dc_concat(*ss):
        return conv3(jnp.concatenate(ss, -1), k)

    bench("dc_conv1 split ", jax.jit(dc_split), srcs)
    bench("dc_conv1 concat", jax.jit(dc_concat), srcs)

    # predict_flow at L2
    kf = rnd(3, 3, sum(chs), 2)

    def pf_split(*ss):
        y = None
        off = 0
        for s in ss:
            yk = conv3(s, kf[:, :, off:off + s.shape[-1]])
            y = yk if y is None else y + yk
            off += s.shape[-1]
        return y

    def pf_concat(*ss):
        return conv3(jnp.concatenate(ss, -1), kf)

    bench("predflow2 split ", jax.jit(pf_split), srcs)
    bench("predflow2 concat", jax.jit(pf_concat), srcs)


if __name__ == "__main__":
    main()
