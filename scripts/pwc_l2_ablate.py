"""PWC level-2 hot-op ablations at b8 96x320 (the two dominant costs in
scripts/pwc_decomp.py: corr 10.1 ms, warp 13.9 ms).

corr variants (patch 9, dilation 1, C=32):
  * band     — production banded-MXU path (full (W, V) row matmul + selector)
  * blocked  — band restricted to 128-col blocks with a +-4 halo slab
  * shift    — 81 shifted multiply-reduces (VPU)
warp variants (C=32, zeros_mask):
  * gather   — production fallback (scalar gathers)
  * tiled r8/r16/r32 — warp_tile kernel at various slab radii

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pwc_l2_ablate.py
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.ops import (
    spatial_correlation,
    warp_backward,
)
from understanding_flow_robustness_tpu.ops.correlation import _shift2d
from understanding_flow_robustness_tpu.ops.interp import (
    coords_grid,
    unnormalize_coords,
)
from understanding_flow_robustness_tpu.ops.pallas.warp_tile import (
    warp_tiled_sample,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

B, H, W, C = 8, 96, 320, 32
P = 9
rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))


@jax.jit
def corr_band(a, b):
    return spatial_correlation(a, b, patch_size=P, impl="band")


@jax.jit
def corr_shift(a, b):
    return spatial_correlation(a, b, patch_size=P, impl="shift")


def _corr_blocked(a, b, block=128):
    rad = (P - 1) // 2
    outs = []
    for p in range(P):
        du = p - rad
        bs = _shift2d(b, du, 0)
        blocks = []
        for w0 in range(0, W, block):
            w1 = min(w0 + block, W)
            lo = max(w0 - rad, 0)
            hi = min(w1 + rad, W)
            e = jnp.einsum(
                "bhwc,bhvc->bhwv", a[:, :, w0:w1], bs[:, :, lo:hi],
                preferred_element_type=jnp.float32,
            )
            sel = _band_selector_block(w0, w1, lo, hi)
            blocks.append(jnp.einsum("bhwv,wvp->bhwp", e, sel))
        outs.append(jnp.concatenate(blocks, axis=2))
    out = jnp.stack(outs, axis=3)
    return out.reshape(B, H, W, P * P).astype(a.dtype)


@functools.lru_cache(maxsize=None)
def _band_selector_block(w0, w1, lo, hi):
    rad = (P - 1) // 2
    w = np.arange(w0, w1)[:, None]
    tgt = w + (np.arange(P) - rad)[None, :]
    sel = np.zeros((w1 - w0, hi - lo, P), np.float32)
    valid = (tgt >= lo) & (tgt < hi)
    wi, pi = np.nonzero(valid)
    sel[wi, tgt[wi, pi] - lo, pi] = 1.0
    return jnp.asarray(sel)


corr_blocked = jax.jit(_corr_blocked)


def main():
    enable_compilation_cache()
    ref = np.asarray(corr_band(f1, f2))
    for name, fn in (("band", corr_band), ("blocked", corr_blocked),
                     ("shift", corr_shift)):
        got = np.asarray(fn(f1, f2))
        err = np.abs(got - ref).max()
        dt = timed_loop(fn, (f1, f2), n=30)
        print(f"corr {name:8s}: {dt*1000:7.2f} ms  maxerr={err:.2e}",
              flush=True)

    # ---- warp ----
    flow = jnp.asarray((rng.randn(B, H, W, 2) * 3.0).astype(np.float32))

    @jax.jit
    def warp_prod(img, fl):
        return warp_backward(img, fl, mode="zeros_mask")

    ref = np.asarray(warp_prod(f2, flow))
    dt = timed_loop(warp_prod, (f2, flow), n=30)
    print(f"warp gather(auto): {dt*1000:7.2f} ms", flush=True)

    base = coords_grid(H, W, dtype=jnp.float32)[None]

    def coords(fl):
        x = base[..., 0] + fl[..., 0]
        y = base[..., 1] + fl[..., 1]
        gx = 2.0 * x / (W - 1) - 1.0
        gy = 2.0 * y / (H - 1) - 1.0
        return unnormalize_coords(gx, gy, H, W, align_corners=False)

    for r in (8, 16, 32):
        @jax.jit
        def warp_tiled(img, fl, r=r):
            px, py = coords(fl)
            ones = jnp.ones_like(img[..., :1])
            both, viol = warp_tiled_sample(
                jnp.concatenate([img, ones], -1), py, px,
                ry=r, rx=r, zeros_mode=True,
            )
            out, mask = both[..., :-1], both[..., -1:]
            return out * (mask >= 1e-4).astype(img.dtype), viol

        got, viol = warp_tiled(f2, flow)
        err = np.abs(np.asarray(got) - ref).max()
        dt = timed_loop(lambda a, b: warp_tiled(a, b)[0], (f2, flow), n=30)
        print(f"warp tiled r{r:2d}:   {dt*1000:7.2f} ms  maxerr={err:.2e} "
              f"viol={int(viol)}", flush=True)


if __name__ == "__main__":
    main()
