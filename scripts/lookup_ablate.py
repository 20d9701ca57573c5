"""Phase ablation for the fused corr lookup kernel at RAFT KITTI geometry.

Times hacked kernel variants with one phase stubbed out (shapes and
dataflow preserved, semantics intentionally broken) to attribute the
6.3 ms/iter budget: corr dots vs corrH transposes vs hat builds vs
selector contractions.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lookup_ablate.py
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
    TILE_P,
    _hat_selector,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop


def _kernel(cy_ref, cx_ref, f1_ref, *rest, shapes, tq, n, mode):
    sel_dtype = jnp.bfloat16
    L = len(shapes)
    f2_refs, out_ref = rest[:L], rest[L]
    f1t = f1_ref[0]
    C = f1t.shape[1]
    cy0 = cy_ref[0]
    cx0 = cx_ref[0]

    for lvl, (hl, wl) in enumerate(shapes):
        inv = 1.0 / (2 ** lvl)
        cy = jnp.clip(cy0 * inv - n // 2, -2.0 * TILE_P, hl + 2.0)
        cx = jnp.clip(cx0 * inv - n // 2, -2.0 * TILE_P, wl + 2.0)

        if mode == "nocorr":
            # skip the corr dot AND its transpose: fabricate corr from f1
            corr = (jnp.broadcast_to(
                jnp.sum(f1t, axis=1)[:, None, None], (tq, hl, wl)
            ) * cy).astype(sel_dtype)
        else:
            f1e = jnp.broadcast_to(f1t[None], (hl, tq, C))
            corrH = lax.dot_general(
                f1e, f2_refs[lvl][0],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=(
                    jnp.bfloat16 if mode == "corrbf16" else jnp.float32
                ),
            )  # (Hl, tq, Wl)
            if mode == "notranspose":
                # consume corrH without the major-dims transpose: reduce
                # over the leading dim so the dot is not DCE'd, then
                # broadcast back to the (tq, hl, wl) the selectors expect
                red = jnp.sum(corrH, axis=0).astype(sel_dtype)  # (tq, Wl)
                corr = jnp.broadcast_to(red[:, None, :], (tq, hl, wl))
            elif mode in ("castfirst", "corrbf16"):
                # cast to bf16 BEFORE the major-dims transpose (halves the
                # relayout bytes); corrbf16 additionally emits bf16 from
                # the MXU directly
                corr = jnp.transpose(corrH.astype(sel_dtype), (1, 0, 2))
            else:
                corr = jnp.transpose(corrH, (1, 0, 2)).astype(sel_dtype)

        if mode == "nohats":
            scol = jnp.broadcast_to(
                cx.astype(sel_dtype), (tq, TILE_P, wl)
            )
            srow = jnp.broadcast_to(
                cy.astype(sel_dtype), (tq, TILE_P, hl)
            )
        else:
            scol = _hat_selector(cx, wl, tq, sel_dtype)
            srow = _hat_selector(cy, hl, tq, sel_dtype)

        if mode == "nosel":
            out_l = jnp.broadcast_to(
                (jnp.sum(corr, axis=(1, 2))
                 + jnp.sum(scol, axis=(1, 2))
                 + jnp.sum(srow, axis=(1, 2)))[:, None, None].astype(
                    jnp.float32),
                (tq, TILE_P, TILE_P),
            )
        elif mode == "selB":
            # swapped contraction order: M=16 scol dot with N=hl lanes
            cols = lax.dot_general(
                scol, corr,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(sel_dtype)  # (tq, P[s], Hl)
            out_l = lax.dot_general(
                srow, cols,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (tq, P[t], P[s]) -- transposed vs A, fine for timing
        elif mode == "selrowfirst":
            # srow first (N=wl lanes), then the tiny scol dot
            tmp = lax.dot_general(
                srow, corr,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(sel_dtype)  # (tq, P[t], Wl)
            out_l = lax.dot_general(
                tmp, scol,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (tq, P[t], P[s])
        else:
            if hl > TILE_P:
                colsT = lax.dot_general(
                    corr, scol,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(sel_dtype)  # (tq, Hl, P[s])
                out_l = lax.dot_general(
                    srow, colsT,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            else:
                cols = lax.dot_general(
                    scol, corr,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(sel_dtype)
                out_l = lax.dot_general(
                    srow, cols,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        out_ref[0, :, :, lvl * TILE_P:(lvl + 1) * TILE_P] = out_l.astype(
            jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("radius", "tile", "mode"))
def lookup_variant(f1, f2_levels, coords, radius, tile=256, mode="base"):
    n = 2 * radius + 1
    B, N, C = f1.shape
    shapes = tuple((f.shape[1], f.shape[2]) for f in f2_levels)
    cx = coords[..., 0].astype(jnp.float32)[..., None, None]
    cy = coords[..., 1].astype(jnp.float32)[..., None, None]
    L = len(shapes)
    return pl.pallas_call(
        functools.partial(_kernel, shapes=shapes, tq=tile, n=n, mode=mode),
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for hl, wl in shapes
        ],
        out_specs=pl.BlockSpec((1, tile, TILE_P, L * TILE_P),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, TILE_P, L * TILE_P),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(cy, cx, f1, *f2_levels)


def main():
    enable_compilation_cache()
    B, H, W, C = 8, 48, 160, 256
    N = H * W
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(
        jnp.bfloat16)
    levels = []
    h, w = H, W
    for _ in range(4):
        levels.append(jnp.asarray(
            rng.randn(B, h, w, C).astype(np.float32)).astype(jnp.bfloat16))
        h, w = h // 2, w // 2
    levels = tuple(levels)
    coords = jnp.asarray(np.stack(
        [rng.rand(B, N) * W, rng.rand(B, N) * H], -1).astype(np.float32))

    for mode in ("base", "castfirst", "corrbf16", "selB", "selrowfirst",
                 "nosel", "nohats", "notranspose", "nocorr"):
        dt = timed_loop(
            lambda f, c: lookup_variant(f, levels, c, 4, mode=mode),
            (f1, coords), n=30)
        print(f"{mode:12s}: {dt*1000:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
