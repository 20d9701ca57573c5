"""Phase ablation of the alt_lookup_bwd kernel at the RAFT train geometry.

Variants replace one phase with a cheap stand-in (nothing DCE-able: every
variant still writes both outputs from data-dependent values), so the
difference vs `full` prices that phase:

  full     - the production kernel
  nohats   - selector hats replaced by a constant-broadcast (prices the
             VPU hat build)
  noU      - the two tq-batched M=16 U dots replaced by a broadcast
             (prices the batched-small-dot overhead)
  nobig    - t1/d2 hl-batched dots replaced by cheap reductions (prices
             the two big MXU dots)
  notrans  - U transpose replaced by a 1-slice broadcast (prices the
             (tq,Hl,Wl)->(Hl,tq,Wl) VMEM transpose)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bwd_kernel_ablate.py
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
    TILE_P,
    _hat_selector,
    pool_fmap_levels,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()

B, H, W, C = 4, 36, 120, 256
N = H * W
R = 4
L = 4
n = 2 * R + 1
TILE = 128
rng = np.random.RandomState(0)

f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
levels = tuple(l.astype(jnp.bfloat16) for l in pool_fmap_levels(f2, L))
shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
grid = np.stack(
    np.meshgrid(np.arange(W), np.arange(H), indexing="xy"), -1
).reshape(N, 2)[None].astype(np.float32)
coords = jnp.asarray(grid + rng.randn(B, N, 2).astype(np.float32) * 60)
g = np.zeros((B, N, 16, L, 16), np.float32)
g[:, :, :n, :, :n] = rng.randn(B, N, n, L, n)
g = jnp.asarray(g.reshape(B, N, 16, L * 16)).astype(jnp.bfloat16)


def kernel(cy_ref, cx_ref, f1_ref, g_ref, *rest, variant):
    sel_dtype = jnp.bfloat16
    f2_refs = rest[:L]
    df1_ref = rest[L]
    df2_refs = rest[L + 1:]
    f1t = f1_ref[0]
    tq = f1t.shape[0]
    cy0 = cy_ref[0]
    cx0 = cx_ref[0]
    df1_acc = jnp.zeros((tq, C), jnp.float32)
    for lvl, (hl, wl) in enumerate(shapes):
        inv = 1.0 / (2 ** lvl)
        cy = jnp.clip(cy0 * inv - n // 2, -2.0 * TILE_P, hl + 2.0)
        cx = jnp.clip(cx0 * inv - n // 2, -2.0 * TILE_P, wl + 2.0)
        if variant == "nohats":
            # skip the abs/relu hat shaping, keep the iota+center adds:
            # prices the VPU hat *math* (the broadcasts stay)
            gg = lax.broadcasted_iota(
                jnp.int32, (tq, TILE_P, wl), 2).astype(jnp.float32)
            scol = (gg + cx).astype(sel_dtype)
            gg = lax.broadcasted_iota(
                jnp.int32, (tq, TILE_P, hl), 2).astype(jnp.float32)
            srow = (gg + cy).astype(sel_dtype)
        else:
            scol = _hat_selector(cx, wl, tq, sel_dtype)
            srow = _hat_selector(cy, hl, tq, sel_dtype)
        g_l = g_ref[0][:, :, lvl * TILE_P:(lvl + 1) * TILE_P].astype(
            sel_dtype)
        if variant == "noU":
            # single sublane-only broadcast of real selector data (Mosaic
            # rejects dual-dim broadcasts and folds chained ones)
            U = jnp.broadcast_to(scol[:, :1, :], (tq, hl, wl))
        else:
            tmp = lax.dot_general(
                g_l, scol,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(sel_dtype)
            U = lax.dot_general(
                srow, tmp,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(sel_dtype)
        if variant == "notrans":
            Uh = jnp.broadcast_to(
                jnp.transpose(U[:, :1, :], (1, 0, 2)), (hl, tq, wl))
        else:
            Uh = jnp.transpose(U, (1, 0, 2))
        if variant == "nobig":
            df1_acc = df1_acc + jnp.broadcast_to(
                jnp.sum(U, axis=(1, 2))[:, None], (tq, C)
            ).astype(jnp.float32)
            d2 = jnp.broadcast_to(
                jnp.sum(Uh, axis=1)[:, :, None].astype(jnp.float32),
                (hl, wl, C))
        else:
            t1 = lax.dot_general(
                Uh, f2_refs[lvl][0],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            df1_acc = df1_acc + jnp.sum(t1, axis=0)
            f1e = jnp.broadcast_to(f1t[None], (hl, tq, C))
            d2 = lax.dot_general(
                Uh, f1e,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        @pl.when(pl.program_id(1) == 0)
        def _():
            df2_refs[lvl][0] = d2

        @pl.when(pl.program_id(1) > 0)
        def _():
            df2_refs[lvl][0] = df2_refs[lvl][0] + d2

    df1_ref[0] = df1_acc


@functools.partial(jax.jit, static_argnames=("variant",))
def run(f1_, coords_, g_, variant):
    padn = (-N) % TILE
    f1p = jnp.pad(f1_, ((0, 0), (0, padn), (0, 0)))
    cpad = jnp.pad(coords_, ((0, 0), (0, padn), (0, 0)))
    gp = jnp.pad(g_, ((0, 0), (0, padn), (0, 0), (0, 0)))
    np_ = f1p.shape[1]
    cx = cpad[..., 0].astype(jnp.float32)[..., None, None]
    cy = cpad[..., 1].astype(jnp.float32)[..., None, None]
    outs = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(B, np_ // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 1, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 1, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, TILE_P, L * TILE_P),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for hl, wl in shapes
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, hl, wl, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for hl, wl in shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, np_, C), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct((B,) + sh + (C,), jnp.float32)
            for sh in shapes
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(cy, cx, f1p, gp, *levels)
    return outs[0]


for variant in ("notrans",):
    dt = timed_loop(lambda a, b_, c: run(a, b_, c, variant),
                    (f1, coords, g), n=20)
    print(f"{variant:8s} {dt*1e3:7.3f} ms/iter", flush=True)
