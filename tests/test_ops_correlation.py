"""Parity tests for correlation ops.

The spatial correlation is checked against a literal numpy transcription of
the reference C++ semantics (correlation.cpp:8-124) — the same role as the
vendored extension's ``check.py``/``grad_check.py`` — and RAFT's all-pairs
corr + lookup against a torch oracle of models/raft/corr.py:26-106.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from understanding_flow_robustness_tpu import ops

RNG = np.random.RandomState(1)


def naive_spatial_correlation(
    f1, f2, patch_size, kernel_size=1, stride=1, padding=0,
    dilation=1, dilation_patch=1,
):
    """Literal numpy port of correlation.cpp:75-124 (NHWC in/out)."""
    B, H, W, C = f1.shape
    rad = (patch_size - 1) // 2
    dil_k = (kernel_size - 1) * dilation + 1
    oH = (H + 2 * padding - dil_k) // stride + 1
    oW = (W + 2 * padding - dil_k) // stride + 1
    out = np.zeros((B, oH, oW, patch_size * patch_size), np.float32)
    for b in range(B):
        for pu in range(patch_size):
            su = (pu - rad) * dilation_patch
            for pv in range(patch_size):
                sv = (pv - rad) * dilation_patch
                p = pu * patch_size + pv
                for h in range(oH):
                    for w in range(oW):
                        u = -padding + h * stride
                        v = -padding + w * stride
                        acc = 0.0
                        for ki in range(kernel_size):
                            i1 = u + ki * dilation
                            i2 = i1 + su
                            if not (0 <= i1 < H and 0 <= i2 < H):
                                continue
                            for kj in range(kernel_size):
                                j1 = v + kj * dilation
                                j2 = j1 + sv
                                if not (0 <= j1 < W and 0 <= j2 < W):
                                    continue
                                acc += float(
                                    np.dot(f1[b, i1, j1], f2[b, i2, j2])
                                )
                        out[b, h, w, p] = acc
    return out


@pytest.mark.parametrize("impl", ["band", "shift"])
@pytest.mark.parametrize("patch,dil_patch", [(5, 1), (5, 2), (9, 1)])
def test_spatial_correlation_k1(impl, patch, dil_patch):
    f1 = RNG.randn(2, 6, 10, 4).astype(np.float32)
    f2 = RNG.randn(2, 6, 10, 4).astype(np.float32)
    ours = ops.spatial_correlation(
        jnp.asarray(f1), jnp.asarray(f2),
        patch_size=patch, dilation_patch=dil_patch, impl=impl,
    )
    ref = naive_spatial_correlation(f1, f2, patch, dilation_patch=dil_patch)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_spatial_correlation_band_blocked_wide_rows():
    """The blocked-band path (query-column blocks + halo slab) activates
    only for W >= 2 * (128 + patch halo); it must stay BIT-identical to
    the full-row band (the selector is one-hot over v, so blocking never
    changes the contraction).  PWC level-2 geometry, downscaled batch."""
    from understanding_flow_robustness_tpu.ops.correlation import (
        _BAND_BLOCK,
        _corr_k1_band,
    )

    W = 2 * (_BAND_BLOCK + 2 * 4) + 16  # just past the blocking threshold
    f1 = jnp.asarray(RNG.randn(1, 4, W, 8).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(1, 4, W, 8).astype(np.float32))
    blocked = np.asarray(_corr_k1_band(f1, f2, 9, 1))
    shift = np.asarray(
        ops.spatial_correlation(f1, f2, patch_size=9, impl="shift")
    )
    np.testing.assert_allclose(blocked, shift, atol=1e-4)
    # and against the literal C++ transcription
    ref = naive_spatial_correlation(np.asarray(f1), np.asarray(f2), 9)
    np.testing.assert_allclose(blocked, ref, atol=1e-4)


@pytest.mark.parametrize(
    "kernel,stride,padding,dilation",
    [(3, 1, 1, 1), (3, 2, 1, 1), (1, 2, 0, 1), (3, 1, 2, 2)],
)
def test_spatial_correlation_general(kernel, stride, padding, dilation):
    f1 = RNG.randn(1, 8, 9, 3).astype(np.float32)
    f2 = RNG.randn(1, 8, 9, 3).astype(np.float32)
    ours = ops.spatial_correlation(
        jnp.asarray(f1), jnp.asarray(f2),
        patch_size=3, kernel_size=kernel, stride=stride,
        padding=padding, dilation=dilation, dilation_patch=2,
    )
    ref = naive_spatial_correlation(
        f1, f2, 3, kernel, stride, padding, dilation, 2
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_spatial_correlation_gradcheck():
    """Finite-difference gradient check (role of grad_check.py).

    Tolerance 2e-2, NOT the reference gradcheck's double-precision bars:
    the op's contractions run in f32 internally (even under x64 — round-4
    measurement: f64 inputs still produce ~2e-4 FD-vs-VJP residue), so
    finite differences carry f32 quantization noise; a structurally wrong
    backward is off by O(1), which 2e-2 still catches.  Local seeded rng,
    not the file-global RNG: the old 1e-3 bar was draw-dependent and
    flipped red when the fast lane changed test selection (and with it
    the global stream position)."""
    from jax.test_util import check_grads

    rng = np.random.RandomState(3)

    def fn(a, b):
        return jnp.sum(
            jnp.sin(ops.spatial_correlation(a, b, patch_size=3, dilation_patch=2))
        )

    f1 = jnp.asarray(rng.randn(1, 5, 6, 3).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 5, 6, 3).astype(np.float32))
    check_grads(fn, (f1, f2), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_all_pairs_correlation_matches_torch():
    B, H, W, C = 2, 6, 8, 16
    f1 = RNG.randn(B, H, W, C).astype(np.float32)
    f2 = RNG.randn(B, H, W, C).astype(np.float32)
    ours = ops.all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))

    t1 = torch.from_numpy(np.transpose(f1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(f2, (0, 3, 1, 2)))
    a = t1.view(B, C, H * W)
    b = t2.view(B, C, H * W)
    ref = torch.matmul(a.transpose(1, 2), b) / np.sqrt(C)
    ref = ref.view(B, H * W, H, W).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def _torch_bilinear_sampler(img, coords):
    """models/raft/utils/utils.py:64-76."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def test_corr_lookup_matches_torch_corrblock():
    """Oracle: torch re-execution of CorrBlock.__call__ (corr.py:72-96)."""
    B, H, W, C = 1, 8, 8, 8
    levels, r = 3, 2
    f1 = RNG.randn(B, H, W, C).astype(np.float32)
    f2 = RNG.randn(B, H, W, C).astype(np.float32)
    coords = (
        RNG.rand(B, H, W, 2) * np.array([W, H]) - 0.5
    ).astype(np.float32)

    corr0 = ops.all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    pyr = ops.corr_pyramid(corr0, num_levels=levels)
    ours = ops.corr_lookup(pyr, jnp.asarray(coords), radius=r)

    # torch oracle
    t1 = torch.from_numpy(np.transpose(f1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(f2, (0, 3, 1, 2)))
    corr = torch.matmul(
        t1.view(B, C, H * W).transpose(1, 2), t2.view(B, C, H * W)
    ) / float(np.sqrt(C))
    corr = corr.view(B * H * W, 1, H, W)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    coords_t = torch.from_numpy(coords)
    out_pyramid = []
    for i in range(levels):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords_t.reshape(B * H * W, 1, 1, 2) / 2 ** i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        sampled = _torch_bilinear_sampler(pyramid[i], coords_lvl)
        out_pyramid.append(sampled.view(B, H, W, -1))
    ref = torch.cat(out_pyramid, dim=-1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_corr_lookup_mxu_matches_gather():
    """The MXU one-hot-selector lookup must match the gather formulation
    exactly, including far out-of-volume coordinates."""
    B, H, W, C = 2, 8, 16, 8
    f1 = RNG.randn(B, H, W, C).astype(np.float32)
    f2 = RNG.randn(B, H, W, C).astype(np.float32)
    corr0 = ops.all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    pyr = ops.corr_pyramid(corr0, num_levels=3)

    coords = (RNG.rand(B, H, W, 2) * np.array([W, H]) - 0.5).astype(np.float32)
    # inject wild out-of-volume coords
    coords[0, 0, 0] = [-50.0, -50.0]
    coords[0, 0, 1] = [500.0, 500.0]
    coords[0, 1, 0] = [-5.5, 3.2]
    coords[0, 1, 1] = [W + 3.9, H + 4.9]
    coords_j = jnp.asarray(coords)

    ref = ops.corr_lookup(pyr, coords_j, radius=4, impl="gather")
    got = ops.corr_lookup(pyr, coords_j, radius=4, impl="mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_corr_lookup_mxu_grad():
    B, H, W, C = 1, 8, 8, 4
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    coords = jnp.asarray(
        (RNG.rand(B, H, W, 2) * np.array([W, H])).astype(np.float32)
    )

    def loss(a, b, c):
        corr0 = ops.all_pairs_correlation(a, b)
        pyr = ops.corr_pyramid(corr0, num_levels=2)
        return jnp.sum(ops.corr_lookup(pyr, c, radius=2) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(f1, f2, coords)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_corr_lookup_fused_interpret_matches_gather():
    """Production fused Pallas lookup (ops/pallas/corr_lookup_fused.py) vs
    the gather formulation, in Mosaic interpret mode so it runs on CPU.
    Includes far out-of-volume and boundary-straddling centers."""
    from understanding_flow_robustness_tpu.ops.pallas.corr_lookup_fused import (
        corr_lookup_pallas,
    )

    B, H, W, C = 2, 16, 24, 16
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    corr0 = ops.all_pairs_correlation(f1, f2)
    pyr = ops.corr_pyramid(corr0, 4)
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 3
    coords[0, 0, 0] = [-50, -50]
    coords[0, 0, 1] = [500, 500]
    coords[0, 0, 2] = [-3.5, -3.5]   # straddles the volume edge
    coords[0, 0, 3] = [W - 0.25, H - 0.25]
    coords = jnp.asarray(coords.astype(np.float32))
    ref = ops.corr_lookup(pyr, coords, 4, impl="gather")
    got = corr_lookup_pallas(pyr, coords, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_corr_lookup_fused_on_tpu():
    """On real TPU hardware: the compiled fused kernel (bf16 volume) vs
    gather, and the custom-vjp gradient path stays finite."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    B, H, W, C = 1, 16, 32, 16
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    corr0 = ops.all_pairs_correlation(f1, f2)
    pyr = ops.corr_pyramid(corr0, 4)
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 3
    coords = jnp.asarray(coords.astype(np.float32))
    ref = np.asarray(ops.corr_lookup(pyr, coords, 4, impl="gather"))
    got = np.asarray(ops.corr_lookup(pyr, coords, 4, impl="pallas"))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    gotb = np.asarray(ops.corr_lookup(
        pyr, coords, 4, impl="pallas", compute_dtype=jnp.bfloat16))
    rel = np.abs(gotb - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 2e-2

    def loss(c):
        return jnp.sum(ops.corr_lookup(pyr, c, 4, impl="pallas") ** 2)

    g = jax.grad(loss)(coords)
    assert np.isfinite(np.asarray(g)).all()

def test_alt_corr_features_interpret_matches_gather():
    """Fused on-demand lookup (ops/pallas/alt_corr.py — the TPU
    alt_cuda_corr, models/raft/corr.py:109-137) vs the explicit
    volume+pyramid+gather composition, in interpret mode on CPU.  Covers
    out-of-volume and edge-straddling centers, both output layouts, and
    the custom-vjp gradients against the jnp reference's."""
    from understanding_flow_robustness_tpu.ops.correlation import (
        _alt_corr_reference,
    )

    B, H, W, C = 2, 16, 24, 16
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 3
    coords[0, 0, 0] = [-50, -50]
    coords[0, 0, 1] = [500, 500]
    coords[0, 0, 2] = [-3.5, -3.5]
    coords[0, 0, 3] = [W - 0.25, H - 0.25]
    coords = jnp.asarray(coords.astype(np.float32))

    corr0 = ops.all_pairs_correlation(f1, f2)
    pyr = ops.corr_pyramid(corr0, 4)
    ref = np.asarray(ops.corr_lookup(pyr, coords, 4, impl="gather"))
    got = np.asarray(
        ops.alt_corr_features(f1, f2, coords, 4, 4, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # padded 16x16-channel-block layout vs the jnp reference emitter —
    # valid (t, s) positions only; the kernel leaves live hat samples in
    # the padding lanes that consumers weight by zero
    got_p = np.asarray(ops.alt_corr_features(
        f1, f2, coords, 4, 4, padded=True, interpret=True))
    ref_p = np.asarray(_alt_corr_reference(f1, f2, coords, 4, 4, None, True))
    blk_g = got_p.reshape(B, H, W, 16, 4, 16)[..., :9, :, :9]
    blk_r = ref_p.reshape(B, H, W, 16, 4, 16)[..., :9, :, :9]
    np.testing.assert_allclose(blk_g, blk_r, atol=1e-4)

    def loss_alt(a, b, c):
        return jnp.sum(
            ops.alt_corr_features(a, b, c, 2, 2, interpret=True) ** 2)

    def loss_ref(a, b, c):
        return jnp.sum(_alt_corr_reference(a, b, c, 2, 2) ** 2)

    ga = jax.grad(loss_alt, argnums=(0, 1, 2))(f1, f2, coords)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(f1, f2, coords)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-4)


def test_alt_corr_features_sorted_interpret_parity():
    """Deferred-sort lookup (r5): unsorting the sorted output reproduces
    the padded lookup exactly, and the sorted custom-vjp's f1/f2
    gradients — whose cotangent arrives SORTED because the caller
    differentiates through its own unsort — match the reference VJP."""
    from understanding_flow_robustness_tpu.ops.correlation import (
        _alt_corr_reference,
    )

    B, H, W, C = 2, 16, 24, 16
    N = H * W
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    # wild flows: exactly the regime the sort rescues
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2).astype(np.float32) * 12
    coords = jnp.asarray(coords.astype(np.float32))

    out_s, order, inv = ops.alt_corr_features_sorted(
        f1, f2, coords, 4, 4, interpret=True)
    ref_p = np.asarray(ops.alt_corr_features(
        f1, f2, coords, 4, 4, padded=True, interpret=True)).reshape(
            B, N, -1)
    unsorted = np.asarray(jnp.take_along_axis(
        out_s, jnp.asarray(inv)[..., None], axis=1))
    np.testing.assert_allclose(unsorted, ref_p, atol=1e-4)
    # order/inv really are inverse permutations
    o, iv = np.asarray(order), np.asarray(inv)
    for b in range(B):
        assert (o[b][iv[b]] == np.arange(N)).all()

    # gradients: consume the sorted output the way RAFT does (per-query
    # projection in sorted order, then unsort the SMALL activation).
    # The projection must zero-weight the padding lanes (t or s >= 2r+1):
    # they carry LIVE hat samples on the kernel path and zeros on the
    # reference path — the documented padded-layout invariant.
    def masked_proj(L, n, cols=8):
        Cp = 16 * L * 16
        w = RNG.randn(Cp, cols).astype(np.float32)
        ch = np.arange(Cp)
        t, s = ch // (L * 16), ch % 16
        w[(t >= n) | (s >= n)] = 0.0
        return jnp.asarray(w)

    proj = masked_proj(2, 5)  # L=2 levels, radius 2 -> n=5 below

    def loss_sorted(a, b, c):
        s, _, iv2 = ops.alt_corr_features_sorted(a, b, c, 2, 2,
                                                 interpret=True)
        act = jnp.einsum("bnc,cf->bnf", s.astype(jnp.float32),
                         proj[: s.shape[-1]])
        act = jnp.take_along_axis(act, iv2[..., None], axis=1)
        return jnp.sum(act ** 2)

    def loss_ref(a, b, c):
        r = _alt_corr_reference(a, b, c, 2, 2, None, True).reshape(B, N, -1)
        act = jnp.einsum("bnc,cf->bnf", r.astype(jnp.float32),
                         proj[: r.shape[-1]])
        return jnp.sum(act ** 2)

    ga = jax.grad(loss_sorted, argnums=(0, 1))(f1, f2, coords)
    gr = jax.grad(loss_ref, argnums=(0, 1))(f1, f2, coords)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)


def test_raft_corr_sort_on_tpu():
    """Deferred-sort corr in the full RAFT train path on the chip:
    packed_train forward with corr_sort='defer' must match 'off' (same
    math, permuted kernel schedule), and the sorted train-path gradients
    must match the unsorted ones.

    f32 deliberately (mixed_precision=False): the two modes schedule the
    same reductions differently, and in bf16 the recurrent GRU chain
    amplifies those rounding differences chaotically at random init —
    per-leaf gradient comparisons are only meaningful at f32, where the
    first run of this test measured 147% spurious bf16 deltas while the
    kernel-level bf16 path (test above + ops bisect) is exact."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    from understanding_flow_robustness_tpu.models import fetch_model

    rng = np.random.RandomState(3)
    b, h, w = 2, 64, 96
    i1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)) * 255.0
    i2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)) * 255.0

    outs, grads = {}, {}
    for mode in ("off", "defer"):
        m = fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                        iters=3, corr_sort=mode, mixed_precision=False)

        def fwd(params):
            preds = m.module.apply(
                {"params": params, "batch_stats":
                 m.variables.get("batch_stats", {})},
                i1, i2, train=True, test_mode=False, packed_train=True,
                mutable=["batch_stats"])[0]
            return sum(jnp.sum(p.astype(jnp.float32) ** 2) for p in preds)

        params = m.variables["params"]
        outs[mode] = jax.jit(fwd)(params)
        grads[mode] = jax.jit(jax.grad(fwd))(params)

    a, bv = float(outs["off"]), float(outs["defer"])
    assert abs(a - bv) <= 1e-3 * max(abs(a), 1.0), (a, bv)
    flat_off = jax.tree_util.tree_leaves(grads["off"])
    flat_def = jax.tree_util.tree_leaves(grads["defer"])
    # rel per leaf + abs floor tied to the global gradient magnitude:
    # near-zero-gradient leaves (a bias grad of ~1e-2 among ~1e2 conv
    # grads) otherwise fail on pure reassociation noise
    gscale = max(float(jnp.max(jnp.abs(x))) for x in flat_off)
    for x, y in zip(flat_off, flat_def):
        tol = 2e-2 * float(jnp.max(jnp.abs(x))) + 1e-4 * gscale
        assert float(jnp.max(jnp.abs(x - y))) <= tol


def test_alt_corr_features_on_tpu():
    """Compiled fused on-demand lookup on real TPU hardware: f32 vs gather,
    bf16 relative tolerance, gradient finiteness."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    B, H, W, C = 1, 16, 32, 16
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 3
    coords = jnp.asarray(coords.astype(np.float32))
    corr0 = ops.all_pairs_correlation(f1, f2)
    pyr = ops.corr_pyramid(corr0, 4)
    ref = np.asarray(ops.corr_lookup(pyr, coords, 4, impl="gather"))

    got = np.asarray(ops.alt_corr_features(f1, f2, coords, 4, 4))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    gotb = np.asarray(ops.alt_corr_features(
        f1, f2, coords, 4, 4, compute_dtype=jnp.bfloat16))
    rel = np.abs(gotb - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 2e-2

    def loss(a):
        return jnp.sum(ops.alt_corr_features(a, f2, coords, 4, 4) ** 2)

    g = jax.grad(loss)(f1)
    assert np.isfinite(np.asarray(g)).all()

def test_raft_alt_corr_matches_volume_on_tpu():
    """Model-level: RAFT with the fused on-demand lookup (corr_impl='alt')
    must match the volume-path forward (corr_impl='volume') on TPU."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend")
    from understanding_flow_robustness_tpu.models import fetch_model

    # iters=2: the GRU recurrence amplifies bf16 rounding differences
    # between the two (value-equal) lookup formulations roughly 2x per
    # iteration on random weights, so parity is asserted at low depth.
    mv = fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                     corr_impl="volume", iters=2)
    ma = fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                     corr_impl="alt", iters=2)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    fv = np.asarray(mv.predict(img1, img2))
    fa = np.asarray(ma.module.apply(mv.variables, img1 * 255.0,
                                    img2 * 255.0, test_mode=True)[1])
    assert np.abs(fa - fv).max() < 0.05 * np.abs(fv).max()

def test_alt_corr_features_odd_levels_interpret():
    """Odd feature-map dims: pooling floors (odd trailing row/col dropped,
    F.avg_pool2d semantics) must keep the fused path value-equal to the
    explicit volume pyramid at every level."""
    B, H, W, C = 1, 20, 28, 8  # levels (20,28) (10,14) (5,7) (2,3)
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 2
    coords = jnp.asarray(coords.astype(np.float32))
    corr0 = ops.all_pairs_correlation(f1, f2)
    pyr = ops.corr_pyramid(corr0, 4)
    ref = np.asarray(ops.corr_lookup(pyr, coords, 4, impl="gather"))
    got = np.asarray(
        ops.alt_corr_features(f1, f2, coords, 4, 4, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)

@pytest.mark.parametrize("padded", [False, True])
def test_alt_corr_pallas_backward_matches_reference_vjp(padded):
    """Dedicated volume-free backward kernel (alt_lookup_bwd + the
    derivative-selector dcoords passes) vs the jnp reference VJP, in
    interpret mode on CPU.  Padded-mode cotangents carry zeros at the
    window-padding positions, as both real consumers guarantee."""
    from understanding_flow_robustness_tpu.ops.correlation import (
        _alt_corr_bwd_pallas,
        _alt_corr_reference,
    )

    B, H, W, C = 2, 16, 24, 16
    f1 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    coords = np.asarray(ops.coords_grid(H, W))[None] + RNG.randn(
        B, H, W, 2
    ).astype(np.float32) * 3
    coords[0, 0, 0] = [-50, -50]
    coords[0, 0, 1] = [500, 500]
    coords[0, 0, 2] = [-3.5, -3.5]
    coords = jnp.asarray(coords.astype(np.float32))

    out, vjp = jax.vjp(
        lambda a, b, c: _alt_corr_reference(a, b, c, 4, 4, None, padded),
        f1, f2, coords,
    )
    if padded:
        g5 = RNG.randn(B, H, W, 16, 4, 16).astype(np.float32)
        g5[..., 9:, :, :] = 0
        g5[..., :, :, 9:] = 0
        g = jnp.asarray(g5.reshape(out.shape))
    else:
        g = jnp.asarray(RNG.randn(*out.shape).astype(np.float32))
    ref = vjp(g)
    got = _alt_corr_bwd_pallas(
        f1, f2, coords, g, 4, 4, None, padded, interpret=True
    )
    for r, o in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=2e-4)


def test_corr_lookup_padded_matches_compact():
    """The padded lane-stacked volume lookup must carry the compact
    lookup's values at channel t*(L*16) + l*16 + s (real window
    positions; junk lanes unchecked) and its VJP must equal the mxu
    path's under the zero-junk-cotangent invariant."""
    from understanding_flow_robustness_tpu.ops import (
        all_pairs_correlation,
        corr_lookup,
        corr_lookup_padded,
        corr_pyramid,
    )
    from understanding_flow_robustness_tpu.ops.interp import coords_grid

    rng = np.random.RandomState(3)
    B, H, W, C, L, r = 2, 16, 24, 8, 3, 2
    n = 2 * r + 1
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pyramid = corr_pyramid(all_pairs_correlation(f1, f2), L)
    coords = jnp.asarray(coords_grid(H, W))[None] + jnp.asarray(
        rng.randn(B, H, W, 2).astype(np.float32) * 2
    )

    padded = corr_lookup_padded(tuple(pyramid), coords, r, None,
                                interpret=True)
    compact = corr_lookup(pyramid, coords, r, impl="mxu")
    assert padded.shape == (B, H, W, L * 256)
    p6 = np.asarray(padded).reshape(B, H, W, 16, L, 16)
    c5 = np.asarray(compact).reshape(B, H, W, L, n, n)  # [l, s, t]
    for l in range(L):
        np.testing.assert_allclose(
            p6[..., :n, l, :n], c5[:, :, :, l].transpose(0, 1, 2, 4, 3),
            atol=1e-5,
        )

    # VJP with a junk-zero cotangent == mxu VJP with the compact cotangent
    g = np.zeros((B, H, W, 16, L, 16), np.float32)
    gc = rng.randn(B, H, W, L, n, n).astype(np.float32)  # [l, s, t]
    for l in range(L):
        g[..., :n, l, :n] = gc[:, :, :, l].transpose(0, 1, 2, 4, 3)

    def via_padded(pyr, c):
        out = corr_lookup_padded(tuple(pyr), c, r, None, interpret=True)
        return jnp.sum(out * jnp.asarray(g.reshape(B, H, W, -1)))

    def via_mxu(pyr, c):
        out = corr_lookup(pyr, c, r, impl="mxu")
        gref = np.concatenate(
            [gc[:, :, :, l].reshape(B, H, W, n * n) for l in range(L)],
            axis=-1,
        )
        return jnp.sum(out * jnp.asarray(gref))

    gp = jax.grad(via_padded, argnums=(0, 1))(pyramid, coords)
    gm = jax.grad(via_mxu, argnums=(0, 1))(pyramid, coords)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_padded_window_invariant_helper():
    """ADVICE: the padded layout's t/s >= 2r+1 lanes carry live samples on
    the kernel path; check_padded_window_unused verifies a consumer's
    weights never read them."""
    from understanding_flow_robustness_tpu.ops.correlation import (
        check_padded_window_unused,
    )

    r, L, P = 4, 4, 16
    n = 2 * r + 1
    good = np.zeros((8, P, L * P), np.float32)
    good[:, :n, :] = 1.0
    g5 = good.reshape(8, P, L, P)
    g5[..., n:] = 0.0
    assert check_padded_window_unused(jnp.asarray(g5.reshape(8, P, L * P)), r)
    bad = np.array(g5)
    bad[:, n + 1, 0, 0] = 0.5  # reads a live-padding row
    assert not check_padded_window_unused(
        jnp.asarray(bad.reshape(8, P, L * P)), r
    )


def test_alt_corr_vmem_fallback_large_maps():
    """Oversized feature maps must route to the volume formulation instead
    of compiling an over-budget kernel (ADVICE: size-based fallback)."""
    from understanding_flow_robustness_tpu.ops import correlation as C

    # estimate crosses the budget somewhere between eval and 4x geometry
    small = C._alt_vmem_bytes((1, 48, 160, 256), 4, 4, jnp.bfloat16)
    big = C._alt_vmem_bytes((1, 192, 640, 256), 4, 4, jnp.bfloat16)
    assert small < C._ALT_VMEM_BUDGET < big

    # and the public entry still computes correct values through the
    # fallback (tiny shapes with a forced tiny budget)
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, 8, 12, 16).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 12, 16).astype(np.float32))
    from understanding_flow_robustness_tpu.ops.interp import coords_grid

    coords = jnp.asarray(coords_grid(8, 12))[None]
    ref = C._alt_corr_reference(f1, f2, coords, 2, 2)
    orig = C._ALT_VMEM_BUDGET
    try:
        C._ALT_VMEM_BUDGET = 1
        out = C.alt_corr_features(f1, f2, coords, num_levels=2, radius=2)
    finally:
        C._ALT_VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_alt_lookup_row_slabs_interpret():
    """Flow-following row slabs (ops/pallas/alt_corr.py::default_slabs +
    _slab_meta): at a geometry where slabs activate, smooth coords must
    take the slab branch (ok=1 on every tile) and wild coords must take
    the exact full-extent fallback (ok=0 somewhere) — and BOTH must match
    the no-slab kernel bit-for-bit, since slabbing only skips MXU work
    the hat selectors zero-weight (modulo f32 reduction-tree
    reassociation from the shorter contraction extent)."""
    from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
        _slab_meta,
        alt_lookup,
        default_slabs,
        pool_fmap_levels,
    )

    B, H, W, C = 2, 40, 48, 16
    N = H * W  # 1920: not a multiple of 256, exercises the pad path
    n = 9
    f1 = jnp.asarray(RNG.randn(B, N, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    levels = tuple(pool_fmap_levels(f2, 4))
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    slabs = default_slabs(shapes, 256, n)
    assert slabs[0] > 0, f"slab should activate at this geometry: {slabs}"

    grid = np.asarray(ops.coords_grid(H, W)).reshape(N, 2)[None]

    # smooth flow: within-tile variation well inside the margin
    smooth = jnp.asarray(
        (grid + RNG.randn(B, N, 2).astype(np.float32) * 1.5).astype(
            np.float32))
    # wild flow: +-60 px iid -> needed bands exceed every slab
    wild = jnp.asarray(
        (grid + RNG.randn(B, N, 2).astype(np.float32) * 60).astype(
            np.float32))

    padn = (-N) % 256
    for coords, want_all_ok in ((smooth, True), (wild, False)):
        cpad = jnp.pad(coords, ((0, 0), (0, padn), (0, 0)))
        _, all_ok = _slab_meta(cpad, N, shapes, slabs, 256, n)
        if want_all_ok:
            assert bool(all_ok), "smooth coords must stay inside their slabs"
        else:
            assert not bool(all_ok), "wild coords must trigger the fallback"
        ref = alt_lookup(f1, levels, coords, 4, interpret=True)
        got = alt_lookup(f1, levels, coords, 4, interpret=True,
                         slabs=slabs)
        # compare the real window lanes (padding lanes carry live hat
        # samples whose values legitimately differ between extents)
        gr = np.asarray(ref).reshape(B, N, 16, 4, 16)[:, :, :n, :, :n]
        gg = np.asarray(got).reshape(B, N, 16, 4, 16)[:, :, :n, :, :n]
        np.testing.assert_allclose(gg, gr, atol=1e-4)


def test_alt_lookup_bwd_row_slabs_interpret():
    """Backward row slabs (alt_lookup_bwd(slabs=...)): same dispatch
    contract as the forward — smooth coords take the slab kernel, wild
    coords the exact full-extent fallback — and both must match the
    no-slab backward on df1 and every df2 level (modulo f32
    reduction-tree reassociation; the slab variant also accumulates df2
    through a dynamic row slice, which must scatter-add exactly)."""
    from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
        _slab_meta,
        alt_lookup_bwd,
        default_slabs,
        pool_fmap_levels,
    )

    B, H, W, C = 2, 40, 48, 16
    N = H * W
    R, L = 4, 4
    n = 2 * R + 1
    tile = 128
    f1 = jnp.asarray(RNG.randn(B, N, C).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    levels = tuple(pool_fmap_levels(f2, L))
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    slabs = default_slabs(shapes, tile, n)
    assert slabs[0] > 0, f"slab should activate at this geometry: {slabs}"

    grid = np.asarray(ops.coords_grid(H, W)).reshape(N, 2)[None]
    smooth = jnp.asarray(
        (grid + RNG.randn(B, N, 2).astype(np.float32) * 1.5).astype(
            np.float32))
    wild = jnp.asarray(
        (grid + RNG.randn(B, N, 2).astype(np.float32) * 60).astype(
            np.float32))

    g = np.zeros((B, N, 16, L, 16), np.float32)
    g[:, :, :n, :, :n] = RNG.randn(B, N, n, L, n)
    g = jnp.asarray(g.reshape(B, N, 16, L * 16))

    padn = (-N) % tile
    for coords, want_all_ok in ((smooth, True), (wild, False)):
        cpad = jnp.pad(coords, ((0, 0), (0, padn), (0, 0)))
        _, all_ok = _slab_meta(cpad, N, shapes, slabs, tile, n)
        assert bool(all_ok) == want_all_ok
        ref = alt_lookup_bwd(f1, levels, coords, g, R, tile=tile,
                             interpret=True)
        got = alt_lookup_bwd(f1, levels, coords, g, R, tile=tile,
                             interpret=True, slabs=slabs)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
        for lvl, (a, b) in enumerate(zip(got[1], ref[1])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4,
                err_msg=f"df2 level {lvl}")


def test_alt_lookup_sorted_tiles_interpret():
    """Sorted-tile middle branch (alt_lookup(sort_fallback=True)): flows
    whose row-major tiles overflow their slabs but whose FLOW-Y-SORTED
    tiles fit must match the no-slab kernel on the real window lanes, and
    truly iid-wild flows (sorted bands still too broad at this tiny
    geometry) must fall through to the exact full-extent kernel — the
    permutation must round-trip in both cases."""
    from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
        _slab_meta,
        _sort_order,
        alt_lookup,
        default_slabs,
        pool_fmap_levels,
    )

    rng = np.random.RandomState(7)  # local: band margins are a few rows,
    #                                 so this test must not depend on how
    #                                 earlier tests advanced the file RNG
    B, H, W, C = 2, 40, 48, 16
    N = H * W
    n = 9
    tile = 256
    f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    levels = tuple(pool_fmap_levels(f2, 4))
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    slabs = default_slabs(shapes, tile, n)
    assert slabs[0] > 0

    grid = np.asarray(ops.coords_grid(H, W)).reshape(N, 2)[None]
    # +-20 px y-sign flow: every row-major tile mixes both signs (band
    # ~47 rows > slab) but sorting by cy packs each tile into a tight
    # band that fits
    sign = np.where(rng.rand(B, N) < 0.5, -20.0, 20.0).astype(np.float32)
    bimodal = grid + np.stack(
        [rng.randn(B, N).astype(np.float32) * 0.5, sign], axis=-1)
    # sort-proof: push all but 100 queries out of volume (their bands are
    # empty, hence unconstraining) and spread the 100 survivors over the
    # full row range — after sorting they land in ONE tile whose band
    # (all hl rows) exceeds the slab, forcing the sorted-full branch.
    # (Plain iid sigma=60 does NOT defeat the sort: bands clip to the
    # volume, so sorted tiles span <= hl/T + n rows and still fit.)
    concentrated = grid.copy().astype(np.float32)
    concentrated[..., 1] = -200.0
    keep = rng.choice(N, 100, replace=False)
    concentrated[:, keep, 1] = np.linspace(0, H - 1, 100, dtype=np.float32)

    padn = (-N) % tile
    for coords_np, sorted_ok in ((bimodal, True), (concentrated, False)):
        coords = jnp.asarray(coords_np.astype(np.float32))
        cpad = jnp.pad(coords, ((0, 0), (0, padn), (0, 0)))
        _, direct_ok = _slab_meta(cpad, N, shapes, slabs, tile, n)
        assert not bool(direct_ok), "both cases must miss the direct slabs"
        order, _ = _sort_order(cpad, N)
        cs = jnp.take_along_axis(cpad, order[..., None], axis=1)
        _, ok2 = _slab_meta(cs, N, shapes, slabs, tile, n)
        assert bool(ok2) == sorted_ok, (
            f"sorted-band predicate {bool(ok2)} != expected {sorted_ok}")
        ref = alt_lookup(f1, levels, coords, 4, interpret=True)
        got = alt_lookup(f1, levels, coords, 4, interpret=True,
                         slabs=slabs, sort_fallback=True)
        gr = np.asarray(ref).reshape(B, N, 16, 4, 16)[:, :, :n, :, :n]
        gg = np.asarray(got).reshape(B, N, 16, 4, 16)[:, :, :n, :, :n]
        np.testing.assert_allclose(gg, gr, atol=1e-4)


def test_alt_lookup_bwd_sorted_tiles_interpret():
    """Backward sorted-tile branch: df1 must ride the inverse permutation
    back to query order, df2 (fmap2-space accumulation) must match the
    unsorted backward directly."""
    from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
        _slab_meta,
        _sort_order,
        alt_lookup_bwd,
        default_slabs,
        pool_fmap_levels,
    )

    rng = np.random.RandomState(7)  # local, see forward sorted test
    B, H, W, C = 2, 40, 48, 16
    N = H * W
    R, L = 4, 4
    n = 2 * R + 1
    tile = 128
    f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    levels = tuple(pool_fmap_levels(f2, L))
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    slabs = default_slabs(shapes, tile, n)
    assert slabs[0] > 0

    grid = np.asarray(ops.coords_grid(H, W)).reshape(N, 2)[None]
    sign = np.where(rng.rand(B, N) < 0.5, -20.0, 20.0).astype(np.float32)
    bimodal = jnp.asarray((grid + np.stack(
        [rng.randn(B, N).astype(np.float32) * 0.5, sign], axis=-1)
    ).astype(np.float32))

    g = np.zeros((B, N, 16, L, 16), np.float32)
    g[:, :, :n, :, :n] = rng.randn(B, N, n, L, n)
    g = jnp.asarray(g.reshape(B, N, 16, L * 16))

    padn = (-N) % tile
    cpad = jnp.pad(bimodal, ((0, 0), (0, padn), (0, 0)))
    _, direct_ok = _slab_meta(cpad, N, shapes, slabs, tile, n)
    assert not bool(direct_ok)
    order, _ = _sort_order(cpad, N)
    cs = jnp.take_along_axis(cpad, order[..., None], axis=1)
    _, ok2 = _slab_meta(cs, N, shapes, slabs, tile, n)
    assert bool(ok2), "sorted bands must fit at this geometry"

    ref = alt_lookup_bwd(f1, levels, bimodal, g, R, tile=tile,
                         interpret=True)
    got = alt_lookup_bwd(f1, levels, bimodal, g, R, tile=tile,
                         interpret=True, slabs=slabs, sort_fallback=True)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    for lvl, (a, b) in enumerate(zip(got[1], ref[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"df2 level {lvl}")


def test_alt_lookup_bwd_fallback_tile_interpret():
    """Mixed-tile backward dispatch (alt_lookup_bwd(fallback_tile=)): the
    full-extent branch runs at its own (larger) query tile; both the
    slab-hit (smooth) and full-extent (wild) regimes must match the
    plain single-tile backward, including the shared larger padding."""
    from understanding_flow_robustness_tpu.ops.pallas.alt_corr import (
        alt_lookup_bwd,
        default_slabs,
        pool_fmap_levels,
    )

    rng = np.random.RandomState(11)
    B, H, W, C = 2, 40, 48, 16
    N = H * W  # 1920: a 128-multiple but NOT a 256-multiple -> pad path
    R, L = 4, 4
    n = 2 * R + 1
    f1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    levels = tuple(pool_fmap_levels(f2, L))
    shapes = tuple((l.shape[1], l.shape[2]) for l in levels)
    slabs = default_slabs(shapes, 128, n)
    assert slabs[0] > 0

    grid = np.asarray(ops.coords_grid(H, W)).reshape(N, 2)[None]
    smooth = jnp.asarray(
        (grid + rng.randn(B, N, 2).astype(np.float32) * 1.5).astype(
            np.float32))
    wild = jnp.asarray(
        (grid + rng.randn(B, N, 2).astype(np.float32) * 60).astype(
            np.float32))

    g = np.zeros((B, N, 16, L, 16), np.float32)
    g[:, :, :n, :, :n] = rng.randn(B, N, n, L, n)
    g = jnp.asarray(g.reshape(B, N, 16, L * 16))

    for coords in (smooth, wild):
        ref = alt_lookup_bwd(f1, levels, coords, g, R, tile=128,
                             interpret=True)
        got = alt_lookup_bwd(f1, levels, coords, g, R, tile=128,
                             interpret=True, slabs=slabs,
                             fallback_tile=256)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
        for lvl, (a, b) in enumerate(zip(got[1], ref[1])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4,
                err_msg=f"df2 level {lvl}")
