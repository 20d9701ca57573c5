"""Compressed gradient transport (bf16 all-reduce) on the 8-device mesh.

PARITY.md §2.9's ICI model names FlowNet2's 650 MB f32 gradient all-reduce
as the multi-chip scaling bottleneck and bf16 transport as the mitigation;
round 5 turns that analytic claim into code (train_step.make_train_step
``grad_transport`` + ``shard_train_step(explicit_collectives=True)``).
These tests pin the numerics on the virtual CPU mesh:

  1. the explicit-collectives f32 path reproduces the pjit path exactly
     (same math, explicit pmean instead of XLA's inserted all-reduce);
  2. the bf16 transport's one-step update lands within bf16 rounding of
     the f32 update — for a FLOWNET2 fine-tune step (the model the ICI
     model is about) and for RAFT;
  3. a short FlowNet2 fine-tune RUN (5 steps) converges equivalently:
     the loss trajectories of f32 and bf16 transport stay within 1%.

Reference ceiling being improved on: training/train.py:117,126-127 wraps
the model in torch.nn.DataParallel (single-process, no transport control).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
)
from understanding_flow_robustness_tpu.training import (
    fetch_optimizer,
    make_train_step,
    shard_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _batch(rng, b, h, w):
    return {
        "image1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "image2": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "flow": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        "valid": jnp.ones((b, h, w), jnp.float32),
    }


def _steps(model, tx, mesh, **kw):
    """(pjit_f32, explicit_f32, explicit_bf16) step functions."""
    axis = mesh.axis_names[0]
    pjit = shard_train_step(make_train_step(model.module, tx, **kw), mesh)
    exp32 = shard_train_step(
        make_train_step(model.module, tx, axis_name=axis, **kw),
        mesh, explicit_collectives=True)
    exp16 = shard_train_step(
        make_train_step(model.module, tx, axis_name=axis,
                        grad_transport="bf16", **kw),
        mesh, explicit_collectives=True)
    return pjit, exp32, exp16


def _max_abs_delta(a, b):
    return jax.tree_util.tree_reduce(
        max, jax.tree_util.tree_map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b))


def _run(step, mesh, params, opt_state, stats, batch):
    with mesh:
        p = replicate(mesh, params)
        o = replicate(mesh, opt_state)
        s = replicate(mesh, stats)
        b = shard_batch(mesh, batch)
        np_, no_, ns_, m = step(p, o, s, b)
        jax.block_until_ready(m)
    return np_, no_, ns_, m


@pytest.mark.parametrize("model_id,kw,pjit_loss_tol", [
    # FlowNet2 has no norm layers -> shard-mean must equal global mean to
    # float precision.  RAFT's cnet uses BATCH norm, which normalizes over
    # the local shard under shard_map (batch 1) vs the global batch under
    # pjit — exactly torch DataParallel's per-replica BN (the reference
    # ceiling), worth a few 1e-3 of loss at random init.
    ("FlowNet2", dict(loss_type="multiscale"), 1e-3),
    ("RAFT", dict(loss_type="sequence", is_raft=True), 3e-2),
])
def test_bf16_transport_one_step_matches_f32(model_id, kw, pjit_loss_tol):
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    model = fetch_model(model_id, pretrained_path=None, init_size=(64, 64),
                        **({"iters": 2} if model_id == "RAFT" else {}))
    tx, _ = fetch_optimizer(lr=1e-4, num_steps=100)
    params = model.variables["params"]
    stats = model.variables.get("batch_stats", {})
    opt = tx.init(params)
    batch = _batch(rng, 8, 64, 64)

    pjit, exp32, exp16 = _steps(model, tx, mesh, **kw)
    p_pjit, _, _, m_pjit = _run(pjit, mesh, params, opt, stats, batch)
    p_exp, _, _, m_exp = _run(exp32, mesh, params, opt, stats, batch)
    p_bf, _, _, m_bf = _run(exp16, mesh, params, opt, stats, batch)

    # bf16 transport vs f32 transport (SAME collective mode — the claim
    # under test).  Bound: Adam's first-step update is ~±lr per param
    # (m̂/√v̂ ≈ sign(g)), and any rounding that flips the sign of a
    # near-zero gradient flips that whole ±lr — measured on the f32
    # explicit-vs-pjit pair too (8e-6 max from mere reassociation).  So
    # the honest per-param cap is ~2·lr for sign-flippable params, and
    # the claim worth pinning is that bf16 transport stays inside that
    # envelope (no systematic drift beyond rounding-of-noise).
    lr = 1e-4
    assert _max_abs_delta(p_bf, p_exp) < 3 * lr
    assert abs(float(m_bf["loss"]) - float(m_exp["loss"])) < 1e-4

    # explicit-collectives f32 vs pjit f32: same gradient math, but BN
    # normalizes over the LOCAL shard under shard_map (batch 1 here) vs
    # the global batch under pjit — per-replica BN is exactly
    # DataParallel's semantics (the reference ceiling), so the two paths
    # agree tightly only for BN-free stacks; for BN models we assert the
    # losses are consistent, not bitwise-close params.
    assert np.isfinite(float(m_pjit["loss"]))
    rel = (abs(float(m_exp["loss"]) - float(m_pjit["loss"]))
           / max(abs(float(m_pjit["loss"])), 1e-9))
    assert rel < pjit_loss_tol, (
        f"explicit vs pjit loss differs {rel:.2e} — beyond what per-shard "
        "BN statistics can explain (this check caught the "
        "batch-dim-as-scales list(preds) bug in round 5)")


def test_flownet2_bf16_transport_short_run_converges():
    """5 fine-tune steps on a fixed batch: the f32 and bf16-transport loss
    trajectories must track within 1% at every step (the convergence-delta
    evidence PARITY.md §2.9 cites)."""
    mesh = make_mesh(8)
    rng = np.random.RandomState(1)
    model = fetch_model("FlowNet2", pretrained_path=None, init_size=(64, 64))
    tx, _ = fetch_optimizer(lr=1e-4, num_steps=100)
    stats = model.variables.get("batch_stats", {})
    batch = _batch(rng, 8, 64, 64)

    _, exp32, exp16 = _steps(model, tx, mesh, loss_type="multiscale")
    trajs = {}
    for name, step in (("f32", exp32), ("bf16", exp16)):
        p = model.variables["params"]
        o = tx.init(p)
        s = stats
        losses = []
        for _ in range(5):
            p, o, s, m = _run(step, mesh, p, o, s, batch)
            losses.append(float(m["loss"]))
        trajs[name] = losses

    assert all(np.isfinite(trajs["f32"])) and all(np.isfinite(trajs["bf16"]))
    # training must make progress, identically in both transports
    assert trajs["f32"][-1] < trajs["f32"][0]
    for a, b in zip(trajs["f32"], trajs["bf16"]):
        assert abs(a - b) <= 0.01 * abs(a), (trajs["f32"], trajs["bf16"])
