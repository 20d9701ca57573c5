"""Training-loop tests: losses vs torch oracles, optimizer schedule parity,
end-to-end tiny training with checkpoint/resume, multichip train step."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from understanding_flow_robustness_tpu import training
from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.training.trainer import TrainConfig, train

RNG = np.random.RandomState(5)


def test_sequence_loss_matches_torch_raft_branch():
    preds = [RNG.randn(1, 16, 24, 2).astype(np.float32) for _ in range(3)]
    gt = RNG.randn(1, 16, 24, 2).astype(np.float32) * 5
    valid = (RNG.rand(1, 16, 24) > 0.2).astype(np.float32)

    loss, metrics = training.sequence_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid),
        gamma=0.8,
    )

    # torch oracle of training/utils.py:148-222 (RAFT branch)
    preds_t = [torch.from_numpy(np.transpose(p, (0, 3, 1, 2))) for p in preds]
    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    valid_t = torch.from_numpy(valid)
    mag = torch.sum(gt_t ** 2, dim=1).sqrt()
    keep = (valid_t >= 0.5) & (mag < 400)
    ref_loss = 0.0
    n = len(preds)
    for i, p in enumerate(preds_t):
        i_loss = (p - gt_t).abs()
        ref_loss += 0.8 ** (n - i - 1) * (keep[:, None] * i_loss).mean()
    epe = torch.sum((preds_t[-1] - gt_t) ** 2, dim=1).sqrt()
    ref_epe = epe.view(-1)[keep.view(-1)].mean()

    assert abs(float(loss) - float(ref_loss)) < 1e-5
    assert abs(float(metrics["epe"]) - float(ref_epe)) < 1e-4


def test_multiscale_area_resize_matches_torch():
    from understanding_flow_robustness_tpu.training.losses import _area_resize

    x = RNG.randn(2, 16, 24, 2).astype(np.float32)
    ours = _area_resize(jnp.asarray(x), 4, 6)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (4, 6), mode="area"
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(ref.numpy(), (0, 2, 3, 1)), atol=1e-5
    )


def test_onecycle_matches_torch():
    lr, steps = 1e-3, 200
    sched = training.onecycle_linear(lr, steps, pct_start=0.05)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    ref = torch.optim.lr_scheduler.OneCycleLR(
        opt, lr, steps, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear",
    )
    for step in range(steps - 1):
        ref_lr = ref.get_last_lr()[0]
        ours = float(sched(step))
        assert abs(ours - ref_lr) / max(ref_lr, 1e-9) < 1e-5, (
            step, ours, ref_lr
        )
        opt.step()
        ref.step()


@pytest.fixture(scope="module")
def tiny_raft():
    return fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                       iters=2)


def _batches(n=2, b=2, h=64, w=64):
    def gen():
        rng = np.random.RandomState(0)
        for _ in range(n):
            yield {
                "image1": rng.rand(b, h, w, 3).astype(np.float32),
                "image2": rng.rand(b, h, w, 3).astype(np.float32),
                "flow": rng.randn(b, h, w, 2).astype(np.float32),
                "valid": np.ones((b, h, w), np.float32),
            }
    return gen


def test_train_loop_and_resume(tmp_path, tiny_raft):
    cfg = TrainConfig(
        name="tiny", num_steps=3, val_freq=100, lr=1e-4,
        checkpoint_dir=str(tmp_path / "ckpt"), n_devices=2, seed=0,
    )
    seen = []
    params, stats, steps = train(
        cfg, tiny_raft, _batches(), logger=lambda s, m: seen.append(m)
    )
    # total_steps counts BATCHES and stops on total_steps > num_steps
    # (train.py:338,341-345): num_steps=3 -> 4 batches
    assert steps == 4
    assert len(seen) == 4
    assert all(np.isfinite(m["loss"]) for m in seen)

    # resume: already fully trained (total_steps + 1 >= num_steps,
    # train.py:622) -> returns immediately at saved step
    params2, _, steps2 = train(cfg, tiny_raft, _batches())
    assert steps2 == 4


def test_adversarial_training_step(tmp_path, tiny_raft):
    cfg = TrainConfig(
        name="adv", num_steps=1, checkpoint_dir=str(tmp_path / "ckpt_adv"),
        adversarial=True, n_devices=2, seed=0,
        adv_config=training.trainer.PerturbConfig(
            perturb_method="fgsm", flow_loss="l2", output_norm=0.02
        ),
    )
    params, stats, steps = train(cfg, tiny_raft, _batches(n=1, b=1))
    assert steps >= 1


def test_packed_upsample_matches_convex():
    """upsample_flow_packed == upsample_flow_convex through the packed
    channel mapping (raft_model._packed_uv_order)."""
    import jax.numpy as jnp

    from understanding_flow_robustness_tpu.models.raft_model import (
        _packed_uv_order,
        pack_fullres,
        upsample_flow_convex,
        upsample_flow_packed,
    )

    rng = np.random.RandomState(0)
    B, H, W = 2, 4, 6
    flow = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32))
    mask = jnp.asarray(rng.randn(B, H, W, 576).astype(np.float32))

    full = upsample_flow_convex(flow, mask)          # (B, 8H, 8W, 2)

    # packed mask layout: block k of 128 lanes, c-duplicated, 0.25 folded
    uv64, _ = _packed_uv_order()
    idx = (np.arange(9)[:, None] * 64 + np.asarray(uv64)[None, :]) \
        .repeat(2, axis=1).reshape(-1)
    mask_p = (0.25 * np.asarray(mask))[..., idx]
    packed = upsample_flow_packed(flow, jnp.asarray(mask_p))

    # NOTE: upsample_flow_convex multiplies by 0.25 OUTSIDE (the update
    # block does it); feed the same effective mask to both
    full = upsample_flow_convex(flow, 0.25 * mask)
    np.testing.assert_allclose(
        np.asarray(pack_fullres(full)), np.asarray(packed),
        rtol=1e-5, atol=1e-5,
    )


def test_packed_sequence_loss_matches_plain():
    from understanding_flow_robustness_tpu.models.raft_model import (
        pack_fullres,
    )
    from understanding_flow_robustness_tpu.training.losses import (
        sequence_loss,
    )

    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 48
    preds = [rng.randn(B, H, W, 2).astype(np.float32) for _ in range(3)]
    gt = rng.randn(B, H, W, 2).astype(np.float32) * 5
    valid = (rng.rand(B, H, W) > 0.3).astype(np.float32)

    import jax.numpy as jnp

    loss_ref, met_ref = sequence_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid)
    )
    packed_preds = [pack_fullres(jnp.asarray(p)) for p in preds]
    loss_p, met_p = sequence_loss(
        packed_preds, jnp.asarray(gt), jnp.asarray(valid), packed=True
    )
    np.testing.assert_allclose(float(loss_p), float(loss_ref), rtol=1e-5)
    for k in met_ref:
        np.testing.assert_allclose(float(met_p[k]), float(met_ref[k]),
                                   rtol=1e-4, atol=1e-5)


def test_packed_train_step_matches_plain(tiny_raft):
    """The packed RAFT train path produces the same updated params and
    loss as the reference-shaped path (float reassociation tolerance)."""
    import jax
    import jax.numpy as jnp

    from understanding_flow_robustness_tpu.training import (
        fetch_optimizer,
        make_train_step,
    )

    rng = np.random.RandomState(2)
    b, h, w = 2, 64, 64
    batch = {
        "image1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "image2": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "flow": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        "valid": jnp.ones((b, h, w), np.float32),
    }
    tx, _ = fetch_optimizer(lr=1e-4, num_steps=10)
    params = tiny_raft.variables["params"]
    stats = tiny_raft.variables.get("batch_stats", {})
    opt = tx.init(params)

    outs = {}
    for packed in (False, True):
        step = jax.jit(make_train_step(
            tiny_raft.module, tx, loss_type="sequence", is_raft=True,
            packed_raft=packed,
        ))
        np_, no_, ns_, m = step(params, opt, stats, batch)
        outs[packed] = (np_, m)

    m0, m1 = outs[False][1], outs[True][1]
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["epe"]), float(m0["epe"]),
                               rtol=1e-4)
    # Npx metrics count threshold crossings — a 1-ulp EPE difference on a
    # borderline pixel flips one count; allow a few of 8192 pixels
    for k in ("1px", "3px", "5px"):
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), atol=5e-4)
    flat0 = jax.tree_util.tree_leaves(outs[False][0])
    flat1 = jax.tree_util.tree_leaves(outs[True][0])
    for a, c in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_area_resize_matches_torch_nondivisible():
    """torch F.interpolate(mode='area') is ADAPTIVE pooling: non-divisible
    sizes use variable bins, not fixed blocks (368->12 style geometries)."""
    import torch
    import torch.nn.functional as F

    from understanding_flow_robustness_tpu.training.losses import (
        _area_resize,
    )

    rng = np.random.RandomState(0)
    for (H, W, h, w) in [(46, 62, 12, 20), (16, 24, 4, 6), (23, 31, 6, 10)]:
        x = rng.randn(2, H, W, 2).astype(np.float32)
        ours = np.asarray(_area_resize(jnp.asarray(x), h, w))
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(h, w),
            mode="area",
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_freeze_bn_raft_only():
    """freeze_bn is RAFT-only like the reference (train.py:329-335)."""
    from understanding_flow_robustness_tpu.training.train_step import (
        make_train_step,
    )
    import optax

    with pytest.raises(ValueError, match="RAFT-only"):
        make_train_step(object(), optax.sgd(1e-3), is_raft=False,
                        freeze_bn=True)


def test_fetch_dataset_chairs_aug_params(tmp_path, monkeypatch):
    """chairs stage: min_scale -0.2 (the reference's own fork value,
    training/utils.py:296-309 — NOT upstream RAFT's -0.1); trans_rot sets
    translate 10 / rot 17 / diff_angle 0 (shared rotation)."""
    from understanding_flow_robustness_tpu.data import datasets as D

    captured = {}

    class _FakeChairs:
        def __init__(self, aug_params, split, root):
            captured.update(aug_params)

    monkeypatch.setattr(D, "FlyingChairs", _FakeChairs)
    D.fetch_dataset("chairs", (256, 640), trans_rot=True)
    assert captured["min_scale"] == -0.2
    assert captured["translate"] == 10 and captured["rot_angle"] == 17
    assert captured["diff_angle"] == 0
