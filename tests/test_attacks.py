"""Attack-layer tests: loss parity with the reference conventions, jitted
global attacks, patch pipeline, universal perturbation — all against a tiny
differentiable toy flow model (machinery tests; full-model attack behavior
is exercised on TPU in the verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from understanding_flow_robustness_tpu import attacks
from understanding_flow_robustness_tpu.attacks import (
    PatchAttackConfig,
    PerturbConfig,
    UniversalConfig,
    make_jitted_attack,
    make_patch_attack_step,
    make_universal_attack_step,
)

RNG = np.random.RandomState(21)


def toy_predict(img1, img2):
    """Tiny differentiable stand-in flow net: smoothed image difference."""
    d = (img1 - img2)[..., :2] * 5.0
    k = jnp.ones((3, 3, 1, 1), img1.dtype) / 9.0
    out = []
    for c in range(2):
        out.append(
            jax.lax.conv_general_dilated(
                d[..., c : c + 1], k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.concatenate(out, axis=-1)


def test_compute_epe_matches_torch():
    gt = RNG.randn(2, 16, 24, 3).astype(np.float32)
    gt[..., 2] = (gt[..., 2] > 0).astype(np.float32)
    pred = RNG.randn(2, 8, 12, 2).astype(np.float32)

    ours = float(attacks.compute_epe(jnp.asarray(gt), jnp.asarray(pred)))

    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    pred_t = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
    up = F.interpolate(pred_t, size=(16, 24), mode="bilinear",
                       align_corners=False)
    u = up[:, 0] * (24 / 12)
    v = up[:, 1] * (16 / 8)
    epe = torch.sqrt((gt_t[:, 0] - u) ** 2 + (gt_t[:, 1] - v) ** 2)
    valid = gt_t[:, 2]
    ref = float((epe * valid).sum() / (valid.sum() + 1e-8))
    assert abs(ours - ref) < 1e-4


def test_compute_cossim_matches_torch():
    gt = RNG.randn(1, 12, 16, 3).astype(np.float32)
    gt[..., 2] = 1.0
    pred = RNG.randn(1, 12, 16, 2).astype(np.float32)
    ours = float(attacks.compute_cossim(jnp.asarray(gt), jnp.asarray(pred)))

    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    pred_t = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
    sim = F.cosine_similarity(gt_t[:, :2], pred_t)
    ref = float(sim.sum() / (gt_t[:, 2].sum() + 1e-8))
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("method", ["fgsm", "ifgsm", "ifgm", "mifgsm"])
def test_gradient_attacks_increase_loss(method):
    img0 = jnp.asarray(RNG.rand(1, 16, 24, 3).astype(np.float32))
    img1 = jnp.asarray(RNG.rand(1, 16, 24, 3).astype(np.float32))
    flow = toy_predict(img0, img1)
    # GT offset from the clean prediction (a zero loss-gradient at the
    # clean point would make every gradient attack a no-op)
    gt = jnp.concatenate(
        [flow + 1.0, jnp.ones_like(flow[..., :1])], axis=-1
    )

    cfg = PerturbConfig(perturb_method=method, flow_loss="l2",
                        output_norm=0.05, n_step=5, learning_rate=0.01)
    run = make_jitted_attack(toy_predict, cfg)
    n0, n1, adv0, adv1 = run(img0, img1, gt, jax.random.PRNGKey(0))

    assert float(jnp.abs(n0).max()) <= 0.05 + 1e-6
    assert float(adv0.min()) >= 0.0 and float(adv0.max()) <= 1.0
    adv_flow = toy_predict(adv0, adv1)
    clean_err = float(attacks.compute_epe(gt, flow))
    adv_err = float(attacks.compute_epe(gt, adv_flow))
    assert adv_err > clean_err  # the attack must move the flow


def test_mifgsm_batched_matches_per_sample():
    """mifgsm's L1 gradient normalization is PER SAMPLE: the reference's
    whole-tensor torch.sum (perturb_model.py:673-679) runs at batch size 1
    only (perturb_main.py:189), so the faithful batched generalization must
    not couple samples through a shared norm."""
    img0 = jnp.asarray(RNG.rand(2, 16, 24, 3).astype(np.float32))
    img1 = jnp.asarray(RNG.rand(2, 16, 24, 3).astype(np.float32))
    flow = toy_predict(img0, img1)
    gt = jnp.concatenate(
        [flow + 1.0, jnp.ones_like(flow[..., :1])], axis=-1
    )
    cfg = PerturbConfig(perturb_method="mifgsm", flow_loss="l2",
                        output_norm=0.05, n_step=4, learning_rate=0.01)
    run = make_jitted_attack(toy_predict, cfg)
    n0b, n1b, _, _ = run(img0, img1, gt, jax.random.PRNGKey(0))
    for b in range(2):
        n0s, n1s, _, _ = run(img0[b:b + 1], img1[b:b + 1], gt[b:b + 1],
                             jax.random.PRNGKey(0))
        # toy_predict's 3x3 smoothing makes per-sample losses independent
        # of the other batch entry, so the noises must match exactly
        np.testing.assert_allclose(np.asarray(n0b[b]), np.asarray(n0s[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(n1b[b]), np.asarray(n1s[0]),
                                   atol=1e-6)


def test_noise_attacks_shapes():
    img0 = jnp.asarray(RNG.rand(1, 8, 8, 3).astype(np.float32))
    img1 = jnp.asarray(RNG.rand(1, 8, 8, 3).astype(np.float32))
    gt = jnp.zeros((1, 8, 8, 3))
    for method in ["gaussian", "uniform", "none"]:
        cfg = PerturbConfig(perturb_method=method, output_norm=0.1)
        run = make_jitted_attack(toy_predict, cfg)
        n0, n1, adv0, adv1 = run(img0, img1, gt, jax.random.PRNGKey(1))
        assert adv0.shape == img0.shape
        assert float(adv0.min()) >= 0 and float(adv0.max()) <= 1


def test_patch_construction():
    patch, mask, shape = attacks.init_patch_circle(100, 0.32)
    assert patch.shape == (1, 32, 32, 3)
    assert mask.shape == (1, 32, 32, 3)
    assert mask[0, 0, 0, 0] == 0 and mask[0, 16, 16, 0] == 1

    for name in attacks.get_self_correlated_patches():
        p = attacks.create_correlated_patch(name, 48)
        assert p.shape == (1, 48, 48, 3)
        assert p.min() >= 0 and p.max() <= 1 + 1e-6

    for name in ["gaussian", "uniform", "black", "white", "red", "gray"]:
        p = attacks.create_random_patch(name, 24)
        assert p.shape == (1, 24, 24, 3)


def test_circle_transform_and_extract():
    patch, mask, shape = attacks.init_patch_circle(64, 0.4)
    init = patch.copy()
    data_shape = (1, 64, 96, 3)
    canvas, mcanvas, icanvas, rx, ry, new_shape = attacks.circle_transform(
        patch, mask, init, data_shape, shape, margin=1
    )
    assert canvas.shape == data_shape
    ph, pw = new_shape[1], new_shape[2]
    # patch region is inside the image, margins respected
    assert 0 <= rx and rx + pw < 96 and 0 <= ry and ry + ph < 64
    # mask canvas is zero outside the placed region
    outside = mcanvas.copy()
    outside[:, ry : ry + ph, rx : rx + pw] = 0
    assert outside.sum() == 0


def test_patch_attack_loop_reduces_loss():
    img_shape = (1, 32, 48, 3)
    tgt = RNG.rand(*img_shape).astype(np.float32)
    ref = RNG.rand(*img_shape).astype(np.float32)

    patch, mask, shape = attacks.init_patch_circle(32, 0.4)
    canvas, mc, ic, rx, ry, new_shape = attacks.circle_transform(
        patch, mask, patch.copy(), img_shape, shape, margin=1, norotate=True
    )

    flow = toy_predict(jnp.asarray(tgt), jnp.asarray(ref))
    target = -1.0 * np.asarray(flow)

    cfg = PatchAttackConfig(lr=10.0, max_count=5, l2=True, loss_threshold=0.0)
    step = make_patch_attack_step(toy_predict, cfg)
    adv_tgt, adv_ref, new_canvas, loss, count = step(
        jnp.asarray(tgt), jnp.asarray(ref), jnp.asarray(canvas, jnp.float32),
        jnp.asarray(mc, jnp.float32), jnp.asarray(ic, jnp.float32),
        jnp.asarray(target),
    )
    assert int(count) == 5  # threshold 0 -> runs max_count steps
    assert np.isfinite(float(loss))
    # adversarial images only differ inside the mask
    diff = np.abs(np.asarray(adv_tgt) - tgt)
    outside = diff * (1 - np.asarray(mc))
    assert outside.max() < 1e-6


def test_universal_perturbation_accumulates():
    img_shape = (1, 16, 24, 3)
    cfg = UniversalConfig(n_step=4, output_norm=0.05, learning_rate=0.02)
    predict_jit = jax.jit(toy_predict)
    step = make_universal_attack_step(toy_predict, cfg)

    def batches():
        for _ in range(3):
            yield (RNG.rand(*img_shape).astype(np.float32),
                   RNG.rand(*img_shape).astype(np.float32))

    n0, n1 = attacks.train_universal_perturbation(
        predict_jit, step, batches, img_shape, cfg, epochs=1
    )
    assert n0.shape == img_shape
    assert np.abs(n0).max() <= 0.05 + 1e-6
    assert np.abs(n0).max() > 0  # something was learned


def test_compute_l1_nan_semantics_matches_torch():
    """compute_l1 means over NON-NaN elements (perturb_model.py:93), not
    zero-filled ones."""
    gt = RNG.randn(1, 8, 12, 3).astype(np.float32)
    gt[..., 2] = 1.0
    gt[0, :3, :5, 0] = np.nan   # sparse-GT NaNs like the reference's KITTI
    pred = RNG.randn(1, 8, 12, 2).astype(np.float32)
    ours = float(attacks.compute_l1(jnp.asarray(gt), jnp.asarray(pred)))

    gt_t = torch.from_numpy(np.transpose(gt, (0, 3, 1, 2)))
    pred_t = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
    i_loss = (pred_t - gt_t[:, :2]).abs()
    l1 = torch.mean(i_loss[~torch.isnan(i_loss)])
    valid = gt_t[:, 2]
    ref = float((l1 * valid).sum() / (valid.sum() + 1e-8))
    assert abs(ours - ref) < 1e-5
