"""Trajectory-level parity of the jitted attack loops against the REFERENCE
attack code executed on CPU (global_attacks/perturb_model.py and
patch_attacks/main.py::attack), via tests/reference_oracle.py.

A tiny differentiable conv flow-net (torch) and its exact JAX twin stand in
for the flow models, so every gradient step of the reference's host loops can
be compared against our lax.fori_loop / lax.while_loop device programs.
Trajectories are probed by running the reference at n_step = 1, 2, 5 — the
gradient attacks are deterministic, so the final noise at step k IS the
trajectory point k.
"""

from __future__ import annotations

import random
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from jax import lax

import reference_oracle as ro
from understanding_flow_robustness_tpu.attacks import global_attacks as ga
from understanding_flow_robustness_tpu.attacks.patch_attack import (
    PatchAttackConfig,
    make_patch_attack_step,
)

H, W = 16, 24


class TinyTorchFlowNet(torch.nn.Module):
    """2-conv toy flow net: full-res 2-channel output, smooth (tanh)."""

    def __init__(self):
        super().__init__()
        self.c1 = torch.nn.Conv2d(6, 8, 3, padding=1)
        self.c2 = torch.nn.Conv2d(8, 2, 3, padding=1)

    def forward(self, a, b):
        x = torch.cat([a, b], 1)
        return self.c2(torch.tanh(self.c1(x)))


def _jax_twin(net: TinyTorchFlowNet):
    """Exact JAX twin of TinyTorchFlowNet (NHWC)."""
    w1 = jnp.asarray(net.c1.weight.detach().numpy().transpose(2, 3, 1, 0))
    b1 = jnp.asarray(net.c1.bias.detach().numpy())
    w2 = jnp.asarray(net.c2.weight.detach().numpy().transpose(2, 3, 1, 0))
    b2 = jnp.asarray(net.c2.bias.detach().numpy())
    dn = ("NHWC", "HWIO", "NHWC")

    def predict(a, b):
        x = jnp.concatenate([a, b], -1)
        x = lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=dn) + b1
        x = jnp.tanh(x)
        return lax.conv_general_dilated(x, w2, (1, 1), "SAME",
                                        dimension_numbers=dn) + b2

    return predict


@pytest.fixture(scope="module")
def setup():
    ro.install_reference_abs()
    import global_attacks.perturb_model as pm  # noqa: E402

    torch.manual_seed(0)
    net = TinyTorchFlowNet().eval()
    predict = _jax_twin(net)
    rng = np.random.RandomState(7)
    img0 = rng.rand(1, H, W, 3).astype(np.float32)
    img1 = rng.rand(1, H, W, 3).astype(np.float32)
    gt = rng.randn(1, H, W, 2).astype(np.float32)
    return pm, net, predict, img0, img1, gt


def _ref_perturb(pm, net, img0, img1, gt, **kw):
    args = Namespace(flownet="tiny", flow_loss=kw.pop("flow_loss", "cossim"))
    model = pm.PerturbationsModel(
        probability_diverse_input=0.0,
        device=torch.device("cpu"),
        disparity=False,
        print_out=False,
        args=args,
        **kw,
    )
    n0, n1, a0, a1 = model.forward(
        net, ro.nchw(img0), ro.nchw(img1), ro.nchw(gt)
    )
    return ro.nhwc(n0), ro.nhwc(n1), ro.nhwc(a0), ro.nhwc(a1)


def _our_perturb(predict, img0, img1, gt, cfg):
    n0, n1, a0, a1 = ga.perturb(
        predict, jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(gt), cfg,
        rng=jax.random.PRNGKey(0),
    )
    return (np.asarray(n0), np.asarray(n1), np.asarray(a0), np.asarray(a1))


def _assert_traj_close(ours, ref, lr, sign_method: bool):
    """Sign methods quantize to ±lr steps, so a near-zero-gradient element
    can legally flip between frameworks; require the mismatch set to be a
    vanishing fraction.  Continuous (fgm) methods must agree to ~1e-5."""
    for o, r in zip(ours, ref):
        if sign_method:
            mismatched = np.abs(o - r) > 1e-5
            assert mismatched.mean() < 0.005, mismatched.mean()
        else:
            np.testing.assert_allclose(o, r, atol=2e-5, rtol=1e-3)


@pytest.mark.parametrize("mode", ["both", "left", "right"])
def test_fgsm_parity(setup, mode):
    pm, net, predict, img0, img1, gt = setup
    ref = _ref_perturb(pm, net, img0, img1, gt, perturb_method="fgsm",
                       perturb_mode=mode, output_norm=0.02)
    cfg = ga.PerturbConfig(perturb_method="fgsm", perturb_mode=mode,
                           output_norm=0.02)
    ours = _our_perturb(predict, img0, img1, gt, cfg)
    _assert_traj_close(ours, ref, 0.02, sign_method=True)


def test_fgm_parity(setup):
    """Reference 'fgm' is routed into __fgsm and STILL takes the sign
    (perturb_model.py:447-473) — one-step fgm has no non-sign branch."""
    pm, net, predict, img0, img1, gt = setup
    ref = _ref_perturb(pm, net, img0, img1, gt, perturb_method="fgm",
                       output_norm=0.02)
    cfg = ga.PerturbConfig(perturb_method="fgm", output_norm=0.02)
    ours = _our_perturb(predict, img0, img1, gt, cfg)
    _assert_traj_close(ours, ref, 0.02, sign_method=True)


@pytest.mark.parametrize("n_step", [1, 2, 5])
@pytest.mark.parametrize("targeted", [False, True])
def test_ifgsm_trajectory_parity(setup, n_step, targeted):
    pm, net, predict, img0, img1, gt = setup
    ref = _ref_perturb(
        pm, net, img0, img1, gt, perturb_method="ifgsm", output_norm=0.02,
        n_step=n_step, learning_rate=2e-3, targeted=targeted,
    )
    cfg = ga.PerturbConfig(perturb_method="ifgsm", output_norm=0.02,
                           n_step=n_step, learning_rate=2e-3,
                           targeted=targeted)
    ours = _our_perturb(predict, img0, img1, gt, cfg)
    _assert_traj_close(ours, ref, 2e-3, sign_method=True)


@pytest.mark.parametrize("n_step", [1, 3])
def test_ifgm_trajectory_parity(setup, n_step):
    pm, net, predict, img0, img1, gt = setup
    ref = _ref_perturb(
        pm, net, img0, img1, gt, perturb_method="ifgm", output_norm=0.02,
        n_step=n_step, learning_rate=2e-3,
    )
    cfg = ga.PerturbConfig(perturb_method="ifgm", output_norm=0.02,
                           n_step=n_step, learning_rate=2e-3)
    ours = _our_perturb(predict, img0, img1, gt, cfg)
    _assert_traj_close(ours, ref, 2e-3, sign_method=False)


@pytest.mark.parametrize("n_step", [1, 2, 5])
def test_mifgsm_trajectory_parity(setup, n_step):
    pm, net, predict, img0, img1, gt = setup
    ref = _ref_perturb(
        pm, net, img0, img1, gt, perturb_method="mifgsm", output_norm=0.02,
        n_step=n_step, learning_rate=2e-3, momentum=0.47,
    )
    cfg = ga.PerturbConfig(perturb_method="mifgsm", output_norm=0.02,
                           n_step=n_step, learning_rate=2e-3, momentum=0.47)
    ours = _our_perturb(predict, img0, img1, gt, cfg)
    _assert_traj_close(ours, ref, 2e-3, sign_method=True)


def test_valid_mask_loss_parity(setup):
    """3-channel GT (valid-masked loss) through one ifgsm step."""
    pm, net, predict, img0, img1, _ = setup
    rng = np.random.RandomState(3)
    gt3 = np.concatenate(
        [rng.randn(1, H, W, 2), (rng.rand(1, H, W, 1) > 0.4).astype(float)],
        axis=-1,
    ).astype(np.float32)
    ref = _ref_perturb(pm, net, img0, img1, gt3, perturb_method="ifgsm",
                       output_norm=0.02, n_step=2, learning_rate=2e-3)
    cfg = ga.PerturbConfig(perturb_method="ifgsm", output_norm=0.02,
                           n_step=2, learning_rate=2e-3)
    ours = _our_perturb(predict, img0, img1, gt3, cfg)
    _assert_traj_close(ours, ref, 2e-3, sign_method=True)


def test_diverse_input_transform_parity(setup):
    """apply_diverse_input vs the reference's __diverse_input
    (perturb_model.py:759-821) under identical random draws."""
    pm, net, predict, img0, img1, gt = setup
    args = Namespace(flownet="tiny", flow_loss="cossim")
    model = pm.PerturbationsModel(
        perturb_method="ifgsm", probability_diverse_input=1.0,
        device=torch.device("cpu"), disparity=False, print_out=False,
        args=args,
    )
    div = model._PerturbationsModel__diverse_input

    for seed in (0, 1, 2):
        torch.manual_seed(seed)
        random.seed(seed)
        r0, r1, rgt = div(ro.nchw(img0), ro.nchw(img1), ro.nchw(gt))

        # replay the same draws
        torch.manual_seed(seed)
        random.seed(seed)
        assert torch.rand(1).item() <= 1.0
        nh = random.randint(int(H - H / 10.0), H)
        nw = random.randint(int(W - W / 10.0), W)
        top = random.randint(0, H - nh)
        left = random.randint(0, W - nw)

        o0, o1, ogt = ga.apply_diverse_input(
            jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(gt),
            nh, nw, top, left,
        )
        np.testing.assert_allclose(np.asarray(o0), ro.nhwc(r0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1), ro.nhwc(r1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ogt), ro.nhwc(rgt), atol=1e-4)


def test_diverse_input_prob_zero_passthrough(setup):
    _, _, predict, img0, img1, gt = setup
    o0, o1, ogt = ga.diverse_input(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(gt),
        jax.random.PRNGKey(0), 0.0,
    )
    np.testing.assert_array_equal(np.asarray(o0), img0)
    np.testing.assert_array_equal(np.asarray(ogt), gt)


def test_ifgsm_with_diverse_input_runs(setup):
    """The diversified attack jits and produces in-ball noise (the random
    draws differ from torch, so this is a semantic smoke check)."""
    _, _, predict, img0, img1, gt = setup
    cfg = ga.PerturbConfig(perturb_method="ifgsm", output_norm=0.02,
                           n_step=3, learning_rate=2e-3,
                           probability_diverse_input=0.5)
    n0, n1, a0, a1 = _our_perturb(predict, img0, img1, gt, cfg)
    assert np.abs(n0).max() <= 0.02 + 1e-6
    assert np.abs(n0).max() > 0
    assert np.all(a0 >= 0) and np.all(a0 <= 1)


@pytest.mark.parametrize("norotate", [False, True])
@pytest.mark.parametrize("fixed", [(-1, -1), (30, 20)])
def test_circle_transform_different_parity(setup, norotate, fixed):
    """NHWC circle_transform_different vs the reference (utils_patch.py:499)
    under identical np.random streams — placements, canvases and the
    synthesized GT flow must agree to interpolation tolerance."""
    ro.install_reference_abs()
    from patch_attacks.utils_patch import (
        circle_transform_different as ref_ctd,
    )
    from understanding_flow_robustness_tpu.attacks import (
        circle_transform_different,
    )

    rng = np.random.RandomState(5)
    ph = pw = 12
    patch = rng.rand(1, ph, pw, 3).astype(np.float64)
    yy, xx = np.mgrid[:ph, :pw]
    circ = ((yy - ph / 2) ** 2 + (xx - pw / 2) ** 2 <= (ph / 2) ** 2)
    mask = np.repeat(circ[None, :, :, None], 3, axis=3).astype(np.float64)
    data_shape = (1, 64, 96, 3)

    def nchw1(a):
        return np.transpose(a, (0, 3, 1, 2))

    for seed in (0, 3):
        np.random.seed(seed)
        rx_r, ry_r = None, None
        xr, xmr, flow_r, xpr, rx_r, ry_r, _ = ref_ctd(
            nchw1(patch), nchw1(mask), nchw1(patch.copy()),
            (1, 3, 64, 96), (1, 3, ph, pw), margin=2, norotate=norotate,
            fixed_loc=fixed,
        )
        np.random.seed(seed)
        xo, xmo, flow_o, xpo, rx_o, ry_o, _ = circle_transform_different(
            patch, mask, patch.copy(), data_shape, (1, ph, pw, 3),
            margin=2, norotate=norotate, fixed_loc=fixed,
        )
        assert rx_o == rx_r and ry_o == ry_r
        for ours, refs in ((xo, xr), (xmo, xmr), (xpo, xpr)):
            for o, r in zip(ours, refs):
                np.testing.assert_allclose(
                    o, np.transpose(r, (0, 2, 3, 1)), atol=1e-10
                )
        np.testing.assert_allclose(
            flow_o, np.transpose(flow_r, (0, 2, 3, 1)), atol=1e-10
        )


def test_circle_transform_different_gt_is_true_patch_motion():
    """The synthesized GT must transport target-frame patch pixels onto the
    reference frame: brute-force check that for points well inside the
    (unrotated) patch, pos + flow lands where the patch moved."""
    from understanding_flow_robustness_tpu.attacks import (
        circle_transform_different,
    )

    rng = np.random.RandomState(2)
    ph = pw = 16
    patch = rng.rand(1, ph, pw, 3)
    mask = np.ones((1, ph, pw, 3))
    np.random.seed(123)
    x, xm, out_flow, xp, rxs, rys, _ = circle_transform_different(
        patch, mask, patch.copy(), (1, 80, 120, 3), (1, ph, pw, 3),
        norotate=True,  # isolate the translation+zoom part of the GT
    )
    (rx, rx_ref), (ry, ry_ref) = rxs, rys
    # with norotate, GT = (translation) * zoom_ref/zoom_tgt everywhere in
    # the patch; the patch centre must map centre -> centre exactly
    h_t = np.count_nonzero(xm[0][0, :, rx + 1, 0] > 0)  # tgt patch height
    h_r = np.count_nonzero(xm[1][0, :, rx_ref + 1, 0] > 0)
    inside = xm[0][0, :, :, 0] > 0
    u = out_flow[0, :, :, 0][inside]
    v = out_flow[0, :, :, 1][inside]
    assert np.allclose(u, u[0]) and np.allclose(v, v[0])
    # centre of tgt patch + flow ≈ centre of ref patch (within the zoom
    # ratio's sub-pixel scaling of the translation)
    cy_t = ry + h_t / 2
    cy_r = ry_ref + h_r / 2
    assert abs(cy_t + v[0] - cy_r) < 2.0
    assert out_flow[0, :, :, 2][inside].max() == pytest.approx(
        out_flow[0, :, :, 2][inside].min()
    )


def test_patch_attack_trajectory_parity(setup):
    """Our lax.while_loop patch attack vs patch_attacks/main.py::attack."""
    pm, net, predict, img0, img1, gt = setup
    import patch_attacks.main as pam

    rng = np.random.RandomState(11)
    # square patch canvas in the image corner
    mask = np.zeros((1, H, W, 3), np.float32)
    mask[:, 2:8, 3:9, :] = 1.0
    patch = np.zeros((1, H, W, 3), np.float32)
    patch[:, 2:8, 3:9, :] = rng.rand(6, 6, 3)
    patch_init = patch.copy()
    target = -rng.randn(1, H, W, 2).astype(np.float32)

    for max_count, l2 in [(1, False), (3, False), (3, True), (5, False)]:
        pam.args = Namespace(
            flownet="tinyFlowNetC", l2=l2, alpha=0.0, lr=100.0,
            max_count=max_count, log_terminal=False,
        )
        adv_tgt_r, _, adv_ref_r, patch_r = pam.attack(
            net, ro.nchw(img0), None, ro.nchw(img1),
            ro.nchw(patch).clone(), ro.nchw(mask), ro.nchw(patch_init),
            ro.nchw(target), None,
        )

        cfg = PatchAttackConfig(lr=100.0, alpha=0.0, max_count=max_count,
                                l2=l2)
        step = make_patch_attack_step(predict, cfg)
        adv_tgt_o, adv_ref_o, patch_o, loss_o, count_o = step(
            jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(patch),
            jnp.asarray(mask), jnp.asarray(patch_init), jnp.asarray(target),
        )
        assert int(count_o) == max_count
        np.testing.assert_allclose(
            np.asarray(patch_o) * mask,
            ro.nhwc(patch_r.detach()) * mask,
            atol=5e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(adv_tgt_o), ro.nhwc(adv_tgt_r.detach()), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(adv_ref_o), ro.nhwc(adv_ref_r.detach()), atol=5e-4
        )


# ---------------------------------------------------------------------------
# Universal perturbation: trajectory parity vs the EXECUTED reference
# global_attacks/universal_perturbation.py::attack (:452-530)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def up_module(setup):
    """Import the reference universal-perturbation script (it parses argv at
    module level, :158 — shield it)."""
    import sys

    old_argv = sys.argv
    sys.argv = ["universal_perturbation.py"]
    try:
        import global_attacks.universal_perturbation as up
    finally:
        sys.argv = old_argv
    return up


def _universal_case(setup, up, method, add_gaussian, n_step, mode="both"):
    from understanding_flow_robustness_tpu.attacks.universal import (
        UniversalConfig,
        make_universal_attack_step,
    )

    pm, net, predict, img0, img1, gt = setup
    rng = np.random.RandomState(13)
    noise0 = ((rng.rand(1, H, W, 3) - 0.5) * 0.04).astype(np.float32)
    noise1 = ((rng.rand(1, H, W, 3) - 0.5) * 0.04).astype(np.float32)
    # add_gaussian flips the loop to ASCENT toward a noisy clean-flow target
    # (:518-520); both frameworks receive the identical explicit target.
    target = rng.randn(1, H, W, 2).astype(np.float32)

    args = Namespace(
        n_step=n_step, perturb_method=method, perturb_mode=mode,
        learning_rate=2e-3, add_gaussian=add_gaussian, output_norm=0.02,
        flow_loss="l2", flownet="tiny", return_feat_maps=False,
    )
    upert = torch.stack([ro.nchw(noise0), ro.nchw(noise1)], dim=1)
    adv0_r, _, adv1_r, pert_r = up.attack(
        net, ro.nchw(img0), ro.nchw(img1), upert, ro.nchw(target), args
    )

    cfg = UniversalConfig(
        perturb_method=method, perturb_mode=mode, output_norm=0.02,
        n_step=n_step, learning_rate=2e-3, flow_loss="l2",
        add_gaussian=add_gaussian,
    )
    attack = make_universal_attack_step(predict, cfg)
    adv0_o, adv1_o, n0_o, n1_o = attack(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(noise0),
        jnp.asarray(noise1), jnp.asarray(target),
    )

    ours = (np.asarray(adv0_o), np.asarray(adv1_o),
            np.asarray(n0_o), np.asarray(n1_o))
    refs = (ro.nhwc(adv0_r.detach()), ro.nhwc(adv1_r.detach()),
            ro.nhwc(pert_r[:, 0].detach()), ro.nhwc(pert_r[:, 1].detach()))
    _assert_traj_close(ours, refs, 2e-3, sign_method=("ifgsm" in method))


@pytest.mark.parametrize("method", ["ifgsm", "ifgm"])
@pytest.mark.parametrize("add_gaussian", [False, True])
def test_universal_attack_parity(setup, up_module, method, add_gaussian):
    # n_step probes the trajectory: deterministic loop, so the step-k noise
    # IS trajectory point k
    for n_step in (1, 2, 5):
        _universal_case(setup, up_module, method, add_gaussian, n_step)


@pytest.mark.parametrize("mode", ["left", "right"])
def test_universal_attack_parity_modes(setup, up_module, mode):
    _universal_case(setup, up_module, "ifgsm", False, 3, mode=mode)


def test_universal_train_accumulation_parity(setup, up_module):
    """Cross-batch accumulation semantics (:354-449): the shared noise pair
    carries between batches; target = -clean_flow per batch."""
    from understanding_flow_robustness_tpu.attacks.universal import (
        UniversalConfig,
        make_universal_attack_step,
        train_universal_perturbation,
    )

    pm, net, predict, img0, img1, gt = setup
    up = up_module
    rng = np.random.RandomState(29)
    batches = [
        (rng.rand(1, H, W, 3).astype(np.float32),
         rng.rand(1, H, W, 3).astype(np.float32))
        for _ in range(3)
    ]

    args = Namespace(
        n_step=3, perturb_method="ifgm", perturb_mode="both",
        learning_rate=2e-3, add_gaussian=False, output_norm=0.02,
        flow_loss="l2", flownet="tiny", return_feat_maps=False,
    )
    pert = torch.zeros(1, 2, 3, H, W)
    for a, b in batches:
        with torch.no_grad():
            flow = net(ro.nchw(a), ro.nchw(b))
        _, _, _, pert = up.attack(
            net, ro.nchw(a), ro.nchw(b), pert, -1.0 * flow, args
        )

    cfg = UniversalConfig(perturb_method="ifgm", perturb_mode="both",
                          output_norm=0.02, n_step=3, learning_rate=2e-3,
                          flow_loss="l2", add_gaussian=False)
    attack = make_universal_attack_step(predict, cfg)
    predict_jit = jax.jit(predict)
    n0, n1 = train_universal_perturbation(
        predict_jit, attack, lambda: iter(batches), (1, H, W, 3), cfg,
        epochs=1,
    )
    np.testing.assert_allclose(n0, ro.nhwc(pert[:, 0]), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(n1, ro.nhwc(pert[:, 1]), atol=5e-5, rtol=1e-3)
