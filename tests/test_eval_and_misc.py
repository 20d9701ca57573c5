"""Evaluation suite, corruptions, meters, embedding, native-kernel tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu import flowviz
from understanding_flow_robustness_tpu.attacks import corruptions as C
from understanding_flow_robustness_tpu.utils import (
    AverageMeter,
    gaussian_mmd,
    tensor2array,
    tsne,
)

RNG = np.random.RandomState(9)


class _StubModel:
    """Duck-typed FlowModel for evaluation tests (zero-flow predictor)."""

    is_raft = False
    size_multiple = 8

    def predict(self, img1, img2):
        return jnp.zeros(img1.shape[:3] + (2,), jnp.float32)


class _PairDataset:
    def __init__(self, n=3, h=60, w=84, flow_mag=2.0, sparse=False):
        self.n, self.h, self.w = n, h, w
        self.flow_mag = flow_mag
        self.sparse = sparse

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img1 = (RNG.rand(self.h, self.w, 3) * 255).astype(np.float32)
        img2 = (RNG.rand(self.h, self.w, 3) * 255).astype(np.float32)
        flow = np.full((self.h, self.w, 2), self.flow_mag, np.float32)
        valid = np.ones((self.h, self.w), np.float32)
        return img1, img2, flow, valid


def test_validate_kitti_f1_definition():
    from understanding_flow_robustness_tpu.training.evaluate import (
        validate_kitti,
    )

    # zero predictor vs constant GT of magnitude sqrt(8) ~ 2.83 < 3px:
    # epe = 2.83 <= 3 -> F1 outliers 0%
    res = validate_kitti(_StubModel(), _PairDataset(flow_mag=2.0))
    assert abs(res["kitti-epe"] - np.sqrt(8)) < 1e-3
    assert res["kitti-f1"] == 0.0

    # magnitude sqrt(3200) = 40: epe > 3 and epe/mag = 1 > 0.05 -> 100%
    res = validate_kitti(_StubModel(), _PairDataset(flow_mag=40.0))
    assert res["kitti-f1"] == 100.0


def test_validate_chairs_epe():
    from understanding_flow_robustness_tpu.training.evaluate import (
        validate_chairs,
    )

    res = validate_chairs(_StubModel(), _PairDataset(flow_mag=1.0))
    assert abs(res["chairs"] - np.sqrt(2)) < 1e-3


def test_kitti_submission_writer(tmp_path):
    from understanding_flow_robustness_tpu.training.evaluate import (
        create_kitti_submission,
    )

    class _TestDataset(_PairDataset):
        def __getitem__(self, i):
            img1, img2, _, _ = super().__getitem__(i)
            return img1, img2, [f"{i:06d}_10.png"]

    out = str(tmp_path / "sub")
    create_kitti_submission(_StubModel(), _TestDataset(n=2), out)
    files = sorted(os.listdir(out))
    assert files == ["000000_10.png", "000001_10.png"]
    flow, valid = flowviz.read_flow_png(os.path.join(out, files[0]))
    assert flow.shape == (60, 84, 2)
    np.testing.assert_allclose(flow, 0.0, atol=1 / 64)


@pytest.mark.parametrize("name", C.get_corruption_names("all"))
def test_corruptions_shapes_and_range(name):
    img = (RNG.rand(48, 64, 3) * 255).astype(np.uint8)
    out = C.corrupt(img, name, severity=3)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_corruption_severity_monotone_noise():
    img = np.full((64, 64, 3), 128, np.uint8)
    np.random.seed(0)
    d1 = np.abs(C.corrupt(img, "gaussian_noise", 1).astype(float) - 128).mean()
    d5 = np.abs(C.corrupt(img, "gaussian_noise", 5).astype(float) - 128).mean()
    assert d5 > d1 * 2


def test_average_meter_min_max():
    m = AverageMeter(i=2)
    m.update([1.0, 10.0])
    m.update([3.0, 20.0])
    assert m.avg == [2.0, 15.0]
    assert m.min == [1.0, 10.0]
    assert m.max == [3.0, 20.0]


def test_mmd_separates_distributions():
    a = RNG.randn(20, 8)
    b = RNG.randn(20, 8)
    c = RNG.randn(20, 8) + 3.0
    assert gaussian_mmd(a, c) > 5 * max(gaussian_mmd(a, b), 1e-6)


def test_tsne_shape():
    x = np.concatenate([RNG.randn(15, 6), RNG.randn(15, 6) + 5])
    y = tsne(x, n_iter=100, perplexity=5)
    assert y.shape == (30, 2)
    assert np.isfinite(y).all()


def test_tensor2array_heatmap():
    a = tensor2array(RNG.rand(6, 8).astype(np.float32), max_value=1.0)
    assert a.shape == (6, 8, 3) and 0 <= a.min() and a.max() <= 1


def test_flownet2cs_forward():
    from understanding_flow_robustness_tpu.models import FlowNet2CS

    m = FlowNet2CS(stages=1)
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, x)
    out = m.apply(v, x, x)
    assert out.shape == (1, 64, 64, 2)


def test_patch3d_projection_identity_pose():
    """With identity poses the patch projects onto itself (flow ~ 0)."""
    from understanding_flow_robustness_tpu.attacks.patch3d import (
        project_patch_3d_scene,
    )

    h, w = 64, 96
    calib = {
        "P_imu_cam": np.eye(4),
        "P_imu_img": np.vstack([
            np.array([[100.0, 0, w / 2, 0], [0, 100.0, h / 2, 0],
                      [0, 0, 1, 0]]),
            [0, 0, 0, 1],
        ])[:3],
        "cam": {"focal_length_x": 100.0, "focal_length_y": 100.0,
                "cx": w / 2, "cy": h / 2, "baseline": 0.54},
    }
    poses = [np.eye(4)] * 3
    disp = np.full((h, w), 10.0, np.float32)
    canvas = np.zeros((1, h, w, 3), np.float32)
    canvas[:, 20:36, 30:46] = 1.0
    mask = canvas.copy()
    fpf = np.zeros((1, h, w, 3), np.float32)

    pf, mf, pp, mp, flow = project_patch_3d_scene(
        calib, poses, disp, canvas, mask, 30, 20, (1, 16, 16, 3),
        w, h, fpf,
    )
    # identical poses -> zero induced flow; the warped patch keeps its mass
    # modulo the reference's inherent sub-pixel grid shift (a
    # (size-1)-normalized grid sampled align_corners=False,
    # utils_patch.py:969-976)
    assert np.abs(flow[..., :2]).max() < 1e-3
    assert abs(pf.sum() - canvas.sum()) / canvas.sum() < 0.05
    # patch center survives exactly
    np.testing.assert_allclose(pf[0, 24:32, 34:42], 1.0, atol=2e-2)


def test_validate_disparity_branch(tmp_path):
    """is_disparity mode reports MAE/RMSE/D1 before/after over gt>0
    (global_attacks/log_utils.py:251-305)."""
    from understanding_flow_robustness_tpu.attacks.log_utils import validate

    rng = np.random.RandomState(0)
    gt = rng.rand(12, 16).astype(np.float32) * 60
    gt[0, :4] = 0  # invalid
    origin = gt + rng.randn(12, 16).astype(np.float32)
    output = gt + 8 * rng.randn(12, 16).astype(np.float32)
    n0 = rng.randn(12, 16, 3).astype(np.float32) * 0.01
    res = validate([n0], [n0], [origin], [output], [gt],
                   output_path=str(tmp_path), is_disparity=True)
    assert res["disparity_d1_attacked"][0] >= res["disparity_d1_unattacked"][0]
    assert res["disparity_rmse_attacked"][0] > res["disparity_rmse_unattacked"][0]
    assert (tmp_path / "results0.txt").exists()

    # D1 is reported in PERCENT (reference log_utils.py:351-355 multiplies
    # by 100 before aggregating)
    from understanding_flow_robustness_tpu.attacks.eval_utils import d1_error

    mask = np.logical_and(gt > 0.0, ~np.isnan(gt))
    direct = float(d1_error(output[mask], gt[mask]))
    np.testing.assert_allclose(
        res["disparity_d1_attacked"][0], direct * 100.0, rtol=1e-6)


def test_build_arbitrary_gt_uniform_matches_torch_nearest():
    """'uniform_N' upsamples with torch-nearest semantics
    (perturb_main.py:358-363), exact for non-divisor factors too."""
    import torch
    import torch.nn.functional as F

    from understanding_flow_robustness_tpu.attacks.perturb_runner import (
        build_arbitrary_gt,
    )

    H, W, factor = 50, 70, 16   # 16 divides neither 50 nor 70
    rng = np.random.RandomState(3)
    helper = np.zeros((H, W, 3), np.float32)
    gt = build_arbitrary_gt(f"uniform_{factor}", helper, rng)
    assert gt.shape == (H, W, 3) and (gt[..., 2] == 1).all()

    rng2 = np.random.RandomState(3)
    small = rng2.uniform(-180, 180, (H // factor, W // factor, 3)).astype(
        np.float32)
    ref = F.interpolate(
        torch.from_numpy(small.transpose(2, 0, 1))[None],
        size=(H, W), mode="nearest",
    )[0].numpy().transpose(1, 2, 0)
    ref[..., 2] = 1
    np.testing.assert_array_equal(gt, ref)


def test_perturb_runner_homogeneous_single_sample(tmp_path):
    """--homogeneous evaluates exactly ONE sample (perturb_main.py:777)."""
    import jax.numpy as jnp

    from understanding_flow_robustness_tpu.attacks.perturb_runner import (
        RunConfig,
        run,
    )
    from understanding_flow_robustness_tpu.attacks.global_attacks import (
        PerturbConfig,
    )

    def predict(a, b):
        return (a - b)[..., :2] * 3.0

    rng = np.random.RandomState(0)

    def samples():
        for _ in range(3):
            img = rng.rand(1, 16, 24, 3).astype(np.float32)
            gt = np.concatenate(
                [rng.randn(1, 16, 24, 2), np.ones((1, 16, 24, 1))], -1
            ).astype(np.float32)
            yield img, img.copy(), gt, gt

    cfg = RunConfig(perturb=PerturbConfig(perturb_method="ifgsm", n_step=2),
                    output_path=str(tmp_path / "homog"), homogeneous=True)
    run(predict, samples(), cfg)
    logf = tmp_path / "homog" / "log0.txt"
    assert sum(1 for line in open(logf) if "epe" in line) == 1


def test_perturb_runner_invalid_method_raises(tmp_path):
    from understanding_flow_robustness_tpu.attacks.perturb_runner import (
        RunConfig,
        run,
    )
    from understanding_flow_robustness_tpu.attacks.global_attacks import (
        PerturbConfig,
    )

    cfg = RunConfig(perturb=PerturbConfig(perturb_method="ifsgm"),
                    output_path=str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="Invalid perturbation method"):
        run(lambda a, b: a[..., :2], iter(()), cfg)
    assert not (tmp_path / "nope").exists()
