"""Data-layer tests: flow I/O round trips, augmentors, datasets + loader
over synthetic KITTI-format files on disk."""

import os

import numpy as np

from understanding_flow_robustness_tpu import flowviz
from understanding_flow_robustness_tpu.data import (
    DataLoader,
    FlowAugmentor,
    KITTI,
    SparseFlowAugmentor,
    ValidationFlowKitti2015,
    pad_batch,
)

RNG = np.random.RandomState(11)


def test_flo_roundtrip(tmp_path):
    flow = RNG.randn(17, 23, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    flowviz.write_flo(p, flow)
    got = flowviz.read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_kitti_png_roundtrip(tmp_path):
    flow = (RNG.randn(16, 24, 2) * 10).astype(np.float32)
    # KITTI encoding quantizes to 1/64 px
    flow = np.round(flow * 64) / 64
    valid = (RNG.rand(16, 24) > 0.3).astype(np.float32)
    p = str(tmp_path / "f.png")
    flowviz.write_flow_png(p, flow, valid)
    got, got_valid = flowviz.read_flow_png(p)
    np.testing.assert_allclose(got, flow, atol=1 / 64 + 1e-6)
    np.testing.assert_array_equal(got_valid, valid)


def test_pfm_roundtrip(tmp_path):
    img = RNG.randn(9, 13).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    flowviz.write_pfm(p, img)
    got = flowviz.read_pfm(p)
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_flow_to_image_shapes():
    flow = RNG.randn(20, 30, 2).astype(np.float32) * 5
    img = flowviz.flow_to_image(flow)
    assert img.shape == (20, 30, 3) and img.dtype == np.uint8
    # fixed-radius normalization must be deterministic
    img2 = flowviz.flow_to_image(flow, maxr=10.0)
    assert img2.shape == (20, 30, 3)


def test_flow_error_ignores_unknown():
    gt = np.zeros((4, 4, 2), np.float32)
    gt[..., 0] = 1.0
    gt[0, 0] = 1e9  # unknown
    pred = np.zeros((4, 4, 2), np.float32)
    err = flowviz.flow_error(gt[..., 0], gt[..., 1], pred[..., 0], pred[..., 1])
    assert abs(err - 1.0) < 1e-6


def test_flow_augmentor_shapes():
    img1 = (RNG.rand(120, 160, 3) * 255).astype(np.uint8)
    img2 = (RNG.rand(120, 160, 3) * 255).astype(np.uint8)
    flow = RNG.randn(120, 160, 2).astype(np.float32)
    aug = FlowAugmentor(crop_size=(96, 128))
    for _ in range(5):
        a, b, f = aug(img1, img2, flow)
        assert a.shape == (96, 128, 3)
        assert f.shape == (96, 128, 2) and f.dtype == np.float32


def test_sparse_augmentor_shapes():
    img1 = (RNG.rand(120, 160, 3) * 255).astype(np.uint8)
    img2 = (RNG.rand(120, 160, 3) * 255).astype(np.uint8)
    flow = RNG.randn(120, 160, 2).astype(np.float32)
    valid = (RNG.rand(120, 160) > 0.5).astype(np.float32)
    aug = SparseFlowAugmentor(crop_size=(96, 128))
    a, b, f, v = aug(img1, img2, flow, valid)
    assert a.shape == (96, 128, 3) and f.shape == (96, 128, 2)
    assert v.shape == (96, 128)


def _make_kitti_tree(root, n=3, h=120, w=160, year="2015"):
    imdir = "image_2" if year == "2015" else "colored_0"
    os.makedirs(os.path.join(root, "training", imdir), exist_ok=True)
    os.makedirs(os.path.join(root, "training", "flow_occ"), exist_ok=True)
    import cv2

    for i in range(n):
        z = str(i).zfill(6)
        for suffix in ["_09", "_10", "_11"]:
            img = (RNG.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(root, "training", imdir, z + suffix + ".png"), img
            )
        flow = np.round(RNG.randn(h, w, 2) * 64) / 64
        valid = np.ones((h, w), np.float32)
        flowviz.write_flow_png(
            os.path.join(root, "training", "flow_occ", z + "_10.png"),
            flow.astype(np.float32), valid,
        )


def test_kitti_dataset_and_loader(tmp_path):
    root = str(tmp_path / "KITTI" / "2015")
    _make_kitti_tree(root, n=4)
    ds = KITTI(aug_params={"crop_size": (96, 128)}, root=root)
    assert len(ds) == 4
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (96, 128, 3) and flow.shape == (96, 128, 2)

    loader = DataLoader(ds, batch_size=2, num_workers=2, pad_multiple=8)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image1"].shape == (2, 96, 128, 3)
    assert b["image1"].max() <= 1.0
    assert b["flow"].shape == (2, 96, 128, 2)


def test_validation_kitti2015(tmp_path):
    root = str(tmp_path / "scene_flow")
    _make_kitti_tree(root, n=2)
    ds = ValidationFlowKitti2015(root, N=2)
    past, tgt, fut, gt_flow, gt_disp, calib, poses = ds[0]
    assert tgt.shape == (120, 160, 3)
    assert gt_flow.shape == (120, 160, 3)
    assert len(ds) == 2


def test_pad_batch_static_shapes():
    img1 = RNG.rand(1, 375, 1242, 3).astype(np.float32)
    img2 = RNG.rand(1, 375, 1242, 3).astype(np.float32)
    flow = RNG.randn(1, 375, 1242, 2).astype(np.float32)
    valid = np.ones((1, 375, 1242), np.float32)
    a, b, f, v, pad = pad_batch(img1, img2, flow, valid, multiple=8)
    assert a.shape[1] % 8 == 0 and a.shape[2] % 8 == 0
    assert v.shape == a.shape[:3]
    assert pad == (0, 1, 3, 3)  # kitti mode: bottom/right-favoring


def test_dataloader_reshuffles_across_epochs():
    """One DataLoader reused across epochs reshuffles each pass (its
    RandomState advances), matching torch DataLoader(shuffle=True); an
    epoch loop must NOT see the seed's first permutation every time."""

    class Tagged:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            img = np.full((4, 4, 3), float(i), np.float32)
            return img, img, np.zeros((4, 4, 2), np.float32), \
                np.ones((4, 4), np.float32)

    loader = DataLoader(Tagged(), batch_size=1, shuffle=True,
                        num_workers=0, seed=7)
    epoch = lambda: [int(b["image1"][0, 0, 0, 0] * 255) for b in loader]
    orders = [epoch() for _ in range(3)]
    assert sorted(orders[0]) == sorted(orders[1])  # same samples
    assert orders[0] != orders[1] or orders[1] != orders[2]
