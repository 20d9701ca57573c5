"""Parity of the long-tail flow-viz utilities against the executed
reference (flowutils/flow_viz.py and flowutils/flowlib.py)."""

from __future__ import annotations

import numpy as np
import pytest

import reference_oracle as ro
from understanding_flow_robustness_tpu import flowviz

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module", autouse=True)
def _ref():
    ro.install_reference_abs()


@pytest.mark.parametrize("logscale", [True, False])
def test_compute_flow_image_parity(logscale):
    from flowutils.flow_viz import computeFlowImage

    u = (RNG.randn(24, 32) * 8).astype(np.float64)
    v = (RNG.randn(24, 32) * 8).astype(np.float64)
    ref = computeFlowImage(u.copy(), v.copy(), logscale=logscale)
    ours = flowviz.compute_flow_image(u, v, logscale=logscale)
    np.testing.assert_array_equal(ours, ref)


def test_batch_compute_flow_image_shape():
    uv = RNG.randn(2, 8, 10, 2).astype(np.float32)
    out = flowviz.batch_compute_flow_image(uv)
    assert out.shape == (2, 8, 10, 3)
    assert 0 <= out.min() and out.max() <= 1


def test_segment_flow_parity():
    from flowutils.flowlib import segment_flow as ref_segment

    flow = (RNG.randn(16, 20, 2) * 5).astype(np.float64)
    flow[0, 0] = 0  # zero-flow pixel (lands in class 1 upstream)
    flow[1, 1] = [3, 0]
    flow[2, 2] = [-3, 0]
    flow[3, 3] = [0, 4]
    ref = ref_segment(flow.copy())
    ours = flowviz.segment_flow(flow.copy())
    np.testing.assert_array_equal(ours, ref)


def test_disp_to_flowfile_roundtrip(tmp_path):
    disp = (RNG.rand(12, 17) * 80).astype(np.float32)
    p = str(tmp_path / "disp.flo")
    flowviz.disp_to_flowfile(disp, p)
    back = flowviz.read_flo(p)
    np.testing.assert_allclose(back[..., 0], disp, atol=0)
    assert np.all(back[..., 1] == 0)


def test_scale_image_parity():
    from flowutils.flowlib import scale_image as ref_scale

    img = RNG.rand(9, 11) * 300 - 40
    np.testing.assert_array_equal(
        flowviz.scale_image(img, (0, 255)), ref_scale(img, (0, 255))
    )
    np.testing.assert_array_equal(
        flowviz.scale_image(img, (10, 90)), ref_scale(img, (10, 90))
    )


def test_validation_kitti2015mv_layout(tmp_path):
    """Synthesize the multiview dir layout and check the annotated-frame /
    bare-frame split of GT availability (validation_flow.py:84-105)."""
    from PIL import Image

    from understanding_flow_robustness_tpu.data import (
        ValidationFlowKitti2015MV,
    )
    from understanding_flow_robustness_tpu.flowviz import write_flow_png

    h, w = 20, 28
    img_dir = tmp_path / "training" / "image_2"
    flow_dir = tmp_path / "training" / "flow_occ"
    disp_dir = tmp_path / "training" / "disp_occ_0"
    for d in (img_dir, flow_dir, disp_dir):
        d.mkdir(parents=True)
    for frame in range(12):
        arr = RNG.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"000000_{frame:02d}.png")
    flow = RNG.randn(h, w, 2).astype(np.float32) * 3
    valid = np.ones((h, w), np.float32)
    write_flow_png(str(flow_dir / "000000_10.png"), flow, valid)
    disp = (RNG.rand(h, w) * 60 * 256).astype(np.uint16)
    Image.fromarray(disp, mode="I;16").save(disp_dir / "000000_10.png")

    ds = ValidationFlowKitti2015MV(str(tmp_path), N=12)
    assert len(ds) == 12

    past, tgt, fut, gt, gtd, calib, poses = ds[10]  # annotated frame
    assert gt.shape == (h, w, 3) and gt[..., 2].max() == 1
    np.testing.assert_allclose(gt[..., :2], flow, atol=1 / 64)
    assert past.max() > 0 and gtd.max() > 0

    past, tgt, fut, gt, gtd, _, _ = ds[5]  # bare frame: zero GT, zero past
    assert gt.max() == 0 and float(np.max(past)) == 0
