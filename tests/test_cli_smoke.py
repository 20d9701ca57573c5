"""Data-free smoke tests for the CLI entry points (--synthetic mode),
asserting the reference's output artifact taxonomy is produced
(patch_attacks/test_patch.py:163-231: per-mode CSV + image directories)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from understanding_flow_robustness_tpu.cli import test_patch


@pytest.mark.parametrize(
    "extra, suffix",
    [
        ([], ""),
        (["--different_pos"], "_different_pos"),
        (["--true_motion"], "_true_motion"),
    ],
)
def test_test_patch_cli_modes(tmp_path, extra, suffix):
    vals = test_patch.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--random_patch", "gray", "--patch_size", "24",
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--output", str(tmp_path), "--name", "smoke",
    ] + extra)
    assert len(vals) == 4 and all(np.isfinite(v) for v in vals)
    out = tmp_path / "smoke"
    assert (out / f"test_results{suffix}.csv").exists()
    assert (out / f"test_result_scenes{suffix}.csv").exists()
    assert (out / f"images_test{suffix}" / "viz000.jpg").exists()


def test_test_patch_cli_ignore_mask_flow(tmp_path):
    vals = test_patch.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--random_patch", "gray", "--patch_size", "24",
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--output", str(tmp_path), "--name", "smoke",
        "--ignore_mask_flow", "--no_viz",
    ])
    assert all(np.isfinite(v) for v in vals)
    assert not (tmp_path / "smoke" / "images_test" / "viz000.jpg").exists()


@pytest.mark.parametrize(
    "extra",
    [
        ["--norotate"],
        [],                      # random rotation per swept location
        ["--true_motion"],       # 3D projection per location
        ["--ignore_mask_flow", "--norotate"],
    ],
)
def test_moving_patch_cli(tmp_path, extra):
    from understanding_flow_robustness_tpu.cli import test_moving_patch

    vals = test_moving_patch.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--random_patch", "gray", "--patch_size", "24",
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--stride", "80", "--output", str(tmp_path), "--name", "smoke",
        "--no_viz",
    ] + extra)
    assert len(vals) == 4 and all(np.isfinite(v) for v in vals)
    out = tmp_path / "smoke"
    assert (out / "moving_results.csv").exists()
    assert (out / "moving_result_scenes.csv").exists()


def test_moving_patch_cli_whole_img(tmp_path):
    """--whole_img: the loaded patch/mask are full-image canvases
    (test_moving_patch.py:63-68,307-343)."""
    from understanding_flow_robustness_tpu.cli import test_moving_patch

    # a full-image-sized patch canvas saved to disk (whole_img skips
    # placement entirely, so the patch must already be image-shaped)
    patch = np.random.RandomState(0).rand(1, 128, 192, 3).astype(np.float32)
    np.save(tmp_path / "whole_patch.npy", patch)
    vals = test_moving_patch.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--patch_path", str(tmp_path / "whole_patch.npy"),
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--stride", "80", "--output", str(tmp_path), "--name", "smoke",
        "--no_viz", "--whole_img", "1",
    ])
    assert all(np.isfinite(v) for v in vals)
