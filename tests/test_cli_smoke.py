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
