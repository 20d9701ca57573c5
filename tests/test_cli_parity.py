"""End-to-end smoke of the one-command parity harness (cli.parity).

VERDICT r4 missing #1: the "EPE within 1%" BASELINE bar needs a single
documented command that emits the full zoo-EPE + adversarial-degradation
table the moment a zoo-equipped environment exists.  These tests run that
command end-to-end on synthetic fixtures so only the data is missing:
measured table, markdown/JSON artifacts, the --expected diff logic (pass
AND fail directions), and the trained-patch columns.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from understanding_flow_robustness_tpu.cli import parity


def _run(tmp_path, extra=(), models="FlowNetS"):
    out = os.path.join(str(tmp_path), "parity_out")
    argv = [
        "--models", models, "--valsets", "kitti2015",
        "--synthetic", "2", "--img_height", "64", "--img_width", "128",
        "--attack_steps", "2", "--zoo", str(tmp_path / "no_zoo"),
        "--out", out,
    ] + list(extra)
    rc = parity.main(argv)
    return rc, out


def test_parity_synthetic_smoke(tmp_path):
    rc, out = _run(tmp_path)
    assert rc == 0
    table = json.load(open(os.path.join(out, "parity.json")))["table"]
    row = table["FlowNetS"]["kitti2015"]
    assert set(row) >= {"epe", "ifgsm_epe", "ifgsm_cossim"}
    assert np.isfinite(row["epe"]) and np.isfinite(row["ifgsm_epe"])
    md = open(os.path.join(out, "parity_table.md")).read()
    assert "FlowNetS" in md and "ifgsm_epe" in md


def test_parity_expected_diff_pass_and_fail(tmp_path):
    rc, out = _run(tmp_path)
    measured = json.load(open(os.path.join(out, "parity.json")))
    epe = measured["table"]["FlowNetS"]["kitti2015"]["epe"]

    exp_ok = tmp_path / "exp_ok.json"
    exp_ok.write_text(json.dumps(
        {"FlowNetS": {"kitti2015": {"epe": epe * 1.005}}}))
    rc, _ = _run(tmp_path, ["--expected", str(exp_ok)])
    assert rc == 0, "0.5% clean-EPE delta must pass the 1% bar"

    exp_bad = tmp_path / "exp_bad.json"
    exp_bad.write_text(json.dumps(
        {"FlowNetS": {"kitti2015": {"epe": epe * 1.5}}}))
    rc, out = _run(tmp_path, ["--expected", str(exp_bad)])
    assert rc == 2, "50% clean-EPE delta must fail"
    diffs = json.load(open(os.path.join(out, "parity.json")))["diffs"]
    assert any(not d[-1] for d in diffs)


def test_parity_patch_columns(tmp_path):
    patch = tmp_path / "FlowNetS.npy"
    rng = np.random.RandomState(0)
    np.save(patch, rng.rand(1, 32, 32, 3).astype(np.float32))
    rc, out = _run(
        tmp_path, ["--patch_tmpl", str(tmp_path / "{model}.npy")])
    assert rc == 0
    row = json.load(open(os.path.join(out, "parity.json")))[
        "table"]["FlowNetS"]["kitti2015"]
    assert "patch_adv_epe" in row and np.isfinite(row["patch_adv_epe"])
