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


def test_run_perturb_model_homogeneous_evolve(tmp_path):
    """--homogeneous (perturb_main.py:477-481) + --show_evolve GIF dumps
    (perturb_model.py:604-614) + the reference output taxonomy
    (perturb_main.py:77-119)."""
    from understanding_flow_robustness_tpu.cli import run_perturb_model

    run_perturb_model.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--perturb_method", "ifgsm", "--n_step", "2",
        "--n_height", "64", "--n_width", "128", "--synthetic", "1",
        "--homogeneous", "--show_evolve",
        "--output_path", str(tmp_path),
    ])
    out = (tmp_path / "kitti2015" / "FlowNetS" / "both" / "homogeneous"
           / "ifgsm_l2" / "0.02")
    assert (out / "evolve" / "viz0_0.gif").exists()
    assert (out / "evolve" / "viz0_1.gif").exists()


def test_run_perturb_model_arbitrary_noise_index(tmp_path):
    """--arbitrary_noise_index: one sample's noise re-applied everywhere
    (perturb_main.py:385-448)."""
    from understanding_flow_robustness_tpu.cli import run_perturb_model

    run_perturb_model.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--perturb_method", "ifgsm", "--n_step", "2",
        "--n_height", "64", "--n_width", "128", "--synthetic", "2",
        "--arbitrary_noise_index", "1",
        "--output_path", str(tmp_path),
    ])
    out = (tmp_path / "kitti2015" / "FlowNetS" / "both" / "arbitraryNoise"
           / "1" / "ifgsm_l2" / "0.02")
    assert any(p.name.startswith("results") for p in out.iterdir())


def test_run_perturb_model_uniform_noise_universal(tmp_path):
    """--universal_evaluation --uniform_noise baseline
    (perturb_main.py:451-457) lands under the /universal/.../uniform
    taxonomy segment (perturb_main.py:85-115)."""
    from understanding_flow_robustness_tpu.cli import run_perturb_model

    run_perturb_model.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--universal_evaluation", "--uniform_noise",
        "--output_norm", "0.05",
        "--n_height", "64", "--n_width", "128", "--synthetic", "1",
        "--output_path", str(tmp_path),
    ])
    out = (tmp_path / "kitti2015" / "FlowNetS" / "universal" / "both"
           / "fgsm_l2" / "0.05" / "uniform")
    assert out.is_dir()


def test_run_perturb_model_dead_branches():
    """--disparity and --flow_loss corr raise like the reference
    (perturb_main.py:195-200 stereo_model=None; perturb_model.py:129-142)."""
    from understanding_flow_robustness_tpu.cli import run_perturb_model

    with pytest.raises(NotImplementedError):
        run_perturb_model.main(["--disparity", "--synthetic", "1"])
    with pytest.raises(NotImplementedError):
        run_perturb_model.main(["--flow_loss", "corr", "--synthetic", "1"])


def test_universal_cli_reference_flags(tmp_path):
    """The reference flag surface (universal_perturbation.py:31-158) and
    output taxonomy (:196-208): n_height/n_width, DEBUG truncation, seed
    folder naming, per-epoch .npy snapshots."""
    from understanding_flow_robustness_tpu.cli import universal_perturbation

    universal_perturbation.main([
        "--flownet", "FlowNetS", "--pretrained_path", "/nonexistent",
        "--n_height", "64", "--n_width", "128",
        "--epochs", "1", "--epoch_size", "1", "--n_step", "1",
        "--synthetic", "1", "--seed", "3", "--DEBUG",
        "--output_path", str(tmp_path),
    ])
    out = (tmp_path / "DEBUG" / "kitti2015" / "FlowNetS" / "universal"
           / "both" / "ifgsm_cossim" / "0.02" / "0.002_1_3")
    assert (out / "perturbations" / "epoch_0.npy").exists()
    assert (out / "args.json").exists()


def test_evaluate_cli_kitti(tmp_path):
    """Standalone eval CLI (reference training/evaluate.py:395-427):
    restore a weights file, run validate_kitti, both sequential and
    mesh-sharded (--n_devices, the DataParallel analog, evaluate.py:410)."""
    import json

    import cv2

    from understanding_flow_robustness_tpu import flowviz
    from understanding_flow_robustness_tpu.cli import evaluate
    from understanding_flow_robustness_tpu.models.registry import fetch_model
    from understanding_flow_robustness_tpu.training.checkpoint import (
        save_weights,
    )

    rng = np.random.RandomState(0)
    root = str(tmp_path / "KITTI" / "2015")
    os.makedirs(os.path.join(root, "training", "image_2"))
    os.makedirs(os.path.join(root, "training", "flow_occ"))
    for i in range(2):
        z = str(i).zfill(6)
        for suffix in ["_10", "_11"]:
            img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(root, "training", "image_2", z + suffix + ".png"),
                img,
            )
        flow = np.round(rng.randn(96, 128, 2) * 64) / 64
        flowviz.write_flow_png(
            os.path.join(root, "training", "flow_occ", z + "_10.png"),
            flow.astype(np.float32), np.ones((96, 128), np.float32),
        )

    model = fetch_model("FlowNetS", pretrained_path=None)
    wpath = str(tmp_path / "w.msgpack")
    save_weights(wpath, model.variables["params"])
    roots = json.dumps({"kitti": root})

    evaluate.main([
        "--model", wpath, "--dataset", "kitti", "--arch", "FlowNetS",
        "--data_roots", roots,
    ])
    evaluate.main([
        "--model", wpath, "--dataset", "kitti", "--arch", "FlowNetS",
        "--data_roots", roots, "--n_devices", "2",
    ])


@pytest.mark.parametrize(
    "arch_flags",
    [
        ["--flowNetC", "--flexible_larger_field", "--kernel_size", "3",
         "--numReps", "0", "--div_flow", "20"],
        ["--flowNetC", "--larger_field"],
        ["--small", "--cnorm", "instance"],   # RAFT small variant
    ],
)
def test_train_cli_reference_arch_flags(tmp_path, arch_flags):
    """Reference get_model() architecture dispatch (training/train.py:
    55-92): --flowNetC/--flexible_larger_field/--larger_field/--pwc and
    the RAFT encoder knobs, driven through the train CLI on synthetic
    data in DEBUG mode."""
    from understanding_flow_robustness_tpu.cli import train as train_cli

    train_cli.main([
        "--name", "smoke", "--stage", "chairs",
        "--num_steps", "1", "--batch_size", "1",
        "--image_size", "64", "64", "--synthetic", "1", "--DEBUG",
        "--checkpoint_dir", str(tmp_path),
    ] + arch_flags)


def test_train_cli_dropout_unsupported():
    from understanding_flow_robustness_tpu.cli import train as train_cli

    with pytest.raises(NotImplementedError):
        train_cli.main(["--dropout", "0.5", "--synthetic", "1", "--DEBUG"])


@pytest.mark.parametrize("flag", ["--flowNetCFlexible", "--pinard",
                                  "--update_no_motion_downsampling"])
def test_train_cli_dead_reference_flags_raise(flag):
    """Flags whose model construction is commented out in the reference
    itself (train.py:66-84) are accepted by the parser but raise with the
    citation instead of silently training the wrong architecture (which is
    what the reference's fall-through to RAFT would do)."""
    from understanding_flow_robustness_tpu.cli import train as train_cli

    with pytest.raises(NotImplementedError, match="dead in the reference"):
        train_cli.main([flag, "--synthetic", "1", "--DEBUG"])


def test_train_cli_alternate_corr_and_subset(tmp_path):
    """--alternate_corr forces the fused lookup (train.py:436) and
    --online_subset trains on a fixed index view
    (training/utils.py:275-276)."""
    from understanding_flow_robustness_tpu.cli import train as train_cli
    from understanding_flow_robustness_tpu.data.datasets import Subset

    ds = list(range(10))
    sub = Subset(ds, [7, 3])
    assert len(sub) == 2 and sub[0] == 7 and sub[1] == 3

    # --alternate_corr falls back to auto on the CPU backend (the Pallas
    # kernel only lowers on TPU), so the smoke run must still train.
    train_cli.main([
        "--name", "smoke", "--stage", "chairs", "--num_steps", "1",
        "--batch_size", "1", "--image_size", "64", "64",
        "--synthetic", "1", "--DEBUG", "--checkpoint_dir", str(tmp_path),
        "--model", "RAFT", "--small", "--alternate_corr",
    ])


def _write_pair_pngs(d, n=3, h=64, w=96):
    import cv2

    rng = np.random.RandomState(0)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        for sfx in ("_10", "_11"):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{i:06d}{sfx}.png"), img)


def test_infer_cli_dir_mode(tmp_path):
    """ufr-infer over a KITTI-style pair directory writes one artifact set
    per pair at the input resolution."""
    from understanding_flow_robustness_tpu.cli import infer

    src = str(tmp_path / "pairs")
    out = str(tmp_path / "out")
    _write_pair_pngs(src, n=3)
    done = infer.main([
        "--flownet", "FlowNetS", "--dir", src, "--output_dir", out,
        "--save", "flo,png,viz", "--batch_size", "2",
    ])
    assert done == 3
    from understanding_flow_robustness_tpu.flowviz import io as fio

    for i in range(3):
        flow = fio.read_flo(os.path.join(out, f"{i:06d}.flo"))
        assert flow.shape == (64, 96, 2)
        assert np.isfinite(flow).all()
        assert os.path.exists(os.path.join(out, f"{i:06d}_flow.png"))
        assert os.path.exists(os.path.join(out, f"{i:06d}_viz.png"))


def test_infer_cli_mesh_matches_single(tmp_path):
    """--devices 2 (data-parallel mesh) produces the same flows as one
    device."""
    from understanding_flow_robustness_tpu.cli import infer
    from understanding_flow_robustness_tpu.flowviz import io as fio

    src = str(tmp_path / "pairs")
    _write_pair_pngs(src, n=2)
    pairs = str(tmp_path / "pairs.txt")
    with open(pairs, "w") as f:
        for i in range(2):
            f.write(f"{src}/{i:06d}_10.png {src}/{i:06d}_11.png\n")

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    common = ["--flownet", "FlowNetS", "--pairs", pairs,
              "--batch_size", "2"]
    infer.main(common + ["--output_dir", out1, "--devices", "1"])
    infer.main(common + ["--output_dir", out2, "--devices", "2"])
    for i in range(2):
        a = fio.read_flo(os.path.join(out1, f"{i:06d}_10.flo"))
        b = fio.read_flo(os.path.join(out2, f"{i:06d}_10.flo"))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_infer_cli_rejects_bad_args(tmp_path):
    from understanding_flow_robustness_tpu.cli import infer

    with pytest.raises(SystemExit):
        infer.main(["--flownet", "FlowNetS"])  # no input selection
    with pytest.raises(SystemExit):
        infer.main(["--flownet", "FlowNetS", "--img1", "a", "--img2", "b",
                    "--batch_size", "3", "--devices", "2"])
    with pytest.raises(SystemExit):
        infer.main(["--flownet", "FlowNetS", "--img1", "a", "--img2", "b",
                    "--save", "exr"])


def test_patch_embeddings_cli(tmp_path):
    """P6 end-to-end: MMD + t-SNE artifacts from synthetic samples (the
    sample loop yields 8-tuples — a regression here broke the whole tool)."""
    from understanding_flow_robustness_tpu.cli import test_patch_embeddings

    test_patch_embeddings.main([
        "--flownet", "FlowNetC", "--pretrained_path", "/nonexistent",
        "--random_patch", "uniform", "--patch_size", "24",
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--output", str(tmp_path), "--name", "smoke",
        "--feature_keys", "corr", "--max_samples", "1",
    ])
    out = tmp_path / "smoke"
    assert any(out.iterdir())


def test_replace_features_cli(tmp_path):
    """P5 end-to-end: uniform-vs-test patch feature replacement."""
    from understanding_flow_robustness_tpu.cli import test_replace_features

    test_replace_features.main([
        "--flownet", "FlowNetC", "--pretrained_path", "/nonexistent",
        "--random_patch", "uniform", "--patch_size", "24",
        "--synthetic", "1", "--synthetic-size", "128", "192",
        "--output", str(tmp_path), "--name", "smoke", "-fk", "corr",
    ])
    assert any((tmp_path / "smoke").iterdir())
