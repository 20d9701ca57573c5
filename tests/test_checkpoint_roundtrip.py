"""Checkpoint-format round-trips: synthesize weight FILES in each zoo
format the reference's loader consumes (models/utils_model.py:100-156),
load them through ``fetch_model(pretrained_path=...)``, and assert forward
parity with the reference torch model loaded from the same file.

Formats covered:
  * ``{"state_dict": sd}`` .pth.tar wrappers (FlowNet2-C/S checkpoints)
  * raw state-dict .pth files (RobustFlowNetC, adv RAFT)
  * DataParallel ``module.``-prefixed dicts (raft-things.pth)
  * pwc_net_chairs.pth.tar (raw dict accepted by pwc_dc_net, PWCNet.py:381)
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import reference_oracle as oracle
from understanding_flow_robustness_tpu.models import fetch_model

RNG = np.random.RandomState(3)


def _imgs(h, w):
    return (RNG.rand(1, h, w, 3).astype(np.float32),
            RNG.rand(1, h, w, 3).astype(np.float32))


def _ref_out(model, x1, x2, scale=1.0, **kw):
    model.eval()
    with torch.no_grad():
        out = model(oracle.nchw(x1 * scale), oracle.nchw(x2 * scale), **kw)
    return out


def _assert_forward_parity(name, ref_model, tmp_path, h=64, w=64,
                           is_raft=False, tol=1e-3, **fetch_kw):
    ours = fetch_model(name, pretrained_path=str(tmp_path),
                       init_size=(h, w), **fetch_kw)
    x1, x2 = _imgs(h, w)
    got = np.asarray(ours.predict(x1, x2))
    if is_raft:
        _, up = _ref_out(ref_model, x1, x2, scale=255.0, test_mode=True)
        ref = oracle.nhwc(up)
    else:
        ref = oracle.nhwc(_ref_out(ref_model, x1, x2))
        if ref.shape[1] != h:  # predict upsamples to input size

            ref = oracle.nhwc(torch.nn.functional.interpolate(
                oracle.nchw(ref), (h, w), mode="bilinear",
                align_corners=False,
            ))
    scale_h = h / ref.shape[1] if ref.shape[1] != h else 1.0
    assert ref.shape == got.shape, (ref.shape, got.shape)
    err = float(np.max(np.abs(got - ref)))
    assert err < tol, (name, err)


def test_flownetc_pth_tar_statedict_wrapper(tmp_path):
    ref_mod = oracle.ref_module("FlowNetC")
    ref = ref_mod.FlowNetC(batchNorm=False).eval()
    torch.save({"state_dict": ref.state_dict()},
               tmp_path / "FlowNet2-C_checkpoint.pth.tar")
    _assert_forward_parity("FlowNetC", ref, tmp_path, tol=2e-2)


def test_flownets_pth_tar_statedict_wrapper(tmp_path):
    ref_mod = oracle.ref_module("FlowNet2S")
    ref = ref_mod.FlowNet2S(batchNorm=False).eval()
    torch.save({"state_dict": ref.state_dict()},
               tmp_path / "FlowNet2-S_checkpoint.pth.tar")
    _assert_forward_parity("FlowNetS", ref, tmp_path, tol=2e-2)


def test_flex_raw_pth(tmp_path):
    ref_mod = oracle.ref_module("FlowNetC_flexible_larger_field")
    ref = ref_mod.FlowNetC_flexible_larger_field(
        kernel_size=3, number_of_reps=3, dilation=1
    ).eval()
    torch.save(ref.state_dict(), tmp_path / "RobustFlowNetC.pth")
    _assert_forward_parity("FlowNetCFlexLarger_k3_reps3", ref, tmp_path,
                           tol=2e-2)


def test_pwcnet_pth_tar(tmp_path):
    ref_mod = oracle.ref_module("PWCNet")
    ref = ref_mod.PWCDCNet().eval()
    torch.save(ref.state_dict(), tmp_path / "pwc_net_chairs.pth.tar")
    # strict numerics through the f32 path; the registry's production
    # config is mixed precision (bf16 compute), checked at loose tol
    _assert_forward_parity("PWCNet", ref, tmp_path, tol=2e-2,
                           mixed_precision=False)
    _assert_forward_parity("PWCNet", ref, tmp_path, tol=0.5)


def _raft_args(**over):
    from argparse import Namespace

    base = dict(
        small=False, mixed_precision=False, alternate_corr=False,
        fnorm="instance", cnorm="batch", no_separate_context=False,
        corr_levels=4, iters=2, flowNetCEnc=False, dropout=0,
        compute_spatial=False, corr_radius=4,
        update_no_motion_downsampling=False,
    )
    base.update(over)
    return Namespace(**base)


def test_raft_adv_raw_pth(tmp_path):
    """f32 RAFT variant, raw (unprefixed) state dict."""
    raft_mod = oracle.ref_module("raft.raft")
    ref = raft_mod.RAFT(_raft_args()).eval()
    torch.save(ref.state_dict(),
               tmp_path / "adv_kitti2012_raft_ifgsm_l2_0.02.pth")
    _assert_forward_parity(
        "RAFT_adv_kitti2012_ifgsm_l2_002", ref, tmp_path, h=128, w=128,
        is_raft=True, tol=1e-3, iters=2,
    )


def test_raft_things_module_prefixed(tmp_path):
    """raft-things.pth is saved from a DataParallel wrapper: every key is
    'module.'-prefixed.  fetch_model must strip it (convert.py:45-62) and
    match the reference forward (bf16 path => loose tolerance)."""
    raft_mod = oracle.ref_module("raft.raft")
    ref = raft_mod.RAFT(_raft_args()).eval()
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    torch.save(sd, tmp_path / "raft-things.pth")
    _assert_forward_parity("RAFT", ref, tmp_path, h=128, w=128,
                           is_raft=True, tol=0.5, iters=2)


def test_flownet2_nested_names(tmp_path):
    """FlowNet2's checkpoint has nested submodule names
    (flownetc.*, flownets_1.*, ...) inside a state_dict wrapper."""
    ref_mod = oracle.ref_module("flownet2_models")
    ref = ref_mod.FlowNet2(batchNorm=False).eval()
    torch.save({"state_dict": ref.state_dict()},
               tmp_path / "FlowNet2_checkpoint.pth.tar")
    _assert_forward_parity("FlowNet2", ref, tmp_path, tol=2e-2)


def test_missing_checkpoint_falls_back_to_init(tmp_path):
    m = fetch_model("FlowNetC", pretrained_path=str(tmp_path))
    x1, x2 = _imgs(64, 64)
    out = np.asarray(m.predict(x1, x2))
    assert out.shape == (1, 64, 64, 2) and np.isfinite(out).all()


def test_corrupt_checkpoint_raises(tmp_path):
    ref_mod = oracle.ref_module("FlowNetC")
    sd = ref_mod.FlowNetC(batchNorm=False).state_dict()
    sd.pop(sorted(sd.keys())[0])
    torch.save({"state_dict": sd}, tmp_path / "FlowNet2-C_checkpoint.pth.tar")
    with pytest.raises(Exception):
        fetch_model("FlowNetC", pretrained_path=str(tmp_path))


def test_convert_cli_msgpack_roundtrip(tmp_path):
    """ufr-convert writes a torch-free msgpack whose fetch_model load
    (pretrained_path=<file>) matches the direct torch-checkpoint load
    exactly — including RAFT's batch-norm running stats."""
    import jax

    from understanding_flow_robustness_tpu.cli import convert as cvt

    raft_mod = oracle.ref_module("raft.raft")
    ref = raft_mod.RAFT(_raft_args()).eval()
    src = tmp_path / "adv_kitti2012_raft_ifgsm_l2_0.02.pth"
    torch.save(ref.state_dict(), src)
    dst = str(tmp_path / "raft.msgpack")
    out = cvt.main(["--flownet", "RAFT_adv_kitti2012_ifgsm_l2_002",
                    "--src", str(src), "--dst", dst])
    assert out == dst

    name = "RAFT_adv_kitti2012_ifgsm_l2_002"
    direct = fetch_model(name, pretrained_path=str(tmp_path),
                         init_size=(128, 128), iters=2)
    viapack = fetch_model(name, pretrained_path=dst,
                          init_size=(128, 128), iters=2)
    key = lambda kv: jax.tree_util.keystr(kv[0])  # noqa: E731
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(direct.variables),
               key=key),
        sorted(jax.tree_util.tree_leaves_with_path(viapack.variables),
               key=key),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x1, x2 = _imgs(128, 128)
    np.testing.assert_array_equal(np.asarray(direct.predict(x1, x2)),
                                  np.asarray(viapack.predict(x1, x2)))


def test_params_only_msgpack_load(tmp_path):
    """A params-only export (training save_weights) restores through the
    same fetch_model file path, keeping init batch_stats."""
    from understanding_flow_robustness_tpu.training.checkpoint import (
        save_weights,
    )

    m = fetch_model("FlowNetC", pretrained_path=None, init_size=(64, 64))
    path = str(tmp_path / "w.msgpack")
    save_weights(path, m.variables["params"])
    m2 = fetch_model("FlowNetC", pretrained_path=path, init_size=(64, 64))
    x1, x2 = _imgs(64, 64)
    np.testing.assert_array_equal(np.asarray(m.predict(x1, x2)),
                                  np.asarray(m2.predict(x1, x2)))


def test_msgpack_roundtrip_smoke_small(tmp_path):
    """Fast-lane smoke for this module (the per-zoo-format round-trips are
    marked slow): the msgpack save/load pair round-trips a small FlowNetS
    variables tree bit-exactly, via both the whole-dict and params-only
    flavors load_variables accepts."""
    import jax
    import numpy as np

    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.training.checkpoint import (
        load_variables,
        save_weights,
    )

    m = fetch_model("FlowNetS", pretrained_path=None, init_size=(64, 64))
    template = jax.tree_util.tree_map(np.zeros_like, m.variables)
    for flavor, payload in (("full", m.variables),
                            ("params-only", m.variables["params"])):
        path = tmp_path / f"{flavor}.msgpack"
        save_weights(str(path), payload)
        loaded = load_variables(str(path), template)
        flat_a = jax.tree_util.tree_leaves(m.variables["params"])
        flat_b = jax.tree_util.tree_leaves(loaded["params"])
        assert len(flat_a) == len(flat_b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
