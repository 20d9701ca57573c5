"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), standing in for real TPU
chips; the driver separately dry-run-compiles the multi-chip path.

On-chip lane: ``UFR_TPU_TESTS=1`` skips the CPU forcing so the suite runs
on the real TPU backend — ``scripts/run_tpu_tests.sh`` uses this to run
the TPU-gated subset (the tests that skip themselves unless
``jax.default_backend() == "tpu"``) as a regression guard instead of
ad-hoc scripts.
"""

import os
import sys

_ON_CHIP = os.environ.get("UFR_TPU_TESTS", "") == "1"

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_CHIP:
    # The axon TPU plugin overrides JAX_PLATFORMS at registration time, so
    # the env var alone is not enough — force CPU via the config too.
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache for BOTH lanes (keyed per backend,
# utils/cache.py): repeat on-chip runs must not pay the multi-minute
# remote compiles, and the CPU fast lane (`-m "not slow"`) re-pays ~1 min
# of model-predict compiles per process without it
from understanding_flow_robustness_tpu.utils import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()


# ---------------------------------------------------------------------------
# Fast lane: `pytest tests/ -m "not slow"` finishes < 5 min on CPU while the
# full suite (~31 min) keeps everything.  The list below holds every test
# whose CPU call time measured >= 4 s in the round-4 full-suite run
# (generated from `--durations=0`; regenerate the same way if it drifts).
# Every module keeps at least one fast smoke/parity case — the two files
# whose tests are ALL heavyweight (bf16 drift, checkpoint round-trips)
# carry dedicated *_smoke_small fast tests instead.
_SLOW_NODEIDS = {
    # test_attack_parity.py
    "test_attack_parity.py::test_patch_attack_trajectory_parity",  # 4s
    # test_bf16_drift.py
    "test_bf16_drift.py::test_pwcnet_mixed_precision_drift",  # 171s
    "test_bf16_drift.py::test_bf16_drift_within_bar[FlowNetC-1.0]",  # 55s
    "test_bf16_drift.py::test_raft_mixed_precision_drift",  # 51s
    "test_bf16_drift.py::test_bf16_drift_within_bar[FlowNetS-1.0]",  # 49s
    "test_bf16_drift.py::test_raft_mixed_precision_drift_checkpoint_magnitude",  # 29s
    "test_bf16_drift.py::test_bf16_drift_within_bar[SpyNet-1.5]",  # 26s
    # test_checkpoint_roundtrip.py
    "test_checkpoint_roundtrip.py::test_pwcnet_pth_tar",  # 164s
    "test_checkpoint_roundtrip.py::test_flownet2_nested_names",  # 130s
    "test_checkpoint_roundtrip.py::test_convert_cli_msgpack_roundtrip",  # 64s
    "test_checkpoint_roundtrip.py::test_raft_things_module_prefixed",  # 48s
    "test_checkpoint_roundtrip.py::test_params_only_msgpack_load",  # 43s
    "test_checkpoint_roundtrip.py::test_raft_adv_raw_pth",  # 26s
    "test_checkpoint_roundtrip.py::test_flex_raw_pth",  # 26s
    "test_checkpoint_roundtrip.py::test_corrupt_checkpoint_raises",  # 23s
    "test_checkpoint_roundtrip.py::test_flownetc_pth_tar_statedict_wrapper",  # 23s
    "test_checkpoint_roundtrip.py::test_flownets_pth_tar_statedict_wrapper",  # 21s
    "test_checkpoint_roundtrip.py::test_missing_checkpoint_falls_back_to_init",  # 20s
    # test_cli_smoke.py
    "test_cli_smoke.py::test_replace_features_cli",  # 17s
    "test_cli_smoke.py::test_run_perturb_model_homogeneous_evolve",  # 11s
    "test_cli_smoke.py::test_train_cli_reference_arch_flags[arch_flags2]",  # 10s
    "test_cli_smoke.py::test_run_perturb_model_arbitrary_noise_index",  # 9s
    "test_cli_smoke.py::test_moving_patch_cli[extra0]",  # 9s
    "test_cli_smoke.py::test_evaluate_cli_kitti",  # 8s
    "test_cli_smoke.py::test_moving_patch_cli[extra2]",  # 7s
    "test_cli_smoke.py::test_universal_cli_reference_flags",  # 7s
    "test_cli_smoke.py::test_moving_patch_cli[extra1]",  # 7s
    "test_cli_smoke.py::test_moving_patch_cli[extra3]",  # 7s
    "test_cli_smoke.py::test_train_cli_alternate_corr_and_subset",  # 6s
    "test_cli_smoke.py::test_train_cli_reference_arch_flags[arch_flags1]",  # 6s
    "test_cli_smoke.py::test_infer_cli_mesh_matches_single",  # 5s
    "test_cli_smoke.py::test_train_cli_reference_arch_flags[arch_flags0]",  # 5s
    "test_cli_smoke.py::test_run_perturb_model_uniform_noise_universal",  # 4s
    "test_cli_smoke.py::test_test_patch_cli_modes[extra0-]",  # 4s
    # test_eval_and_misc.py
    "test_eval_and_misc.py::test_flownet2cs_forward",  # 17s
    # test_fast_dgrad.py
    "test_fast_dgrad.py::test_flownetc_attack_grad_matches_plain_path",  # 41s
    # test_model_parity.py
    "test_model_parity.py::test_pwcnet_parity",  # 35s
    "test_model_parity.py::test_spynet_parity",  # 23s
    "test_model_parity.py::test_flownet2_parity",  # 14s
    "test_model_parity.py::test_raft_parity",  # 14s
    "test_model_parity.py::test_raft_small_runs",  # 13s
    "test_model_parity.py::test_raft_spatial_corr_parity",  # 6s
    "test_model_parity.py::test_flownet_s_parity",  # 6s
    "test_model_parity.py::test_flownet_c_parity",  # 4s
    # test_ops_correlation.py
    "test_ops_correlation.py::test_alt_corr_features_interpret_matches_gather",  # 21s
    "test_ops_correlation.py::test_alt_corr_pallas_backward_matches_reference_vjp[False]",  # 16s
    "test_ops_correlation.py::test_alt_lookup_sorted_tiles_interpret",  # 14s
    "test_ops_correlation.py::test_spatial_correlation_band_blocked_wide_rows",  # 9s
    "test_ops_correlation.py::test_alt_corr_features_odd_levels_interpret",  # 9s
    "test_ops_correlation.py::test_alt_lookup_row_slabs_interpret",  # 8s
    "test_ops_correlation.py::test_corr_lookup_fused_interpret_matches_gather",  # 8s
    "test_ops_correlation.py::test_alt_lookup_bwd_row_slabs_interpret",  # 8s
    "test_ops_correlation.py::test_corr_lookup_mxu_matches_gather",  # 7s
    "test_ops_correlation.py::test_corr_lookup_padded_matches_compact",  # 7s
    "test_ops_correlation.py::test_alt_lookup_bwd_sorted_tiles_interpret",  # 6s
    "test_ops_correlation.py::test_corr_lookup_mxu_grad",  # 5s
    "test_ops_correlation.py::test_alt_lookup_bwd_fallback_tile_interpret",  # 4s
    "test_ops_correlation.py::test_spatial_correlation_k1[9-1-shift]",  # 4s
    # test_parallel_eval.py
    "test_parallel_eval.py::test_perturb_runner_mesh_mode",  # 6s
    # test_registry.py
    "test_registry.py::test_all_ids_init",  # 36s
    "test_registry.py::test_raft_batch_pad_encoders_value_identity",  # 31s
    "test_registry.py::test_raft_predict_full_res",  # 7s
    "test_registry.py::test_predict_flow_uniform_api[PWCNet]",  # 6s
    # test_s2d.py
    "test_s2d.py::test_spynet_s2d_path_matches_plain",  # 22s
    "test_s2d.py::test_flownetfusion_s2d_path_matches_plain[False]",  # 9s
    "test_s2d.py::test_flownetsd_s2d_path_matches_plain",  # 9s
    # test_spatial_shard.py
    "test_spatial_shard.py::test_spatial_attack_ifgm",  # 19s
    "test_spatial_shard.py::test_spatial_flownetc",  # 10s
    "test_spatial_shard.py::test_spatial_pwcnet",  # 9s
    "test_spatial_shard.py::test_spatial_raft",  # 8s
    "test_spatial_shard.py::test_spatial_flownets",  # 7s
    "test_spatial_shard.py::test_spatial_spynet",  # 5s
    # test_training.py
    "test_training.py::test_train_loop_and_resume",  # 19s
    "test_training.py::test_adversarial_training_step",  # 17s
    "test_training.py::test_packed_train_step_matches_plain",  # 14s
    # test_warp_tile.py
    "test_warp_tile.py::test_wide_channel_eligibility_and_parity",  # 7s
    "test_warp_tile.py::test_auto_sampler_corrects_scattered_violations[border]",  # 5s
    # test_cli_parity.py (r5): end-to-end attack-eval runs; the module's
    # fast representative is test_parity_expected_diff logic via the same
    # smoke — all three are whole-CLI runs, so all are slow-lane
    "test_cli_parity.py::test_parity_synthetic_smoke",  # 100s
    "test_cli_parity.py::test_parity_expected_diff_pass_and_fail",  # 140s
    "test_cli_parity.py::test_parity_patch_columns",  # 130s
    # test_grad_transport.py (r5): FlowNet2/RAFT train-step compiles x3
    "test_grad_transport.py::test_bf16_transport_one_step_matches_f32[FlowNet2-kw0-0.001]",  # slow
    "test_grad_transport.py::test_bf16_transport_one_step_matches_f32[RAFT-kw1-0.03]",  # slow
    "test_grad_transport.py::test_flownet2_bf16_transport_short_run_converges",  # slow
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    matched = set()
    for item in items:
        # Strip only the tests/-directory prefix: splitting on the LAST
        # "/" would truncate nodeids whose parametrization ids contain a
        # "/" (e.g. a path-valued param) so they could never be marked
        # slow (ADVICE r4).
        key = item.nodeid
        if key.startswith("tests/"):
            key = key[len("tests/"):]
        if key in _SLOW_NODEIDS:
            matched.add(key)
            item.add_marker(_pytest.mark.slow)
    # A renamed or re-parametrized slow test silently falls out of the set
    # and re-enters the <5-min fast lane; fail collection loudly instead
    # (ADVICE r4).  Only enforced on full-directory runs — selecting a
    # subset (single file / -k) legitimately leaves entries unmatched.
    stale = _SLOW_NODEIDS - matched
    if stale and len(items) > 300:
        raise _pytest.UsageError(
            "_SLOW_NODEIDS entries matched no collected test (renamed or "
            "re-parametrized?) — update tests/conftest.py: "
            + ", ".join(sorted(stale)[:5])
            + (" ..." if len(stale) > 5 else "")
        )
