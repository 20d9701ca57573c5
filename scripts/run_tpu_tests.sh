#!/usr/bin/env bash
# On-chip test lane (VERDICT round-3 item #5): run the TPU-gated tests on
# the real chip.  These tests skip themselves on the CPU backend
# (jax.default_backend() != "tpu"), so the default suite never exercises
# them; this runner is the one-command regression guard.
#
# The host has ONE CPU and the TPU tunnel client is CPU-bound: do not run
# anything else (benchmarks, other pytest) concurrently.
#
# Usage: bash scripts/run_tpu_tests.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."

export UFR_TPU_TESTS=1
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo:/root/.axon_site"

exec python -m pytest \
    "tests/test_ops_correlation.py::test_corr_lookup_fused_on_tpu" \
    "tests/test_ops_correlation.py::test_alt_corr_features_on_tpu" \
    "tests/test_ops_correlation.py::test_raft_alt_corr_matches_volume_on_tpu" \
    "tests/test_model_parity.py::test_raft_feature_taps_compact_on_tpu" \
    "tests/test_tpu_perf_guard.py" \
    -q -rs "$@"
