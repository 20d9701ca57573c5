"""On-chip end-to-end throughput guard (VERDICT round-3 item #2).

Round 3 shipped a 5-line Pallas "optimization" (cast-before-transpose in
ops/pallas/alt_corr.py) that silently cost RAFT 27% end-to-end — nothing
between a kernel micro-edit and the next driver round measured the e2e
number.  This test closes that hole: it runs the SAME closures bench.py
measures (``bench.measure_raft`` / ``bench.measure_train_step``) and
asserts throughput within tolerance of the best value any committed
BENCH_r*.json artifact has recorded.  A kernel edit that regresses the
flagship path now fails a test instead of waiting for the judge.

Best-over-artifacts, not newest: the round-3 artifact itself recorded the
regressed numbers, so "within 15% of the newest artifact" would have
waved the regression through.  Legitimate slowdowns (a semantics change
that costs real work) must update GUARD_FLOOR_OVERRIDES with a comment.

TPU-gated — skips on the CPU backend; scripts/run_tpu_tests.sh runs it.
Tolerance 15%: run-to-run jitter of the median-of-differences harness is
a few percent; the regression class this guards against was 27%.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="e2e throughput guard needs the real chip (UFR_TPU_TESTS lane)",
)

TOL = 0.15
# The train metric drifts ~20% between measurement windows with NO code
# change (round 4, measured: 29.2 vs 24.1 frames/s for the same compiled
# program an hour apart; standalone bwd-kernel times drifted 1.37 ->
# 3.26 ms while INFERENCE throughput stayed within 1%).  The inference
# guards keep the tight tolerance; the train guard gets a wide one so it
# catches structural regressions without flaking on chip weather.
TRAIN_TOL = 0.35

# metric key -> explicit floor (pairs/s or frames/s), overriding the
# best-artifact floor.  Add an entry ONLY for an intentional, measured
# slowdown, with a comment saying what bought it.
GUARD_FLOOR_OVERRIDES: dict[str, float] = {}

GUARDED = (
    "raft_kitti_384x1280_frame_pairs_per_sec_per_chip",
    "raft_wildflow_384x1280_frame_pairs_per_sec_per_chip",
    "raft_train_step_288x960_frames_per_sec_per_chip",
    "flownetc_kitti2012_384x1280_frame_pairs_per_sec_per_chip",
    "patch_attack_flownetc_384x1280_iters_per_sec_per_chip",
    "flownet2_384x1280_frame_pairs_per_sec_per_chip",
    "spynet_384x1280_frame_pairs_per_sec_per_chip",
    "pwcnet_384x1280_frame_pairs_per_sec_per_chip",
)


def best_artifact_values() -> dict[str, float]:
    """Best recorded value per guarded metric across every BENCH_r*.json."""
    from bench import flatten_metrics

    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        data = json.load(open(path))
        flat = flatten_metrics(data.get("parsed", data))
        for key in GUARDED:
            if key in flat:
                best[key] = max(best.get(key, 0.0), flat[key][0])
    best.update(GUARD_FLOOR_OVERRIDES)
    return best


def assert_above_floor(key: str, value: float, floor: float, tol: float):
    """The guard's core assertion, extracted so its trip logic is itself
    testable off-chip (test_guard_logic.py proves a synthetic regression
    reds the guard — VERDICT r4 item #3's 'demonstrated by a deliberate
    perturbation')."""
    assert value >= (1 - tol) * floor, (
        f"{key}: {value:.2f} < best-artifact {floor:.2f} - {tol:.0%} — "
        "bisect the kernel/model change before shipping"
    )


def _zoo_metric_keys():
    import bench

    return sorted(bench.MEASURES)


@pytest.mark.parametrize("key", _zoo_metric_keys())
def test_zoo_throughput_guard(key):
    """Every non-RAFT BENCH metric is floor-guarded on chip (VERDICT r4
    item #3): PWC-Net had the thinnest margin over the 5x bar and SPyNet
    demonstrably swung 25% between builder and driver runs in round 4 —
    neither was guarded, so a regression would ship silently until the
    next driver round."""
    import bench

    best = best_artifact_values()
    floor = best.get(key)
    if floor is None:
        pytest.skip(f"no {key} in any BENCH_r*.json artifact")
    assert_above_floor(key, bench.MEASURES[key](), floor, TOL)


def test_raft_inference_throughput_guard():
    import bench

    best = best_artifact_values()
    cal_floor = best.get(GUARDED[0])
    wild_floor = best.get(GUARDED[1])
    if cal_floor is None and wild_floor is None:
        pytest.skip("no BENCH_r*.json artifact to guard against")
    cal, wild, cal_mag = bench.measure_raft(n=10)
    msgs = []
    if cal_floor and cal < (1 - TOL) * cal_floor:
        msgs.append(f"calibrated {cal:.2f} pairs/s < best-artifact "
                    f"{cal_floor:.2f} - {TOL:.0%}")
    if wild_floor and wild < (1 - TOL) * wild_floor:
        msgs.append(f"wild-flow {wild:.2f} pairs/s < best-artifact "
                    f"{wild_floor:.2f} - {TOL:.0%}")
    assert not msgs, "RAFT e2e regression: " + "; ".join(msgs) + (
        " — bisect the kernel/model change before shipping"
    )
    # the calibration claim must hold where the headline is measured
    assert bench.CAL_BAND[0] <= cal_mag <= bench.CAL_BAND[1], (
        f"calibrated mean |flow| {cal_mag:.1f} px outside {bench.CAL_BAND}"
    )


# Same-session train/forward multiple bound (VERDICT r4 item #4).  The
# forward is window-stable (weather_log: 62.9-64.6 frames/s across
# windows) while the backward drifts, so the multiple
# train_ms / fwd_ms cancels most chip weather.  Observed values
# (scripts/weather_log.jsonl + round-4 fast window): 2.17 (fast),
# 2.605, 2.617 (slow).  Bound 2.90 = observed max + ~11%: a structural
# backward regression >= ~18% trips it from a slow window (15% lands at
# 2.85) where the 35% absolute floor alone would wave through ~30%;
# the absolute floor still backstops fast windows.  Tighten as
# weather_log accumulates windows.
TRAIN_FWD_MULTIPLE_MAX = 2.90


def test_train_step_throughput_guard():
    import bench

    best = best_artifact_values()
    floor = best.get(GUARDED[2])
    if floor is None:
        pytest.skip("no train-step metric in any BENCH_r*.json artifact")
    frames = bench.measure_train_step(n=5)
    assert frames >= (1 - TRAIN_TOL) * floor, (
        f"train step {frames:.2f} frames/s < best-artifact {floor:.2f} "
        f"- {TRAIN_TOL:.0%} — bisect before shipping"
    )
    # same-session ratio: catches backward-path regressions the wide
    # absolute tolerance can't, independent of the measurement window
    fwd = bench.measure_train_fwd(n=8)
    multiple = fwd / frames
    assert multiple <= TRAIN_FWD_MULTIPLE_MAX, (
        f"train/forward multiple {multiple:.2f} > "
        f"{TRAIN_FWD_MULTIPLE_MAX} (fwd {fwd:.2f} vs train {frames:.2f} "
        "frames/s, same session) — the BACKWARD regressed; bisect "
        "before shipping"
    )
