"""Off-chip validation of the on-chip throughput guard's trip logic.

The guard itself (test_tpu_perf_guard.py) only runs on the real chip; this
module proves — on any backend — that (a) every BENCH metric key the guard
iterates has a measurement closure and a recorded floor, and (b) a
deliberate synthetic regression actually reds the assertion (VERDICT r4
item #3's "demonstrated by a deliberate local perturbation"), so the guard
cannot silently degenerate into a no-op.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_tpu_perf_guard import (  # noqa: E402
    GUARDED,
    TOL,
    assert_above_floor,
    best_artifact_values,
)


def test_every_guarded_metric_has_floor_and_closure():
    import bench

    floors = best_artifact_values()
    for key in GUARDED:
        assert key in floors, (
            f"{key} has no recorded value in any BENCH_r*.json — the "
            "on-chip guard would silently skip it"
        )
        assert floors[key] > 0
    # every non-RAFT guarded metric must have a measurement closure
    raft_keys = {k for k in GUARDED if k.startswith("raft_")}
    assert set(GUARDED) - raft_keys == set(bench.MEASURES), (
        "bench.MEASURES and the guard's GUARDED tuple drifted apart"
    )
    # and GUARDED must cover the full BENCH surface
    assert set(GUARDED) == {k for k, _, _ in bench.TABLE_ROWS}, (
        "a BENCH table metric is not guarded"
    )


def test_synthetic_regression_trips_the_guard():
    floors = best_artifact_values()
    key = next(iter(GUARDED))
    floor = floors[key]
    # 5% below floor: within tolerance, must pass
    assert_above_floor(key, floor * (1 - TOL + 0.05), floor, TOL)
    # 5% beyond tolerance: must trip
    with pytest.raises(AssertionError, match="bisect"):
        assert_above_floor(key, floor * (1 - TOL - 0.05), floor, TOL)
