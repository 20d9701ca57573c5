"""PERF.md's headline table must match the newest BENCH_r*.json artifact.

Round 2 shipped a PERF.md claiming 55.5 frames/s on the train step while
the driver artifact said 14.3 (the doc number predated the bench fix that
kept the backward alive).  The table is machine-generated now
(scripts/update_perf.py between BENCH markers); this test fails if anyone
hand-edits it or forgets to regenerate after a bench run materially moves.

Tolerance: 25% relative — run-to-run jitter on the chip is a few percent,
and the driver's end-of-round artifact lands AFTER the last commit, so
verbatim equality across rounds is impossible by construction.  25% still
catches every real drift class seen so far (the round-2 instance was 4x).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import sys  # noqa: E402

sys.path.insert(0, REPO)

from bench import TABLE_ROWS, flatten_metrics  # noqa: E402

TOL = 0.25


def _latest_bench():
    files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not files:
        pytest.skip("no BENCH_r*.json artifact in the repo")
    data = json.load(open(files[-1]))
    return files[-1], flatten_metrics(data.get("parsed", data))


def _perf_table():
    src = open(os.path.join(REPO, "PERF.md")).read()
    m = re.search(r"<!-- BENCH:BEGIN.*?-->\n(.*?)<!-- BENCH:END -->",
                  src, re.S)
    assert m, "PERF.md is missing the machine-generated BENCH block"
    rows = {}
    for line in m.group(1).splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) != 4 or cells[0] in ("Metric", "---"):
            continue
        vm = re.match(r"\*\*([\d.]+)\s", cells[1])
        fm = re.match(r"\*\*([\d.]+)×\*\*", cells[3])
        if vm and fm:
            rows[cells[0]] = (float(vm.group(1)), float(fm.group(1)))
    return rows


# zoo-table row name -> bench metric key.  The RAFT row's pairs/s cell is
# "wild / calibrated" (two numbers); handled specially below.
_ZOO_TO_METRIC = {
    "FlowNetC": "flownetc_kitti2012_384x1280_frame_pairs_per_sec_per_chip",
    "PWC-Net": "pwcnet_384x1280_frame_pairs_per_sec_per_chip",
    "SPyNet": "spynet_384x1280_frame_pairs_per_sec_per_chip",
    "FlowNet2": "flownet2_384x1280_frame_pairs_per_sec_per_chip",
}
_ZOO_TOL = 0.20


def _zoo_table():
    """{model: [pairs/s, ...]} from PERF.md's hand-written zoo table."""
    src = open(os.path.join(REPO, "PERF.md")).read()
    m = re.search(r"## Model-zoo inference throughput.*?\n\n(\|.*?)\n\n",
                  src, re.S)
    assert m, "PERF.md is missing the model-zoo throughput table"
    rows = {}
    for line in m.group(1).splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 5 or cells[0] in ("Model", "---"):
            continue
        vals = [float(v) for v in re.findall(r"[\d.]+", cells[2])]
        if vals:
            rows[cells[0]] = vals
    return rows


def test_zoo_table_agrees_with_generated_table():
    """Round 4 shipped a PERF.md whose machine-generated headline said
    SPyNet 163.8 pairs/s while the hand-written zoo table in the SAME
    file said 124 — a 33% internal contradiction nothing caught.  The
    two tables must agree on every model they share."""
    _, metrics = _latest_bench()
    zoo = _zoo_table()
    for model, key in _ZOO_TO_METRIC.items():
        assert model in zoo, f"zoo table lost its {model} row"
        doc = zoo[model][0]
        value = metrics[key][0]
        assert abs(doc - value) <= _ZOO_TOL * value, (
            f"PERF.md zoo table says {model} = {doc} pairs/s but the "
            f"newest artifact measured {value} — the two tables in "
            "PERF.md contradict each other; update the zoo table"
        )
    # RAFT row: "<wild> / <calibrated>" pairs/s
    assert "RAFT-12" in zoo and len(zoo["RAFT-12"]) >= 2, (
        "zoo table lost its RAFT-12 wild/calibrated row"
    )
    wild_doc, cal_doc = zoo["RAFT-12"][0], zoo["RAFT-12"][1]
    wild = metrics["raft_wildflow_384x1280_frame_pairs_per_sec_per_chip"][0]
    cal = metrics["raft_kitti_384x1280_frame_pairs_per_sec_per_chip"][0]
    assert abs(wild_doc - wild) <= _ZOO_TOL * wild, (
        f"zoo RAFT wild {wild_doc} vs artifact {wild}")
    assert abs(cal_doc - cal) <= _ZOO_TOL * cal, (
        f"zoo RAFT calibrated {cal_doc} vs artifact {cal}")


def test_perf_table_matches_latest_bench_artifact():
    path, metrics = _latest_bench()
    table = _perf_table()
    names = {name: key for key, name, _ in TABLE_ROWS}
    assert set(table) == set(names), (
        f"PERF.md table rows {sorted(table)} != bench TABLE_ROWS "
        f"{sorted(names)}"
    )
    for name, (doc_value, doc_factor) in table.items():
        value, _, vs = metrics[names[name]]
        assert abs(doc_value - value) <= TOL * value, (
            f"PERF.md says {doc_value} for '{name}' but {path} measured "
            f"{value} — regenerate with scripts/update_perf.py"
        )
        assert abs(doc_factor - vs) <= TOL * max(vs, 0.1), (
            f"PERF.md factor {doc_factor} for '{name}' vs artifact {vs}"
        )
