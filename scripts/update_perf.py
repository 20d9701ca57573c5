"""Regenerate PERF.md's headline table from a bench artifact.

PERF.md's throughput table drifted from the driver's BENCH json in round 2
(a 4x discrepancy on the train metric); the table is now machine-written
between ``<!-- BENCH:BEGIN -->`` / ``<!-- BENCH:END -->`` markers and
asserted against the newest BENCH_r*.json by tests/test_perf_doc.py.

Usage:
  python scripts/update_perf.py BENCH_r03.json      # from an artifact
  python bench.py | python scripts/update_perf.py - # straight from bench
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from bench import render_markdown  # noqa: E402

BEGIN = "<!-- BENCH:BEGIN (scripts/update_perf.py; do not hand-edit) -->"
END = "<!-- BENCH:END -->"


def newest_artifact(repo: str) -> str:
    files = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if not files:
        raise SystemExit("no BENCH_r*.json artifact found")
    return files[-1]


def load_result(path: str) -> dict:
    data = json.load(sys.stdin) if path == "-" else json.load(open(path))
    # driver artifacts wrap the bench line under "parsed"
    return data.get("parsed", data)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = argv[0] if argv else newest_artifact(repo)
    table = render_markdown(load_result(path))
    perf = os.path.join(repo, "PERF.md")
    src = open(perf).read()
    block = f"{BEGIN}\n{table}{END}"
    if BEGIN in src:
        src = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                     src, flags=re.S)
    else:
        raise SystemExit(f"PERF.md is missing the {BEGIN} marker")
    open(perf, "w").write(src)
    print(f"PERF.md headline table regenerated from {path}")


if __name__ == "__main__":
    main()
