"""Summarize a jax.profiler trace directory per-op.

Parses the Chrome-format trace (`plugins/profile/*/\*.trace.json.gz`)
written by jax.profiler.start_trace and aggregates device-track event
durations by op name, bucketing HLO ops into coarse model components via
name patterns so a 170 ms train step can be attributed without opening
TensorBoard (no display in this environment).

Run: python scripts/trace_summarize.py /tmp/raft_train_trace [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

BUCKETS = [
    # (bucket, regex over the HLO op name)
    # The corr-lookup dispatch lowers to cond.N wrapping branch_K_fun.M
    # (slab vs full-extent); counting the conds (not their nested
    # branches) avoids double counting.  In the round-5 train trace the
    # 12 backward conds measured ~3.2-3.4 ms each and the 12 forward
    # conds ~1.35 ms (cond.5.clone.*) — see PERF.md.
    ("corr dispatch conds", r"^cond\.\d"),
    ("corr-lookup fwd (pallas)", r"alt_corr|_alt_corr_kernel|custom-call.*corr"),
    ("corr-lookup bwd (pallas)", r"alt.*bwd|bwd.*corr"),
    ("conv fwd/bwd", r"^convolution|^%?conv|conv_general|custom-call.*conv"),
    ("matmul/dot", r"^dot|dot_general"),
    ("transpose/copy/reshape", r"^transpose|^copy|^reshape|^bitcast"),
    ("fusion (elementwise)", r"^fusion|^loop_fusion|^input_fusion"),
    ("reduce", r"^reduce|^all-reduce"),
    ("dynamic-slice/update", r"dynamic.slice|dynamic.update"),
]


def load_events(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # map pid/tid -> track name to keep only device (TPU) compute tracks
    track = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, name in track.items()
        if re.search(r"TPU|/device:|accelerator", name, re.I)
    }
    raw = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        raw.append(e)
    if not raw:  # fall back: keep everything with a duration
        raw = [e for e in events if e.get("ph") == "X" and "dur" in e]
    # LEAF-ONLY accounting (round 5): device tracks nest — jit_* parents,
    # per-step TraceMe rows and cond wrappers all contain their children,
    # so naive summing double-counts (the round-5 train trace showed an
    # 83% "other" bucket that was mostly parents).  Keep only events that
    # contain no other event on the same (pid, tid) track.
    by_track = collections.defaultdict(list)
    for e in raw:
        by_track[(e.get("pid"), e.get("tid"))].append(e)
    out = []
    for evs in by_track.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        # an event is a parent iff the NEXT event starts inside it (with
        # sorted starts, containing intervals precede their children)
        for i, e in enumerate(evs):
            nxt = evs[i + 1] if i + 1 < len(evs) else None
            is_parent = (nxt is not None
                         and nxt["ts"] < e["ts"] + e["dur"]
                         and nxt["ts"] + nxt["dur"] <= e["ts"] + e["dur"])
            # program-level rows live alone on their own tracks: the
            # jit_* executable rows and the bare-numbered step rows are
            # whole-step aggregates, not ops
            if not is_parent and not re.match(r"^\d+$|^jit_", e["name"]):
                out.append((e["name"], e["dur"]))
    return path, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pattern", default=None,
                    help="only show ops matching this regex")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    per_op = collections.Counter()
    counts = collections.Counter()
    for name, dur in events:
        per_op[name] += dur
        counts[name] += 1
    total = sum(per_op.values())
    print(f"# {path}")
    print(f"# {len(events)} events, {total/1e3:.2f} ms total device time "
          f"(all traced iterations)\n")

    if args.pattern:
        pat = re.compile(args.pattern, re.I)
        shown = 0
        for name, dur in per_op.most_common():
            if pat.search(name):
                print(f"{dur/1e3:9.3f} ms  x{counts[name]:<5d} {name[:110]}")
                shown += 1
                if shown >= args.top:
                    break
        return

    bucket_tot = collections.Counter()
    bucket_res = collections.defaultdict(collections.Counter)
    for name, dur in per_op.items():
        for bucket, rex in BUCKETS:
            if re.search(rex, name, re.I):
                bucket_tot[bucket] += dur
                bucket_res[bucket][name] += dur
                break
        else:
            bucket_tot["other"] += dur
            bucket_res["other"][name] += dur

    print("== coarse buckets ==")
    for bucket, dur in bucket_tot.most_common():
        print(f"{dur/1e3:9.3f} ms  {100*dur/total:5.1f}%  {bucket}")

    print(f"\n== top {args.top} ops ==")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur/1e3:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
