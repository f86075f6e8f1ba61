#!/usr/bin/env python3
"""Round-over-round bench ratio gate.

Usage: bench_compare.py OLD.jsonl NEW.jsonl [--threshold 1.5]

Reads two bench detail files (one JSON object per line, as written by
graft.Bench to target/bench_detail.jsonl and committed per round as
BENCH_DETAIL_r{N}.jsonl). Compares per-query calibration RATIOS — the
host-load-invariant number — and prints every query whose ratio moved by
more than the threshold factor in either direction, plus queries that
appeared/disappeared between rounds. Exit code 1 if any mover exceeds the
threshold (so the gate is one command in CI), 0 otherwise.

Tolerates partial files: BENCH_r08.json's stdout tail kept only 1 of 123
per-query lines, so unmatched old-side queries are reported as
"new_or_missing", never as failures.
"""
import argparse
import json
import sys


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # tolerate truncated tails
            q = rec.get("bench_query")
            if q is None:
                continue  # summary line
            ratio = rec.get("ratio")
            sec = rec.get("sec")
            if ratio is not None:
                out[q] = {"ratio": float(ratio),
                          "sec": None if sec is None else float(sec)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries whose ratio moved more than this "
                         "factor (default 1.5)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    movers = []
    for q in sorted(set(old) & set(new)):
        r0, r1 = old[q]["ratio"], new[q]["ratio"]
        if r0 <= 0 or r1 <= 0:
            continue
        factor = r1 / r0 if r1 >= r0 else r0 / r1
        if factor > args.threshold:
            movers.append((factor, q, r0, r1, old[q]["sec"], new[q]["sec"]))

    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    print(f"compared {len(set(old) & set(new))} queries "
          f"(old={len(old)}, new={len(new)}, threshold={args.threshold}x)")
    for factor, q, r0, r1, s0, s1 in sorted(movers, reverse=True):
        direction = "SLOWER" if r1 > r0 else "faster"
        print(f"  MOVER {q}: ratio {r0:.3f} -> {r1:.3f} "
              f"({factor:.2f}x {direction}; sec {s0} -> {s1})")
    if not movers:
        print("  no ratio moved more than the threshold")
    if only_old:
        print(f"  new_or_missing: dropped from new run: {', '.join(only_old)}")
    if only_new:
        print(f"  new_or_missing: new this run: {', '.join(only_new)}")
    return 1 if movers else 0


if __name__ == "__main__":
    sys.exit(main())
