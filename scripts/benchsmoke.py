#!/usr/bin/env python3
"""Pre-commit bench smoke: time the historically expensive queries at
sf0.1 and fail on >2x drift vs the previous committed round's bench.

Usage: python3 scripts/benchsmoke.py [sf_dir]

Exists because a 34x regression once shipped with a green correctness
gate: sf0.01 correctness says nothing about sf0.1 time. Run this before
the end-of-round commit (alongside scripts/selfcheck.py, which covers
correctness only).

Compares each smoke query against BOTH the latest committed
BENCH_r*.json and the per-query minimum across all committed rounds
(the min catches a regression masked by an already-slow previous round,
e.g. r03's 86s dedup_ngram_jaccard). Failure = slower than 2x the
PREVIOUS round; slower than 2x the historical min is a warning, since
round-to-round machine noise is real (driver load inflates timings
2-3x — the script refuses to judge when loadavg is already high).
"""
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_winnowing",
    "dedup_minhash_lsh",
    "sim_topk_batch",
    "embed_neardup_blocked",
]
DRIFT = 2.0


def parse_metric(text):
    """Last parseable {"metric":...} object in a log; tolerates truncated
    tails and log lines that merely contain the word metric."""
    metric = None
    for line in text.splitlines():
        if '"metric"' not in line:
            continue
        try:
            metric = json.loads(line[line.index("{"):])
        except (ValueError, IndexError):
            continue
    return metric


def committed_benches():
    """Baselines come from git (HEAD), not the working tree: the current
    round's own uncommitted BENCH_r*.json must not become its baseline
    (a regressed round would then compare against itself and pass).
    The driver's BENCH_r*.json wraps the Bench metric line inside a
    "tail" capture of the sbt log; accept either that or a bare metric
    object (what Bench itself prints)."""
    ls = subprocess.run(
        ["git", "ls-tree", "--name-only", "HEAD"],
        cwd=REPO, capture_output=True, text=True)
    runs = []
    for name in ls.stdout.splitlines():
        m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
        if not m:
            continue
        show = subprocess.run(
            ["git", "show", f"HEAD:{name}"],
            cwd=REPO, capture_output=True, text=True)
        try:
            data = json.loads(show.stdout)
        except ValueError:
            continue
        queries = data.get("queries")
        if queries is None:
            metric = parse_metric(data.get("tail", ""))
            queries = metric.get("queries") if metric else None
        runs.append((int(m.group(1)), queries or {}))
    return sorted(runs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load1 = os.getloadavg()[0]
    if load1 > 8:
        print(f"benchsmoke: refusing to judge at loadavg {load1:.1f} "
              "(timings inflate 2-3x under driver load; rerun when idle)")
        return 2

    runs = committed_benches()
    if not runs:
        print("benchsmoke: no committed BENCH_r*.json to compare against")
        return 2
    prev_round, prev = runs[-1]
    # per-query min over rounds, ignoring null (failed) timings
    hist_min = {}
    for _, qs in runs:
        for q, v in qs.items():
            if isinstance(v, (int, float)) and v >= 0:
                hist_min[q] = min(hist_min.get(q, float("inf")), v)

    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(SMOKE_QUERIES))
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    metric = parse_metric(out.stdout)
    if metric is None:
        print("benchsmoke: no metric line from Bench; sbt tail:")
        print("\n".join(out.stdout.splitlines()[-15:]))
        return 2

    now = metric["queries"]
    failed_queries = metric.get("failed", [])
    rc = 0
    print(f"benchsmoke vs BENCH_r{prev_round:02d} (fail >{DRIFT}x prev; "
          f"warn >{DRIFT}x historical min) at {sf_dir}, loadavg {load1:.1f}")
    for q in SMOKE_QUERIES:
        v = now.get(q)
        if q in failed_queries or not isinstance(v, (int, float)):
            print(f"  FAIL  {q}: query crashed")
            rc = 1
            continue
        p = prev.get(q)
        h = hist_min.get(q)
        line = f"  {q}: {v:6.2f}s"
        if isinstance(p, (int, float)) and p >= 0:
            line += f"  (prev {p:.2f}s, {v / p:.2f}x)"
            if v > DRIFT * p:
                print(f"  FAIL{line}")
                rc = 1
                continue
        if h is not None:
            line += f"  (min {h:.2f}s)"
            if v > DRIFT * h:
                print(f"  WARN{line}")
                continue
        print(f"  ok {line}")
    print(f"benchsmoke: {'FAIL' if rc else 'PASS'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
