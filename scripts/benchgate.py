#!/usr/bin/env python3
"""Per-query bench regression gate: judge a fresh Bench run against the
latest COMMITTED steady-state capture (BENCH_STEADY_r*.json in git HEAD).

Usage: python3 scripts/benchgate.py [bench_full_json ...]
       (default: BENCH_FULL.json in the repo root — every Bench
        invocation writes the complete per-query map there)

With MULTIPLE artifacts the gate judges the per-query MINIMUM across
runs: scheduler/writeback jitter on this shared box is one-sided (it
only ever inflates a timing, the min approaches the true cost), and a
single run shows a different ~5-query set above 1.5x every time purely
from that jitter. A real regression survives the min; noise does not.
Each artifact must individually pass the loadavg discipline, and all
artifacts (plus the committed steady baseline) must share one sf — a
cross-scale min is refused.

Since r10 graft.Bench computes the per-query min over N internal passes
itself (the artifact carries "runs"/"statistic" fields), so the default
single-artifact invocation already judges a disciplined statistic; the
multi-artifact mode remains for merging separate JVM captures.

Complements scripts/benchsmoke.py: smoke times 5 historically expensive
queries at a 2x tripwire BEFORE a run exists; this gate audits EVERY
query of a run that already happened at a tighter 1.5x budget, so a
uniform or long-tail regression is caught by the builder in-round, not
by the judge's artifact diff next round.

Loadavg discipline: the gate judges the RECORDED load averages in the
bench artifact — Bench reads them ON ENTRY, before its own warm-up and
query work raises the 1m figure (a run's self-load is identical across
runs and says nothing about ambient noise). Both 1m and 5m are judged:
post-write I/O writeback inflates runs while the 1m figure already
reads ~0. The gate refuses to conclude anything from a noisy run. Budgets refresh themselves: commit a new
BENCH_STEADY_r{N}.json each round and the next round gates against it.

Exit codes: 0 pass, 1 regression/crash, 2 not judgeable (no baseline /
noisy run / missing artifact).
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = 1.5      # fail above budget x steady time
MAX_LOAD = 2.0    # refuse to judge a run recorded under higher load
MIN_SEC = 0.25    # absolute floor: sub-250ms queries are timer noise
                  # (+/-15% run-to-run swings dwarf 1.5x at that scale),
                  # so tiny queries only fail via the floor+ratio combo


def committed_steady():
    """Latest BENCH_STEADY_r*.json from git HEAD — the working tree's own
    (possibly regressed) capture must never become its baseline."""
    ls = subprocess.run(["git", "ls-tree", "--name-only", "HEAD"],
                        cwd=REPO, capture_output=True, text=True)
    best = None
    for name in ls.stdout.splitlines():
        m = re.fullmatch(r"BENCH_STEADY_r(\d+)\.json", name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), name)
    if best is None:
        return None, None
    show = subprocess.run(["git", "show", f"HEAD:{best[1]}"],
                          cwd=REPO, capture_output=True, text=True)
    try:
        return best[0], json.loads(show.stdout)
    except ValueError:
        return best[0], None


SCALE_BUDGET = 1.5   # same budget at gen scale
SCALE_MIN_SEC = 1.0  # gen-scale walls: sub-second families are noise


def family_walls(artifact):
    """(protocol, scale, {family: seconds}) for a gen-series artifact.

    Two protocols exist and their walls are NOT comparable to each other
    (BENCH_GEN1000X_RERUN_r11: same code, two clean marathons, one family
    4.6x apart — marathon rows carry migrating context inflation):
      - 'marathon' (metric=scale_families): 15 families back-to-back in
        one JVM; totals comparable suite-to-suite ONLY.
      - 'standalone' (metric startswith scale_standalone): fresh JVM per
        family, min of reps; the per-family statistic of record
        (SCALE.md §9).
    """
    m = artifact.get("metric", "")
    if m == "scale_families":
        walls = {q: v.get("sec") for q, v in artifact.get("queries", {}).items()
                 if isinstance(v, dict) and isinstance(v.get("sec"), (int, float))}
        return "marathon", artifact.get("scale"), walls
    if m.startswith("scale_standalone"):
        fams = artifact.get("families") or artifact.get(
            "full_family_series", {}).get("families", {})
        walls = {q: v.get("min") for q, v in fams.items()
                 if isinstance(v, dict) and isinstance(v.get("min"), (int, float))}
        # the adjudication artifact nests its full series one level down
        # and carries a gen1000x series; the gen100x series artifact has
        # no scale field either — infer from the metric name when absent
        scale = artifact.get("scale")
        if scale is None and "gen100x" in m:
            scale = 100
        if scale is None and artifact.get("full_family_series"):
            scale = 1000
        return "standalone", scale, walls
    return None, None, {}


def scale_gate(new_path, base_path):
    """Like-to-like per-family regression gate for gen-series artifacts:
    same protocol, same corpus scale, 1.5x budget on each family wall.
    Refuses marathon-vs-standalone (and any cross-scale) comparison —
    the distinction BENCH_GEN1000X_RERUN_r11 measured."""
    arts = []
    for p in (new_path, base_path):
        if not os.path.exists(p):
            print(f"benchgate --scale: no artifact at {p}")
            return 2
        with open(p) as f:
            arts.append(json.load(f))
    (np_, ns, nw), (bp_, bs, bw) = family_walls(arts[0]), family_walls(arts[1])
    for proto, path in ((np_, new_path), (bp_, base_path)):
        if proto is None:
            print(f"benchgate --scale: {path} is not a gen-series artifact "
                  "(want metric scale_families or scale_standalone*)")
            return 2
    if np_ != bp_:
        print(f"benchgate --scale: protocol mismatch ({np_} vs {bp_}) — "
              "marathon rows carry migrating suite-context inflation (same "
              "code measured 4.6x apart on one family); per-family claims "
              "compare standalone-to-standalone, suite totals "
              "marathon-to-marathon")
        return 2
    if ns != bs:
        print(f"benchgate --scale: corpus scale mismatch ({ns} vs {bs}) — "
              "cross-decade ratios are growth measurements, not a "
              "regression gate; compare same-scale artifacts")
        return 2
    if np_ == "marathon":
        nv, bv = arts[0].get("value"), arts[1].get("value")
        print(f"benchgate --scale [marathon, scale={ns}]: per-family rows "
              "are NOT judged (migrating context inflation); suite totals "
              f"{nv} vs {bv} sec "
              f"({(nv / bv):.2f}x)" if isinstance(nv, (int, float)) and
              isinstance(bv, (int, float)) and bv else "")
        return 0
    rc = 0
    judged = 0
    print(f"benchgate --scale [standalone, scale={ns}] "
          f"(fail >{SCALE_BUDGET}x and >{SCALE_MIN_SEC}s)")
    for q in sorted(nw):
        if q not in bw or not bw[q]:
            print(f"  note  {q}: no baseline wall")
            continue
        judged += 1
        ratio = nw[q] / bw[q]
        tag = "FAIL" if ratio > SCALE_BUDGET and nw[q] > SCALE_MIN_SEC else "ok  "
        if tag == "FAIL":
            rc = 1
        print(f"  {tag}  {q}: {nw[q]:7.2f}s vs {bw[q]:.2f}s ({ratio:.2f}x)")
    print(f"benchgate --scale: {'FAIL' if rc else 'PASS'} ({judged} families)")
    return rc


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--scale":
        if len(sys.argv) != 4:
            print("usage: benchgate.py --scale NEW.json BASELINE.json")
            return 2
        return scale_gate(sys.argv[2], sys.argv[3])
    paths = sys.argv[1:] or [os.path.join(REPO, "BENCH_FULL.json")]
    runs = []
    for path in paths:
        if not os.path.exists(path):
            print(f"benchgate: no bench artifact at {path} (run graft.Bench first)")
            return 2
        with open(path) as f:
            r = json.load(f)
        m = r.get("metric", "total")
        if m != "total":
            print(f"benchgate: {path} has metric '{m}' — this gate judges "
                  "full-registry Bench runs against BENCH_STEADY; gen-series "
                  "artifacts are judged like-to-like via --scale")
            return 2
        l1, l5 = r.get("loadavg_1m"), r.get("loadavg_5m")
        if l1 is None or l5 is None:
            # an artifact with no recorded noise regime is unjudgeable,
            # not quiet — refusing is the whole discipline
            print(f"benchgate: {path} records no loadavg fields — "
                  "cannot judge a run whose noise regime is unknown")
            return 2
        # single raw capture: both averages must be quiet (one noisy
        # sample is uninterpretable). Min-of-N (multiple artifacts, or
        # one artifact whose Bench already ran N>=2 internal passes and
        # recorded "runs"): only sustained load (5m) disqualifies — the
        # 1m at JVM entry is self-polluted by the build tool's own
        # startup burst, and transient spikes lose to the min anyway.
        single_raw = len(paths) == 1 and r.get("runs", 1) < 2
        noisy = l5 > MAX_LOAD or (single_raw and l1 > MAX_LOAD)
        if noisy:
            print(f"benchgate: {path} recorded at loadavg {l1:.2f}/{l5:.2f} "
                  f"(1m/5m) > {MAX_LOAD} — timings inflate 2-3x under load; "
                  "rerun Bench on a quiet box")
            return 2
        # advisory only (the entry reading is the gate): a mid-run tenant
        # arriving after entry is invisible to the 5m-at-entry figure but
        # shows in the end-of-run readings Bench also records
        e1, e5 = r.get("loadavg_end_1m"), r.get("loadavg_end_5m")
        if e5 is not None and e5 > MAX_LOAD + 1.5:
            print(f"  note  {path}: end-of-run loadavg {e1:.2f}/{e5:.2f} — "
                  "includes bench self-load, but a mid-run tenant would "
                  "look the same; trust the per-query min, not the total")
        runs.append(r)
    # artifacts from different scale factors (or a different sf than the
    # committed steady baseline) must never be min-merged: the cross-scale
    # min silently masks regressions at the larger scale
    sfs = {r.get("sf") for r in runs}
    if len(sfs) > 1:
        print(f"benchgate: artifacts span different sf dirs {sorted(sfs)} — "
              "a cross-scale per-query min is meaningless; pass runs from "
              "ONE scale")
        return 2
    # per-query min across runs (see module doc: noise is one-sided);
    # a query is "failed" only if it crashed in EVERY run
    run = dict(runs[0])
    if len(runs) > 1:
        qs = {}
        for r in runs:
            for q, v in r.get("queries", {}).items():
                if isinstance(v, (int, float)):
                    # a None placeholder (crashed in an earlier run) must
                    # not poison min() once a later run succeeds
                    qs[q] = v if qs.get(q) is None else min(qs[q], v)
                elif q not in qs:
                    qs[q] = None
        run["queries"] = qs
        failed_union = set.union(*[set(r.get("failed", [])) for r in runs])
        run["failed"] = sorted(
            set.intersection(*[set(r.get("failed", [])) for r in runs]))
        # an intermittent bench-scale crash converts to a PASS on its
        # successful-run timing (the pass policy stands — a crash under
        # ambient noise is usually an OOM from a co-tenant) but must
        # leave a trace, not vanish
        for q in sorted(failed_union - set(run["failed"])):
            k = sum(1 for r in runs if q in set(r.get("failed", [])))
            print(f"  note  {q}: crashed in {k}/{len(runs)} runs — judged "
                  "on its successful-run timing; investigate if repeated")
    l1, l5 = run.get("loadavg_1m", -1), run.get("loadavg_5m", -1)

    steady_round, steady = committed_steady()
    if not steady:
        print("benchgate: no committed BENCH_STEADY_r*.json baseline")
        return 2
    steady_sf = steady.get("sf")
    if steady_sf and sfs and {steady_sf} != sfs:
        print(f"benchgate: run sf {sorted(sfs)} differs from the committed "
              f"steady baseline's ({steady_sf}) — budgets from another "
              "scale would mask (or fake) regressions")
        return 2
    budgets = steady.get("queries", {})

    now = run.get("queries", {})
    failed = set(run.get("failed", []))
    rc = 0
    worst = []
    new = []
    if len(runs) > 1:
        basis = f"min of {len(runs)} artifacts"
    elif run.get("runs", 1) >= 2:
        basis = (f"single artifact, internal min of {run['runs']} passes, "
                 f"loadavg {l1:.2f}/{l5:.2f}")
    else:
        basis = f"single raw run, loadavg {l1:.2f}/{l5:.2f}"
    print(f"benchgate vs BENCH_STEADY_r{steady_round:02d} "
          f"(fail >{BUDGET}x and >{MIN_SEC}s) — {basis}")
    for q in sorted(now):
        v = now[q]
        if q in failed or not isinstance(v, (int, float)):
            print(f"  FAIL  {q}: query crashed")
            rc = 1
            continue
        b = budgets.get(q)
        if not isinstance(b, (int, float)) or b <= 0:
            new.append(q)
            continue
        ratio = v / b
        if ratio > BUDGET and v > MIN_SEC:
            print(f"  FAIL  {q}: {v:6.2f}s vs steady {b:.2f}s ({ratio:.2f}x)")
            rc = 1
        else:
            worst.append((ratio, q, v, b))
    gone = sorted(set(budgets) - set(now))
    worst.sort(reverse=True)
    for ratio, q, v, b in worst[:5]:
        print(f"  ok    {q}: {v:6.2f}s vs steady {b:.2f}s ({ratio:.2f}x)")
    if len(worst) > 5:
        print(f"  ok    ... and {len(worst) - 5} more within budget")
    if new:
        print(f"  note  no steady budget yet (new queries): {', '.join(new)}")
    if gone:
        print(f"  note  in steady but not in this run "
              f"(retired or SPARK_GRAFT_ONLY subset): {', '.join(gone)}")
    print(f"benchgate: {'FAIL' if rc else 'PASS'} "
          f"({len(worst)} within budget, {len(new)} unbudgeted)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
