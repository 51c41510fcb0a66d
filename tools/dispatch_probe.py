#!/usr/bin/env python
"""Per-job dispatch-latency probe + Spark-job census for a bench line.

Settlement machinery for DISPATCH-BOUND bench lines (VERDICT r13
wrong #1: ``ivf_maintain_20x``'s quiet floor crept 2.41 -> ~2.9 s on
git-identical code while every other line read flat). The mechanism
this probe measures: a maintenance cycle is ~16 driver-synchronous
Spark jobs over ~2 MB of store — two real rewrite jobs plus file
listings, sidecar reads, coalesce(1) writes — so its floor is
``n_jobs x per-job dispatch latency``, and a host-side scheduler
drift of a few tens of ms/job moves this one line by hundreds of ms
while 1-3-job lines absorb the same drift invisibly.

Two sub-measurements, each in its own fresh process/JVM:

- ``floor``: the tuned (UI-off) session times 30 trivial one-task
  jobs (``sc.parallelize([1], 1).count()``) after 5 warm-ups —
  min/p50/p90 of raw dispatch+schedule+collect latency with zero I/O
  and zero compute. This is the host number the dispatch-bound lines
  track.
- ``census``: a UI-enabled session (REST API needed for job
  accounting) runs one warmed ``ivf_maintain`` cycle on the bench
  template store and records every Spark job it issued — count,
  durations, top descriptions. The census is the line-side half:
  floor x n_jobs ~ the line's quiet floor.

Usage:
    python tools/dispatch_probe.py [--out DISPATCH_rN.json]
                                   [--line BENCH_LINE]

``--line`` (r14) censuses any drift-covered bench line via the shared
definitions in tools/bench_lines — the first settlement was
maintain-specific; the machinery is not.

Writes one JSON document: {"guard", "floor", "census"}. The guard is
sampled BEFORE either JVM starts (same contract as scaling_probe).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _floor_mode() -> None:
    from lshrs_spark.session import get_spark

    spark = get_spark("dispatch_floor", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for _ in range(5):
        sc.parallelize([1], 1).count()
    tr = []
    for _ in range(30):
        t0 = time.perf_counter()
        sc.parallelize([1], 1).count()
        tr.append(time.perf_counter() - t0)
    tr.sort()
    print("RESJSON " + json.dumps({
        "reps": len(tr),
        "min_s": round(tr[0], 4),
        "p50_s": round(tr[len(tr) // 2], 4),
        "p90_s": round(tr[(len(tr) * 9) // 10], 4),
        "max_s": round(tr[-1], 4),
    }), flush=True)


def _census_mode(line: str) -> None:
    import urllib.request

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # the ONE deliberate divergence from the bench session: the
        # REST API is the only complete job ledger, and the UI
        # listener inflates absolute wall times (~30% observed) — the
        # census is for job COUNTS and relative durations, never for
        # comparing against the bench series
        .config("spark.ui.enabled", "true")
        .appName("dispatch_census").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # any drift-covered bench line (r14 generalization: the first
    # dispatch-bound settlement was maintain-specific; the line
    # definitions were shared in tools/bench_lines all along). Uses
    # the drift runner's store prefix — census and drift A/B share
    # the single-instance bench convention and never run concurrently.
    from tools.drift_ab import build_line_fns

    fns, materialize_before = build_line_fns(spark, [line])
    entry = fns[line]
    fn = entry["fn"] if isinstance(entry, dict) else entry
    reset = entry.get("reset") if isinstance(entry, dict) else None

    def jobs():
        url = (f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
               "/jobs?status=succeeded")
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    materialize_before(line)
    if reset:
        reset()
    fn()  # warm-up run, excluded (bench parity)
    if reset:
        reset()
    before = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    from datetime import datetime

    def _dur(j) -> float:
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        s = datetime.strptime(j["submissionTime"].replace("GMT", ""), fmt)
        c = datetime.strptime(j["completionTime"].replace("GMT", ""), fmt)
        return (c - s).total_seconds()

    new = sorted((j for j in jobs() if j["jobId"] not in before),
                 key=_dur, reverse=True)
    print("RESJSON " + json.dumps({
        "line": line,
        "wall_s": round(wall, 3),
        "n_jobs": len(new),
        "job_durations_s": sorted(round(_dur(j), 3) for j in new),
        "top_jobs": [
            {"dur_s": round(_dur(j), 3),
             "desc": (j.get("description") or j.get("name", ""))[:120]}
            for j in new[:5]
        ],
    }), flush=True)


def _run_sub(mode: str, extra: list | None = None) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), f"--{mode}-mode",
         *(extra or [])],
        capture_output=True, text=True,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESJSON "):
            return json.loads(line[len("RESJSON "):])
    raise SystemExit(
        f"{mode} subprocess produced no RESJSON (exit {r.returncode}):\n"
        + r.stdout[-2000:] + r.stderr[-2000:])


def main() -> None:
    args = sys.argv[1:]
    if args[:1] == ["--floor-mode"]:
        _floor_mode()
        return
    if args[:1] == ["--census-mode"]:
        _census_mode(args[1] if len(args) > 1 else "ivf_maintain_20x")
        return
    out_path = None
    line = "ivf_maintain_20x"
    i = 0
    while i < len(args):
        if args[i] == "--out" and i + 1 < len(args):
            out_path = args[i + 1]
            i += 2
        elif args[i] == "--line" and i + 1 < len(args):
            line = args[i + 1]
            i += 2
        else:
            sys.exit("usage: dispatch_probe.py [--out F.json] "
                     "[--line BENCH_LINE]")

    from tools.bench_lines import quiet_guard

    guard = quiet_guard(CPUS, io_paths=[SF_DIR])
    census = _run_sub("census", [line])
    floor = _run_sub("floor")
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "line": line,
               "guard": guard, "floor": floor, "census": census}
    print("DISPATCHJSON " + json.dumps(payload), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
