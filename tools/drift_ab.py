#!/usr/bin/env python
"""Isolated fresh-JVM re-measure of flagged bench lines (drift protocol).

The repo's perf-drift protocol (README "Round-over-round line deltas are
judged against ISOLATED quiet-host re-measures") needs a reusable
runner: the driver's bench file rides a virtualized host right after
thirty Spark-heavy lines, so any flagged delta is re-measured here —
fresh JVM, recorded quiet-host guard, one warm-up then min-of-REPS
(default 5), line definitions mirroring bench.py exactly.

Usage:
    python tools/drift_ab.py [--reps 5] [--out FILE.json] [line ...]

With no line names, runs the round-11 flagged set (VERDICT r10 wrong
#1): dedup_substring, text_pipeline, text_hybrid_rrf,
dedup_video_frames, graph_pagerank, dedup_minhash_xxh,
text_heavy_hitters.
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

R11_FLAGGED = [
    "dedup_substring",
    "text_pipeline",
    "text_hybrid_rrf",
    "dedup_video_frames",
    "graph_pagerank",
    "dedup_minhash_xxh",
    "text_heavy_hitters",
]


def quiet_guard() -> dict:
    """Record (never silently trust) host quietness: stray JVM count
    and 1-minute load — the same guard serving_probe.py writes."""
    try:
        out = subprocess.run(
            ["pgrep", "-fc", "SparkSubmit|java -cp"],
            capture_output=True, text=True,
        ).stdout.strip()
        n_java = int(out or 0)
    except Exception:
        n_java = -1
    load1 = os.getloadavg()[0]
    return {"stray_jvms": n_java, "load1": round(load1, 2),
            "quiet": n_java == 0 and load1 < float(CPUS) / 4}


def line_fns(spark):
    """The flagged lines — the SAME definitions bench.py times
    (tools/bench_lines.py is the single source; the first draft of
    this runner carried private copies and diverged on the corpus
    setup, reading substring/minhash 2-3x slow from single-split
    shingling)."""
    from tools.bench_lines import bench_docs, shared_line_fns

    docs = bench_docs(spark, SF_DIR, CPUS)
    docs.persist().count()   # warmed BEFORE any timing (bench parity)
    return shared_line_fns(spark, docs, SF_DIR)


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    out_path = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps_s = next(it, None)
            # isdigit alone let --reps 0 through, which paid JVM
            # startup and the warm-up run before crashing on min([])
            # of an empty times list (ADVICE r11)
            if reps_s is None or not reps_s.isdigit() or int(reps_s) < 1:
                sys.exit("--reps needs a positive integer argument")
            reps = int(reps_s)
        elif a == "--out":
            out_path = next(it, None)
            if out_path is None:
                sys.exit("--out needs a file path argument")
        else:
            names.append(a)
    names = names or R11_FLAGGED
    # fail fast on a typo'd line name BEFORE paying JVM startup
    known = set(R11_FLAGGED)  # == tools.bench_lines.shared_line_fns keys
    unknown = [n for n in names if n not in known]
    if unknown:
        sys.exit(f"unknown bench line(s) {unknown}; known: {sorted(known)}")

    guard = quiet_guard()
    from lshrs_spark.session import get_spark

    spark = get_spark("drift_ab", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    fns = line_fns(spark)
    results = {}
    for name in names:
        fn = fns[name]
        fn()  # warm-up, excluded
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        results[name] = {"min": round(min(times), 3),
                         "runs": [round(t, 3) for t in times]}
        print(f"AB {name} min={min(times):.3f} "
              f"runs={[round(t, 3) for t in times]}", flush=True)
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": reps,
               "guard": guard, "results": results}
    print("ABJSON " + json.dumps(payload), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
