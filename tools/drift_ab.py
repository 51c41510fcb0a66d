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
    """The flagged lines, mirroring bench.py's definitions verbatim
    (same inputs, same counts, same release_slots hygiene)."""
    from pyspark.sql import functions as F

    from lshrs_spark.cache import release_slots
    from lshrs_spark.entries import QUERIES as _ENTRY_QUERIES
    from lshrs_spark.functions import text as X
    from lshrs_spark.functions.sketch import heavy_hitters
    from lshrs_spark.multimodal import with_video_payload
    from lshrs_spark.operators.dedup import (
        minhash_band_pairs,
        substring_span_pairs,
        video_near_dup_pairs,
    )
    from lshrs_spark.operators.graph import pagerank

    # EXACTLY bench.py's corpus setup: one small parquet file -> one
    # input split, so the corpus is spread over the cores and
    # persisted before any timing (first drift_ab draft skipped this
    # and read substring/minhash 2-3x slow — single-split shingling,
    # not a regression)
    docs = spark.read.parquet(
        f"{SF_DIR}/documents.parquet").repartition(CPUS)
    docs.persist().count()

    def run_substring():
        n = substring_span_pairs(docs, 32).count()
        release_slots()
        return n

    def run_text():
        cols = X.quality_score_cols(F.col("text"))
        return docs.select(
            "doc_id",
            cols["quality"].alias("q"),
            X.language_id_col(F.col("text")).alias("lang"),
            X.fingerprint_col(F.col("text")).alias("fp"),
        ).count()

    def run_pagerank():
        pairs = minhash_band_pairs(docs, num_hashes=8, rows_per_band=2,
                                   base_hash="xxhash64")
        nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
        n = pagerank(pairs, nodes, iterations=3).count()
        release_slots()
        return n

    vid = with_video_payload(docs, num_frames=3, width=7, height=8)
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    return {
        "dedup_substring": run_substring,
        "text_pipeline": run_text,
        "text_hybrid_rrf": lambda: _ENTRY_QUERIES["text_hybrid_rrf"](
            spark, SF_DIR).count(),
        "dedup_video_frames": lambda: video_near_dup_pairs(
            vid, min_shared_frames=1, max_hash_freq=50).count(),
        "graph_pagerank": run_pagerank,
        "dedup_minhash_xxh": lambda: minhash_band_pairs(
            docs, num_hashes=8, rows_per_band=2,
            base_hash="xxhash64").count(),
        "text_heavy_hitters": lambda: heavy_hitters(tok, "token",
                                                    100).count(),
    }


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    out_path = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--out":
            out_path = next(it)
        else:
            names.append(a)
    names = names or R11_FLAGGED

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
