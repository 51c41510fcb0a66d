#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from lshrs_spark import LSHConfig, LSHRS
from lshrs_spark.operators.index import build_index
from lshrs_spark.operators.probe import candidates, rerank, top_k, top_p_cutoff
from lshrs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Production-shaped config: 128 hyperplanes, 8 bands x 16 rows, float32.
CFG = LSHConfig(dim=64, num_perm=128, num_bands=8, rows_per_band=16, seed=42)


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.count()  # warm the scan / JVM before timing

    results: dict[str, float] = {}

    # 1. Bulk index build (S1+H1-H4+S4): signatures + explode, materialized.
    idx = build_index(emb, CFG, "vec_id", "embedding")
    results["index_build"], n_entries = timed(lambda: (idx.count(),))
    idx = idx.cache()
    idx.count()

    # 2. Batch top-k probe: 100 query vectors through one plan (Q1-Q4).
    qdf = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    qsigs = build_index(qdf, CFG, "qid", "qvec").withColumnRenamed("id", "qid")

    def run_topk():
        return top_k(candidates(idx, qsigs), 10).count()

    results["topk_batch100"], _ = timed(run_topk)

    # 3. Rerank + top-p for the same 100 queries (Q5-Q8).
    def run_topp():
        cands = candidates(idx, qsigs)
        scored = rerank(cands, emb, qdf, query_vector_col="qvec")
        return top_p_cutoff(scored, 0.5, 10).count()

    results["topp_batch100"], _ = timed(run_topp)

    # 4. Single-query latency through the user API (collects to driver).
    lsh = LSHRS(spark, 64, num_perm=128, num_bands=8, rows_per_band=16)
    lsh._index_df = idx
    lsh.set_vectors(emb)
    qv = np.array(emb.filter("vec_id = 0").first().embedding, dtype=np.float32)
    results["single_topk"], _ = timed(lambda: lsh.get_top_k(qv, 10))

    total = sum(results.values())
    print(json.dumps({
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
