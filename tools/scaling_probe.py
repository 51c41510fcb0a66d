#!/usr/bin/env python
"""Serving-latency scaling probe: builds stored indexes at 1x / 10x /
100x corpus scale and measures no-Spark-job serving latency at each —
the evidence behind the "latency decoupled from index size" claim
(pyarrow partition + row-group-stat pruning reads O(bands) row groups
whatever the total size).

Usage:  python tools/scaling_probe.py [--queries 100] [--dim 64]
Prints ONE JSON line:
  {"sizes": [...], "bucket_rows": [...], "p50_ms": [...], "p95_ms": [...]}

Run on an idle machine; the p95s use best-of-2 passes (same rationale
as bench.py — host stall windows would otherwise read as scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from lshrs_spark.config import LSHConfig
from lshrs_spark.operators.index import build_index, write_index
from lshrs_spark.serving import IndexServer
from lshrs_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--base", type=int, default=2000,
                    help="vectors at 1x scale")
    args = ap.parse_args()

    cfg = LSHConfig(dim=args.dim, num_perm=128, num_bands=8,
                    rows_per_band=16, seed=42)
    spark = get_spark("scaling_probe", cpus=os.cpu_count() or 8)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    qvecs = rng.standard_normal((args.queries, args.dim)).astype(np.float32)

    sizes, rows_out, p50s, p95s = [], [], [], []
    for mult in (1, 10, 100):
        n = args.base * mult
        # deterministic synthetic corpus, generated executor-side
        emb = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(args.dim)),
                    lambda d: (
                        F.sin(F.col("vec_id") * d * 0.7001) * 10
                    ).cast("float"),
                ).alias("embedding"),
            )
        )
        store = os.path.join(
            tempfile.gettempdir(), f"lshrs_scaling_{mult}x"
        )
        idx = build_index(emb, cfg, "vec_id", "embedding")
        write_index(idx, store)
        srv = IndexServer(store, cfg)
        srv.get_top_k(qvecs[0], 10)  # warm
        best = None
        for _ in range(2):
            lat = []
            for q in qvecs:
                t0 = time.perf_counter()
                srv.get_top_k(q, 10)
                lat.append(time.perf_counter() - t0)
            lat.sort()
            if best is None or lat[int(len(lat) * 0.95) - 1] < \
                    best[int(len(best) * 0.95) - 1]:
                best = lat
        sizes.append(mult)
        rows_out.append(n * cfg.num_bands)
        p50s.append(round(best[len(best) // 2] * 1000, 2))
        p95s.append(round(best[int(len(best) * 0.95) - 1] * 1000, 2))

    print(json.dumps({
        "sizes_x": sizes,
        "bucket_rows": rows_out,
        "p50_ms": p50s,
        "p95_ms": p95s,
    }))


if __name__ == "__main__":
    main()
