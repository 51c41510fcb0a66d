#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf=0.01, compare row count, column names and order-insensitive values.

Usage: python tools/check_oracle.py [--vanilla] [--window] [name ...]
(--window = exactly the DRIVER_WINDOW 50 — the driver-gate simulation)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            # binary/bytes or strings; leave as-is
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    # Strict dtype parity: the driver's schema compare may not normalize
    # integer widths or nullable-int-to-float degradation.
    for c in spark_pdf.columns:
        a, b = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        if a != b:
            problems.append(f"dtype differs in {c!r}: spark={a} duck={b}")
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                b[c].dtype, np.floating
            ):
                av = a[c].astype(np.float64).to_numpy()
                bv = b[c].astype(np.float64).to_numpy()
                ok = np.allclose(av, bv, rtol=1e-7, atol=1e-7, equal_nan=True)
            else:
                ok = a[c].equals(b[c])
            if not ok:
                bad = (a[c] != b[c]) if a[c].dtype == b[c].dtype else None
                sample = ""
                if bad is not None and bad.any():
                    i = int(np.argmax(bad.to_numpy()))
                    sample = f" first diff row {i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
                problems.append(f"values differ in column {c!r}{sample}")
    return problems


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from lshrs_spark.session import get_spark

    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = set(a for a in args if not a.startswith("--"))
    qs = e.queries()
    oracles = e.oracle_sql()
    if "--window" in args:
        # exactly the driver's 50-row gate: the DRIVER_WINDOW prefix
        from lshrs_spark.entries import DRIVER_WINDOW

        only |= set(DRIVER_WINDOW)
    if vanilla:
        # Simulate the driver: a bare session with none of our tuning
        # (no AQE/Arrow/timezone confs) — entries must self-configure.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('CPUS', '8')}]"
            )
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle", cpus=int(os.environ.get("CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    n_fail = 0
    n_pass = 0
    n_rows_only = 0
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            status = "rows-only"
            n_rows_only += 1
            print(f"OK?  {name}: {len(spark_pdf)} rows ({status}, spark {t1-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name}: {len(spark_pdf)} rows (spark {t1-t0:.1f}s, duck {time.time()-t1:.1f}s)")
    # Aggregate summary BEFORE spark.stop(): stop() has been observed to
    # hang under JVM contention (VERDICT r7 what's-wrong #2) — the last
    # line of a truncated/killed run must still carry the verdict.
    print(
        f"SUMMARY {n_pass} PASS / {n_fail} FAIL / {n_rows_only} rows-only "
        f"/ {time.time() - t_start:.0f}s",
        flush=True,
    )
    try:
        spark.stop()
    except Exception:
        pass
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
