"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``lshrs_spark/`` (see SURVEY.md §7); the query/
oracle registry is ``lshrs_spark/entries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the SRP-LSH bucket
    index over the embeddings table and run a batch top-k ANN query (the
    reference's ``get_top_k`` for the first 5 vectors) as ONE Spark plan."""
    from pyspark.sql import functions as F

    from lshrs_spark import LSHRS

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = LSHRS(spark, dim=64, num_perm=128, num_bands=16, rows_per_band=8)
    lsh.index_dataframe(emb)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return lsh.query_batch(queries_df, top_k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lshrs_spark.entries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from lshrs_spark.entries import ORACLES

    return dict(ORACLES)
