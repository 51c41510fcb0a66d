"""Registry backing ``__spark_entry__.py``: every implemented operator gets
a ``queries()`` entry (Spark DataFrame program) and, when SQL-expressible,
a matching ``oracle_sql()`` DuckDB query over the same parquet tables.

Conventions (driver contract):
* column names identical between Spark result and oracle SQL;
* float columns rounded to 5 decimals on BOTH sides (float32/float64
  drift, FIXTURES.md §6);
* deterministic orderings with id tiebreaks — the driver hash is
  order-insensitive but limits/cutoffs must select identical row SETS;
* integer-typed columns cast to long/BIGINT on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import LSHConfig
from .operators.index import build_index
from .operators.probe import candidates, rerank, top_k, top_p_cutoff
from .functions.vector import cosine_similarity
from .oracle import ORACLE_CFG, cosine_sql, h48_sql, sigs_cte

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _query_sigs(spark: SparkSession, sf_dir: str, qid: int = 0) -> DataFrame:
    """Signatures of the query vector (= embeddings row ``qid``) computed
    through the same DataFrame path as the index."""
    q = _emb(spark, sf_dir).filter(F.col("vec_id") == qid)
    return build_index(q, ORACLE_CFG, "vec_id", "embedding").withColumnRenamed(
        "id", "qid"
    )


_SIGS = sigs_cte(ORACLE_CFG)  # WITH-clause body: (id, band, sig) for embeddings
_CAND = (
    "q AS (SELECT band, sig FROM sigs WHERE id = 0), "
    "cand AS (SELECT s.id AS id, count(*)::BIGINT AS collisions "
    "FROM sigs s JOIN q USING (band, sig) GROUP BY s.id)"
)


# --------------------------------------------------------------------- #
# H1-H4 / S4: signature generation + index build (SURVEY §2.2)
# --------------------------------------------------------------------- #

@register(
    "lsh_signatures",
    f"WITH {_SIGS} SELECT id, band, sig FROM sigs",
)
def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP band signatures for every vector — the exploded bucket index
    (reference H1-H4 + S4)."""
    return build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding").select(
        "id", "band", "sig"
    )


@register(
    "lsh_index_stats",
    f"""WITH {_SIGS},
bucket AS (SELECT band, sig, count(*)::BIGINT AS n FROM sigs GROUP BY band, sig)
SELECT band, count(*)::BIGINT AS buckets, sum(n)::BIGINT AS entries,
       max(n)::BIGINT AS max_bucket
FROM bucket GROUP BY band""",
)
def lsh_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy stats per band (M3 + hot-bucket diagnostics)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    bucket = idx.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n"))
    return bucket.groupBy("band").agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("n").alias("entries"),
        F.max("n").alias("max_bucket"),
    )


# --------------------------------------------------------------------- #
# Q1-Q4: probe -> collision count -> order -> limit (SURVEY §2.3)
# --------------------------------------------------------------------- #

@register(
    "lsh_topk",
    f"""WITH {_SIGS}, {_CAND},
ranked AS (SELECT id, collisions,
                  row_number() OVER (ORDER BY collisions DESC, id ASC) AS rank
           FROM cand)
SELECT id, collisions, rank FROM ranked WHERE rank <= 10""",
)
def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end top-k ANN query for query vector = embeddings row 0
    (reference ``get_top_k``, Q1-Q4)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    cands = candidates(idx, _query_sigs(spark, sf_dir))
    return top_k(cands, 10).select(
        "id", "collisions", F.col("rank").cast("long").alias("rank")
    )


@register(
    "lsh_topp",
    f"""WITH {_SIGS}, {_CAND},
scored AS (SELECT c.id AS id,
                  {cosine_sql("e.embedding", "qe.embedding")} AS score
           FROM cand c
           JOIN embeddings e ON e.vec_id = c.id
           CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) qe),
ranked AS (SELECT id, score,
                  row_number() OVER (ORDER BY score DESC, id ASC) AS rank,
                  count(*) OVER () AS n
           FROM scored)
SELECT id, round(score, 5) AS score, rank
FROM ranked WHERE rank <= greatest(1, ceil(n * 0.5))""",
)
def lsh_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank candidates by exact cosine and keep the proportional prefix
    ``max(1, ceil(n*0.5))`` (reference ``get_above_p``, Q5-Q8)."""
    emb = _emb(spark, sf_dir)
    idx = build_index(emb, ORACLE_CFG, "vec_id", "embedding")
    cands = candidates(idx, _query_sigs(spark, sf_dir))
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = rerank(cands, emb, qdf)
    return top_p_cutoff(scored, 0.5).select(
        "id",
        F.round("score", 5).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


# --------------------------------------------------------------------- #
# Similarity search baseline: brute-force exact cosine top-k (north-star)
# --------------------------------------------------------------------- #

@register(
    "knn_bruteforce",
    f"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (SELECT e.vec_id AS id,
                  {cosine_sql("e.embedding", "q.embedding")} AS score
           FROM embeddings e CROSS JOIN q),
ranked AS (SELECT id, score,
                  row_number() OVER (ORDER BY score DESC, id ASC) AS rank
           FROM scored)
SELECT id, round(score, 5) AS score, rank FROM ranked WHERE rank <= 10""",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vector 0 — the correctness baseline
    every ANN path is measured against."""
    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    )
    scored = emb.crossJoin(q).select(
        F.col("vec_id").alias("id"),
        cosine_similarity(F.col("embedding"), F.col("qvec")).alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("id", F.round("score", 5).alias("score"),
                F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------------- #
# M1: delete = left-anti join rewrite of the index
# --------------------------------------------------------------------- #

@register(
    "lsh_delete",
    f"""WITH {_SIGS}
SELECT id, band, sig FROM sigs WHERE id NOT IN (0,1,2,3,4,5,6,7,8,9)""",
)
def lsh_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index after deleting ids 0-9 — anti-join instead of the reference's
    full Redis keyspace scan (M1)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    deleted = spark.createDataFrame([(i,) for i in range(10)], "id long")
    return idx.join(F.broadcast(deleted), "id", "left_anti").select(
        "id", "band", "sig"
    )
