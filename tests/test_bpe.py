"""Deterministic BPE tokenizer: learning, application, and the
distinct-word-encode + join-back counting operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from lshrs_spark.functions.bpe import (
    DEFAULT_MERGES,
    apply_bpe,
    bpe_token_counts,
    learn_bpe_merges,
)


def test_learn_merges_deterministic(spark):
    """Classic Sennrich walkthrough (low/lower/lowest): most frequent
    pair wins, ties break lexicographically, min_freq stops learning."""
    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "lowest")],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(docs, 10, min_freq=2)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")]
    assert learn_bpe_merges(docs, 10, min_freq=2) == merges  # repeatable


def test_apply_bpe_leftmost_semantics():
    merges = [("t", "h"), ("th", "e"), ("a", "n")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert apply_bpe("the", ranks) == ["the"]
    assert apply_bpe("then", ranks) == ["the", "n"]
    assert apply_bpe("ananan", ranks) == ["an", "an", "an"]  # leftmost chain
    assert apply_bpe("xyz", ranks) == ["x", "y", "z"]
    assert apply_bpe("x", ranks) == ["x"]


def test_bpe_token_counts_matches_driver_side(spark):
    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "lowest mal")],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(docs, 10, min_freq=2)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r.id: r.n_bpe_tokens for r in
           bpe_token_counts(docs, merges).collect()}
    want = {
        i: sum(len(apply_bpe(w, ranks)) for w in t.split(" "))
        for i, t in [(1, "low low low"), (2, "lower lower"), (3, "lowest mal")]
    }
    assert got == want == {1: 3, 2: 2, 3: 3 + 3}


def test_bpe_vocab_broadcast_is_optional(spark):
    """Same contract as unigram_logprob: the (word, cost) table grows
    with the vocabulary, so the broadcast hint must be opt-out."""
    from lshrs_spark.streaming.ingest import scoped_session_conf

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "doc_id long, text string",
    )
    merges = [("a", "l"), ("b", "e")]
    with scoped_session_conf(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        off = bpe_token_counts(docs, merges, broadcast_vocab=False)
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_off, plan_off
        on = bpe_token_counts(docs, merges, broadcast_vocab=True)
        plan_on = on._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_on, plan_on


def test_default_merges_shipped_and_applicable(spark):
    """The shipped merge table is non-trivial and compresses the
    sf0.001 corpus it was learned from (n_bpe < n_chars per doc)."""
    assert len(DEFAULT_MERGES) >= 32
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    joined = (
        bpe_token_counts(docs, DEFAULT_MERGES)
        .join(
            docs.select(
                F.col("doc_id").cast("long").alias("id"),
                F.length(F.regexp_replace("text", " ", "")).alias("n_chars"),
                (F.size(F.split(F.col("text"), " "))).alias("n_words"),
            ),
            "id",
        )
        .select(
            F.sum("n_bpe_tokens").alias("bpe"),
            F.sum("n_chars").alias("chars"),
            F.sum("n_words").alias("words"),
        )
        .first()
    )
    assert joined.words <= joined.bpe < joined.chars
