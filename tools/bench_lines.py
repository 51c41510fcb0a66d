"""Shared bench-line definitions for bench.py and tools/drift_ab.py.

The drift protocol's isolated re-measures are only meaningful if they
time EXACTLY the computation the bench series records — the first
drift_ab draft diverged from bench.py's corpus setup (missing
``repartition(CPUS).persist()``) and read ``dedup_substring`` 2.2x
slow from single-input-split shingling. These definitions are the
single source both scripts import, so a bench-line edit cannot
silently invalidate the A/B protocol.

Only the document-corpus lines that have needed isolated re-measures
live here; bench.py's store-building / serving / streaming sections
stay inline (they share state across sections that a per-line module
cannot own).
"""

from __future__ import annotations


def bench_docs(spark, sf_dir: str, cpus: int):
    """bench.py's corpus setup, verbatim: one small parquet file ->
    one input split, so spread the corpus over the cores. The CALLER
    persists (bench.py times the persist fill; drift_ab warms it
    before any timing)."""
    return spark.read.parquet(
        f"{sf_dir}/documents.parquet").repartition(cpus)


def shared_line_fns(spark, docs, sf_dir: str) -> dict:
    """The re-measurable bench lines over a (persisted) ``docs``
    frame: name -> zero-arg callable returning the same count
    bench.py times. Definitions are THE bench definitions — change
    them here and both the bench series and the drift runner move
    together."""
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

    def run_substring():
        n = substring_span_pairs(docs, 32).count()
        release_slots()   # span persist slot — same hygiene as minhash
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
        release_slots()  # pagerank's per-invocation edge persist slot
        return n

    vid = with_video_payload(docs, num_frames=3, width=7, height=8)
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    return {
        "dedup_substring": run_substring,
        "text_pipeline": run_text,
        "text_hybrid_rrf": lambda: _ENTRY_QUERIES["text_hybrid_rrf"](
            spark, sf_dir).count(),
        "dedup_video_frames": lambda: video_near_dup_pairs(
            vid, min_shared_frames=1, max_hash_freq=50).count(),
        "graph_pagerank": run_pagerank,
        "dedup_minhash_xxh": lambda: minhash_band_pairs(
            docs, num_hashes=8, rows_per_band=2,
            base_hash="xxhash64").count(),
        "text_heavy_hitters": lambda: heavy_hitters(tok, "token",
                                                    100).count(),
    }
