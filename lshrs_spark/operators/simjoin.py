"""Similarity joins over vector columns (beyond-reference surface,
SURVEY.md §7.2 M5 — the reference only does single-vector queries).

Two strategies:

* :func:`similarity_join` — LSH-accelerated: self-join the exploded
  bucket index on ``(band, sig)`` to generate candidate pairs, then filter
  by exact cosine. At 100 TB this is the only viable shape: the pair space
  collapses from O(n²) to the bucket-collision set, the per-band join is
  an equi-join Catalyst can shuffle-hash, and AQE's skew-join splitting
  handles hot buckets (low-selectivity signatures — the reference warns
  about these in README.md:216). ``max_bucket_size`` drops degenerate
  buckets outright (standard LSH practice: a bucket holding a large
  fraction of the corpus carries no selectivity anyway).
* :func:`exact_similarity_join` — brute-force O(n²) baseline with
  optional blocking column; the correctness oracle for the LSH path and
  the right tool at small n.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_slot
from ..config import LSHConfig
from ..functions.vector import unit_or_null
from .index import build_index

__all__ = ["candidate_pairs", "similarity_join", "exact_similarity_join"]


_unit = unit_or_null  # shared normalize-or-null policy (functions.vector)


def candidate_pairs(
    index_df: DataFrame,
    *,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """Distinct id pairs (id_a < id_b) sharing at least one bucket."""
    idx = index_df
    if max_bucket_size is not None:
        sizes = idx.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("_n"))
        idx = (
            idx.join(sizes.filter(F.col("_n") <= max_bucket_size), ["band", "sig"])
            .drop("_n")
        )
    a = idx.alias("a")
    b = idx.alias("b")
    return (
        a.join(b, on=["band", "sig"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def similarity_join(
    df: DataFrame,
    cfg: LSHConfig,
    threshold: float,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    *,
    max_bucket_size: Optional[int] = None,
    round_scores: Optional[int] = None,
    cache_index: bool = False,
) -> DataFrame:
    """LSH candidate pairs + exact cosine filter: ``(id_a, id_b, score)``
    with ``score >= threshold``. Approximate by construction: pairs that
    never collide in any band are missed at the planner-predicted
    false-negative rate (``planner.compute_false_rates``).

    ``cache_index=True`` persists the exploded index before the self-join
    so the signature UDF runs once instead of once per join side — use it
    when the index isn't already a stored table (at scale, write the
    index with ``write_index`` and self-join the stored table instead)."""
    idx = build_index(df, cfg, id_col, vector_col)
    if cache_index:
        # persist via the bounded slot registry: lineage kept (cluster
        # fault tolerance), and repeated calls don't accumulate
        # CacheManager entries.
        # r14 (guide §2.4): hash(band, sig)-partition BEFORE the persist —
        # the cached layout then satisfies the bucket-size aggregation,
        # the cap join and BOTH self-join sides, so one exchange of the
        # fan-out table replaces one per operator (at scale the join
        # sides alone each re-shuffled the whole exploded index). Skew
        # note: a hot (band, sig) bucket concentrates here, but its
        # input mass is bounded by max_bucket_size (over-cap buckets are
        # dropped below) and the quadratic hazard of a hot bucket is in
        # the join OUTPUT, which an input-side AQE split never addressed
        # — the cap remains the real defense.
        idx = persist_slot(
            idx.repartition(F.col("band"), F.col("sig")),
            "simjoin.index", eager=True,
        )
    pairs = candidate_pairs(idx, max_bucket_size=max_bucket_size)
    # Normalize ONCE per vector (n rows) so the per-pair expression is a
    # single fused dot product — candidate pairs outnumber vectors by
    # orders of magnitude, so hoisting the two norms out of the pair loop
    # is the dominant-term win at any scale.
    vecs = df.select(
        F.col(id_col).cast("long").alias("_vid"),
        _unit(F.col(vector_col)).alias("_v"),
    )
    # Per-pair scoring runs in the shared Arrow kernel (guide §4.2):
    # the Catalyst zip_with+fold dot is interpreted per pair, the
    # kernel is one NumPy pass per batch with bit-identical values;
    # rounding and the threshold cut stay Catalyst expressions over
    # the kernel's raw score, exactly as before.
    from ..functions.batchscore import make_dot_pairs_fn

    fn, schema = make_dot_pairs_fn()
    scored = (
        pairs.join(vecs.withColumnRenamed("_v", "_va"), pairs.id_a == vecs._vid)
        .drop("_vid")
        .join(
            vecs.select(F.col("_vid"), F.col("_v").alias("_vb")),
            F.col("id_b") == F.col("_vid"),
        )
        .select("id_a", "id_b", "_va", "_vb")
        .mapInArrow(fn, schema)
    )
    score = F.col("score")
    if round_scores is not None:
        score = F.round(score, round_scores)
    return (
        scored.select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def exact_similarity_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    *,
    block_col: Optional[str] = None,
    round_scores: Optional[int] = None,
) -> DataFrame:
    """All-pairs cosine join (id_a < id_b), optionally blocked on an
    equality column to bound the pair space."""
    cols = [
        F.col(id_col).cast("long").alias("id"),
        _unit(F.col(vector_col)).alias("v"),  # normalize n times, not n² times
    ]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    # same Arrow pair-scoring kernel as similarity_join — the n² pair
    # space makes the interpreted per-pair fold the dominant CPU term
    from ..functions.batchscore import make_dot_pairs_fn

    fn, schema = make_dot_pairs_fn()
    scored = (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("_va"),
            F.col("b.v").alias("_vb"),
        )
        .mapInArrow(fn, schema)
    )
    score = F.col("score")
    if round_scores is not None:
        score = F.round(score, round_scores)
    return (
        scored.select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )
