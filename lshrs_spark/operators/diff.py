"""Corpus snapshot diff — data-versioning for training corpora.

A pretraining corpus is rebuilt continuously (new crawls in, takedowns
out, cleaning recipes change). Before promoting snapshot N+1, the
pipeline needs the delta against snapshot N: what was added, removed,
changed, and — for incremental consumers (index refresh, dedup stores,
tokenized caches) — the minimal set of documents to reprocess.

Scale shape: both sides project down to ``(id, content_hash)`` BEFORE
the full-outer join, so the shuffle moves ~16 bytes per document, not
document payloads — diffing 100 TB of text shuffles only a few hundred
GB of hashes. The join is a plain equi-join on the id: co-partitioned
(bucketed) snapshot storage makes it shuffle-free entirely. The content
hash is the portable :func:`~lshrs_spark.functions.text.h48` so the
DuckDB oracle replays the verdicts bit-for-bit; pass
``base_hash='xxhash64'`` for the JVM-native production path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["content_hash_col", "corpus_diff", "corpus_diff_summary"]


def content_hash_col(content_cols: Sequence[str], *, base_hash: str = "h48"):
    """48-bit content fingerprint over the given columns. NULL-safe and
    unambiguous: columns join under a separator that also escapes an
    empty/NULL cell, so ``('a', NULL)`` and ``('a', '')`` and
    ``('a\\x1f',)`` hash apart."""
    cells = [
        F.coalesce(
            F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null:")
        )
        for c in content_cols
    ]
    joined = F.concat_ws("\x1f", *cells)
    if base_hash == "xxhash64":
        return F.xxhash64(joined)
    from ..functions.text import h48

    return h48(joined)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    base_hash: str = "h48",
) -> DataFrame:
    """Per-document delta between two corpus snapshots:
    ``(id, status)`` with status in {'added', 'removed', 'changed',
    'unchanged'}. Projection-first: each side reduces to
    ``(id, content_hash)`` at the scan, then one full-outer equi-join
    classifies every id."""
    h = content_hash_col(content_cols, base_hash=base_hash)
    o = old.select(F.col(id_col).cast("long").alias("id"), h.alias("_oh"))
    n = new.select(F.col(id_col).cast("long").alias("id"), h.alias("_nh"))
    return o.join(n, "id", "full_outer").select(
        "id",
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def corpus_diff_summary(diff: DataFrame) -> DataFrame:
    """Roll the per-document statuses up to ``(status, n)`` — the
    4-row promotion-gate report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
