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

__all__ = ["content_hash_col", "corpus_diff", "corpus_diff_summary",
           "scd2_apply"]


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


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    *,
    version: int,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    open_marker: int = -1,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply an UPSERT batch of
    ``updates`` to a versioned ``history`` table, returning the new
    history. Every change is recorded, nothing overwritten:

    * tracked-value change  -> the open row CLOSES (``valid_to =
      version``) and a new open row starts (``valid_from = version``);
    * brand-new key         -> one open row at ``version``;
    * unchanged / absent key-> rows pass through untouched (absent keys
      are NOT deletes — updates are partial batches, the norm for CDC
      feeds; model deletes as a tracked status column).

    ``history`` carries ``keys + tracked + (valid_from, valid_to)`` with
    ``valid_to = open_marker`` on current rows; versions are caller-
    supplied integers (load ids / epoch days), so the whole merge is
    exact arithmetic. NULL key values are legitimate: presence after the
    full-outer join is tracked with explicit flag columns (never key
    nullability) and keys join null-safely (``<=>`` — still an
    equi-join). Duplicate keys within one batch are collapsed before the
    merge (greatest tracked-value tuple wins, deterministically) — one
    open row per key is the SCD2 invariant. Scale shape: ONE equi-join
    on the key between the open slice and the batch plus unions — closed
    history never joins anything, so cost tracks the ACTIVE dimension
    size, not the accumulated history.
    """
    keys = list(keys)
    tracked = list(tracked)
    closed = history.filter(F.col(to_col) != open_marker)
    # Explicit presence flags on BOTH join sides: inferring presence
    # from keys[0] nullability misclassifies a legitimately-NULL key
    # value (its open row would be treated as absent and dropped).
    cur = history.filter(F.col(to_col) == open_marker).withColumn(
        "_h_present", F.lit(True)
    )
    # Per-batch key uniqueness is a merge precondition (two open rows
    # for one key is not representable); duplicate keys in one batch
    # would fan the join out into multiple open rows. Collapse them
    # deterministically: greatest tracked-value tuple wins.
    upd = (
        updates.groupBy(*[F.col(k).alias(f"_u_{k}") for k in keys])
        .agg(
            F.max(F.struct(*[F.col(c) for c in tracked])).alias("_u_vals")
        )
        .select(
            *[F.col(f"_u_{k}") for k in keys],
            *[F.col("_u_vals").getField(c).alias(f"_u_{c}") for c in tracked],
            F.lit(True).alias("_u_present"),
        )
    )
    cond = [F.col(k).eqNullSafe(F.col(f"_u_{k}")) for k in keys]
    j = cur.join(upd, cond, "full")
    matched = (
        F.col("_h_present").isNotNull() & F.col("_u_present").isNotNull()
    )
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    changed = matched & differs
    # old rows: closed when changed, passed through otherwise
    old_rows = j.filter(F.col("_h_present").isNotNull()).select(
        *keys, *tracked,
        F.col(from_col),
        F.when(changed, F.lit(version)).otherwise(F.col(to_col)).alias(to_col),
    )
    # new open rows: changed values + brand-new keys
    new_rows = j.filter(
        changed
        | (F.col("_h_present").isNull() & F.col("_u_present").isNotNull())
    ).select(
        *[F.col(f"_u_{k}").alias(k) for k in keys],
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        F.lit(version).alias(from_col),
        F.lit(open_marker).alias(to_col),
    )
    return closed.select(*keys, *tracked, from_col, to_col).unionByName(
        old_rows
    ).unionByName(new_rows)
