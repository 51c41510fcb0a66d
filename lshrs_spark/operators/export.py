"""Training-export primitives: deterministic global shuffle, shard
assignment, and hash-based sampling.

A pretraining corpus leaves the pipeline as a fixed set of shard files
in a REPRODUCIBLE pseudo-random order (so any worker can re-derive the
exact batch stream from the shard id + seed alone). Three properties
drive the design, all enforced here:

* **Determinism without state** — order and membership derive from a
  seeded hash of the stable document id, never from ``rand()`` (which
  re-draws on stage retry) or ``monotonically_increasing_id`` (which
  depends on partition layout). Re-running the job bit-reproduces the
  export.
* **No global sort** — a full ``orderBy(shuffle_key)`` is a range
  shuffle over the whole corpus. Sharding first (hash-partition on the
  shard id) and sorting WITHIN each shard gives the same training-time
  stream semantics for 1/num_shards of the sort cost per task, and the
  shard count — not the corpus size — sets the parallelism.
* **Sampling is a filter, not a join** — membership is
  ``hash(seed|id) mod D < fraction*D``: pushed to the scan, zero
  shuffles, and composable (a 10% sample of a 50% sample is a
  deterministic 5% sample when the salts differ).

The hash is the portable :func:`~lshrs_spark.functions.text.h48` so the
DuckDB oracle replays membership, shard, and order bit-for-bit; swap
``base_hash='xxhash64'`` for the JVM-native production path (same
rationale as :func:`~lshrs_spark.operators.dedup._base_hash`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h48

__all__ = ["shuffle_key_col", "hash_sample", "shuffle_shards",
           "write_training_shards"]

_DENOM = 1_000_000


def _keyed_hash(id_col: Column, salt: str, seed: int,
                base_hash: str = "h48") -> Column:
    tagged = F.concat(F.lit(f"{salt}{seed}|"), id_col.cast("string"))
    if base_hash == "h48":
        return h48(tagged)
    if base_hash == "xxhash64":
        return F.abs(F.xxhash64(tagged))
    raise ValueError(f"base_hash must be 'h48' or 'xxhash64', got {base_hash!r}")


def shuffle_key_col(id_col: Column, seed: int = 42,
                    base_hash: str = "h48") -> Column:
    """The deterministic pseudo-random order key for ``id_col``."""
    return _keyed_hash(id_col, "shuffle", seed, base_hash)


def hash_sample(
    df: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
    *,
    salt: str = "sample",
    base_hash: str = "h48",
) -> DataFrame:
    """Deterministic ``fraction``-sample by hash threshold. Unlike
    ``DataFrame.sample`` this is stable across retries, partitionings
    and Spark versions, and the SAME rows are selected no matter how
    the input is repartitioned — the property a resumable multi-stage
    pipeline needs."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    keep = (
        _keyed_hash(F.col(id_col), salt, seed, base_hash) % _DENOM
        < int(fraction * _DENOM)
    )
    return df.where(keep)


def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    seed: int = 42,
    id_col: str = "doc_id",
    *,
    base_hash: str = "h48",
) -> DataFrame:
    """``(id, shard, pos)``: deterministic shard assignment (hash mod
    ``num_shards``) plus the document's position within its shard in
    seeded pseudo-random order. The window partitions by ``shard`` —
    per-task state is one shard, so scale by raising ``num_shards``
    with the corpus (shards of ~100k docs each), never by sorting the
    whole corpus on one key."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    key = shuffle_key_col(F.col(id_col), seed, base_hash)
    keyed = df.select(
        F.col(id_col).cast("long").alias("id"),
        (key % num_shards).cast("long").alias("shard"),
        key.alias("_hkey"),
    )
    w = Window.partitionBy("shard").orderBy("_hkey", "id")
    return keyed.select(
        "id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    seed: int = 42,
    id_col: str = "doc_id",
    *,
    base_hash: str = "xxhash64",
) -> None:
    """Materialize the export: one parquet directory partitioned by
    ``shard``, rows inside each file in seeded shuffle order. The plan
    is hash-repartition on ``shard`` (one exchange, num_shards-way) +
    ``sortWithinPartitions`` (no global range sort) + partitioned
    write — the layout a data loader streams sequentially."""
    key = shuffle_key_col(F.col(id_col), seed, base_hash)
    out = (
        df.withColumn("shard", (key % num_shards).cast("long"))
        .withColumn("_hkey", key)
        .repartition(num_shards, "shard")
        # shard leads the sort so the partitioned-file writer's required
        # ordering (partition columns first) is already satisfied — it
        # reuses this sort instead of inserting its own, which would
        # not preserve the shuffle order within each shard
        .sortWithinPartitions("shard", "_hkey", id_col)
        .drop("_hkey")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
