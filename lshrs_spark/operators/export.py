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
           "write_training_shards", "zorder_key_col", "write_clustered",
           "negative_samples", "weighted_sample", "write_webdataset"]

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


# --------------------------------------------------------------------- #
# Clustered storage layout — data skipping for the at-rest corpus.
# --------------------------------------------------------------------- #

def zorder_key_col(
    cols: list[tuple[Column, Column, Column]], bits: int = 16
) -> Column:
    """Z-order (Morton) key from ``(col, min, max)`` triples: each
    column linearly bucketed to ``bits`` bits against its [min, max]
    envelope, then bit-interleaved. Rows close in every clustered
    dimension land close in key order, so range-partitioning by this
    key gives parquet files narrow min/max envelopes in ALL the
    clustered columns at once — multi-column data skipping from plain
    parquet stats, no table format needed. Linear (not rank) bucketing
    keeps the key a pure Catalyst expression of (value, min, max); pass
    aggregated mins/maxes (one tiny agg job) or known domain bounds."""
    if not cols:
        raise ValueError("zorder_key_col needs at least one column")
    n = len(cols)
    scale = (1 << bits) - 1
    interleaved = F.lit(0).cast("long")
    for ci, (c, lo, hi) in enumerate(cols):
        span = (hi.cast("double") - lo.cast("double"))
        frac = F.when(span > 0, (c.cast("double") - lo.cast("double")) / span) \
            .otherwise(F.lit(0.0))
        bucket = F.least(
            F.lit(scale), F.greatest(F.lit(0), F.floor(frac * scale))
        ).cast("long")
        # spread bucket bit b of column ci to interleaved bit b*n + ci
        for b in range(bits):
            interleaved = interleaved.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * n + ci,
                )
            )
    return interleaved


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int = 32,
    zorder: bool = False,
    zorder_bits: int = 8,
) -> None:
    """Lay the corpus out for scan pruning: range-partition into
    ``num_files`` files on the cluster columns (or their z-order key)
    and sort within each file. Every file then carries a NARROW min/max
    envelope on the leading cluster column (disjoint ranges, guaranteed
    by ``repartitionByRange``) — a filtered read skips whole files from
    footer stats alone, which is what keeps a point/range query on a
    100 TB at-rest corpus from scanning 100 TB. With ``zorder=True``
    the key is the Morton interleave of ALL cluster columns, trading a
    little per-column tightness for multi-dimension skipping."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    if zorder:
        bounds = df.agg(
            *[f(c).alias(f"{f.__name__}_{c}")
              for c in cluster_cols for f in (F.min, F.max)]
        ).first()
        key = zorder_key_col(
            [
                (F.col(c), F.lit(bounds[f"min_{c}"]), F.lit(bounds[f"max_{c}"]))
                for c in cluster_cols
            ],
            bits=zorder_bits,
        )
        out = (
            df.withColumn("_zkey", key)
            .repartitionByRange(num_files, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
    else:
        out = df.repartitionByRange(
            num_files, *cluster_cols
        ).sortWithinPartitions(*cluster_cols)
    out.write.mode("overwrite").parquet(path)


def write_webdataset(
    df: DataFrame,
    path: str,
    num_shards: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    ext: str = "txt",
) -> DataFrame:
    """WebDataset-style export: ``num_shards`` tar files, each holding
    its shard's documents as ``{pos:09d}.{id}.{ext}`` members in seeded
    shuffle order — the sequential-read training-delivery format (a
    loader streams one tar per worker; no random I/O, no parquet
    decoder on the hot path).

    Determinism end-to-end: shard membership and member order come from
    :func:`shuffle_shards` (seeded hash, no ``rand()``), and tar
    metadata (mtime/uid/gid/mode) is pinned, so re-running the export
    produces BYTE-IDENTICAL shards — a corpus release can be content-
    hashed and diffed. Each tar is written to a temp name and renamed,
    so a crashed export never leaves a half-written shard visible.

    Scale shape: one exchange keyed by shard (the groupBy), then each
    task serializes exactly one tar; parallelism = ``num_shards``, so
    scale shard count with the corpus (~1-10k docs per shard keeps tar
    sizes loader-friendly). ``path`` must be a filesystem every
    executor can reach (local/NFS/fuse mount); returns the manifest
    ``(shard, n_members, total_bytes)``.
    """
    import os

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    os.makedirs(path, exist_ok=True)
    ordered = shuffle_shards(df, num_shards, seed, id_col).join(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(text_col).alias("_payload"),
        ),
        "id",
    )

    out_dir = str(path)
    ext_name = str(ext)

    def _write_shard(pdf):
        # self-contained (worker cannot import lshrs_spark): only str
        # params and stdlib captured
        import io
        import os as _os
        import tarfile

        import pandas as _pd

        pdf = pdf.sort_values(["pos", "id"])
        shard = int(pdf["shard"].iloc[0])
        buf = io.BytesIO()
        total = 0
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for _, row in pdf.iterrows():
                data = str(row["_payload"]).encode("utf-8")
                info = tarfile.TarInfo(
                    name=f"{int(row['pos']):09d}.{int(row['id'])}.{ext_name}"
                )
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
                total += len(data)
        final = _os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = final + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        _os.replace(tmp, final)
        return _pd.DataFrame(
            {
                "shard": [shard],
                "n_members": [len(pdf)],
                "total_bytes": [total],
            }
        )

    return ordered.groupBy("shard").applyInPandas(
        _write_shard, schema="shard long, n_members long, total_bytes long"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-``k`` by
    weight-biased priority): the Efraimidis–Spirakis exponential-key
    scheme, ``key = ln(u) / w`` with ``u`` a seeded-hash uniform in
    (0, 1] — each item's inclusion probability is proportional to its
    weight, and the whole draw replays bit-for-bit from (seed, id)
    alone (no ``rand()``, stable under stage retry and repartitioning).

    Scale shape: the key is a per-row projection (zero shuffles) and the
    cut is ``TakeOrderedAndProject`` — per-partition k-row heaps merged
    on the driver, never a global sort. That IS the distributed weighted
    reservoir: each partition keeps its local top-k candidates, the
    merge is k*num_partitions rows.

    Returns ``(id, weight, key)`` for the k selected rows, key
    descending. Weights must be positive; ties impossible (distinct ids
    give distinct 48-bit hashes with overwhelming probability, and
    doc-id is the final tiebreak).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    u = (
        h48(F.concat(F.lit(f"ws{seed}|"), F.col(id_col).cast("string")))
        + F.lit(1.0)
    ) / F.lit(float(1 << 48))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(k)
    )


def negative_samples(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """``k`` deterministic pseudo-random negatives per anchor —
    contrastive-training pairs without ``rand()`` (stable under stage
    retry) and without any all-pairs join. Each (anchor, slot) hashes
    to a candidate ordinal in ``[1, n]\\{anchor's ordinal}`` (the
    classic skip-self shift keeps the draw uniform), and the ordinal
    resolves to a document through the two-stage distributed ordinal —
    no single-partition window anywhere. Sampling is with replacement
    ACROSS slots (two slots may draw the same negative) and exclusive
    of the anchor itself. Returns ``(anchor_id, neg_rank, negative_id)``.
    """
    from ..cache import release_slots  # noqa: F401  (documented below)
    from .prefix import running_total

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    n = df.count()
    if n < 2:
        raise ValueError("need at least 2 rows to draw negatives")
    # 1-based distributed ordinal over the stable id order; the persist
    # slot it creates is freed by cache.release_slots()
    ords = running_total(
        df.select(F.col(id_col)).withColumn("_one", F.lit(1)),
        id_col, "_one", out_col="_ord",
    ).select(F.col(id_col), F.col("_ord"))
    anchors = ords.select(
        F.col(id_col).alias("anchor_id"), F.col("_ord").alias("_aord")
    ).withColumn("neg_rank", F.explode(F.array(*[F.lit(j) for j in range(k)])))
    draw = h48(
        F.concat(
            F.lit(f"neg{seed}|"),
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("neg_rank").cast("string"),
        )
    ) % (n - 1) + 1  # uniform in [1, n-1]
    picked = anchors.withColumn(
        "_cord",
        F.when(draw >= F.col("_aord"), draw + 1).otherwise(draw),
    )
    negs = ords.select(
        F.col(id_col).alias("negative_id"), F.col("_ord").alias("_cord")
    )
    return picked.join(negs, "_cord").select(
        F.col("anchor_id").cast("long"),
        F.col("neg_rank").cast("long"),
        F.col("negative_id").cast("long"),
    )
