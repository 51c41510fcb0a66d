"""LSH index build: vectors -> exploded ``(band, sig, id)`` bucket table.

Replaces the reference's Redis bucket store (``/root/reference/lshrs/
storage/redis.py:40-280``: one Redis SET per ``(band, signature)``) with a
plain DataFrame/Parquet table whose hash-partitioned layout *is* the
bucket structure. The write buffer / pipeline machinery of the reference
(``lshrs/core/main.py:242-244,413-440``) has no Spark analogue on purpose:
distributed batched writes subsume it (SURVEY.md §2 S4, M4).

Scale notes (100 TB design):
* the index is ``num_bands ×`` the input row count but only 3 narrow
  columns — parquet dictionary+RLE encodes ``band`` and ``sig`` compactly;
* writes are ``repartition(band, sig)``-ed so each output file covers a
  contiguous bucket range -> probe joins read few files per bucket;
* ``partitionBy("band")`` on disk enables band-pruned scans for the
  per-band self-join used by similarity joins.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LSHConfig
from ..functions.vector import l2_norm
from ..hashing import with_signatures

__all__ = ["validate_vectors", "build_index", "write_index",
           "write_index_table", "read_index", "lsh_balance_report"]


def validate_vectors(
    df: DataFrame,
    cfg: LSHConfig,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    *,
    mode: str = "error",
) -> DataFrame:
    """Enforce the reference ingest contract (``lshrs/core/main.py:391-399,
    1076-1086``): non-negative integer ids, exact dimensionality, no zero
    vectors. ``mode="error"`` raises on first violation (reference
    behavior); ``mode="filter"`` drops bad rows (pipeline behavior)."""
    id_ = F.col(id_col)
    vec = F.col(vector_col)
    bad_id = id_.isNull() | (id_ < 0)
    bad_dim = vec.isNull() | (F.size(vec) != cfg.dim)
    bad_zero = l2_norm(vec) <= 0
    if mode == "filter":
        return df.filter(~bad_id & ~bad_dim & ~bad_zero)
    checked = (
        F.when(bad_id, F.raise_error(F.lit("Vector index must be non-negative")))
        .when(bad_dim, F.raise_error(
            F.lit(f"Vector dimension mismatch: expected {cfg.dim}")))
        .when(bad_zero, F.raise_error(F.lit("Cannot index a zero vector")))
        .otherwise(id_)
    )
    return df.withColumn(id_col, checked)


def build_index(
    df: DataFrame,
    cfg: LSHConfig,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    *,
    sig_kind: Optional[str] = None,
    validate: bool = False,
    multiprobe: int = 0,
) -> DataFrame:
    """``(id, vector)`` -> ``(band int, sig bigint|binary, id long)``.

    One narrow shuffle-free map: signature pandas_udf then ``posexplode``
    (the reference's per-band fan-out loop, ``lshrs/core/main.py:1113-1129``,
    as a Catalyst Generate node).

    ``multiprobe=T`` (query sides only — never persist perturbed keys
    into a data index) emits ``(1+T) * num_bands`` key rows per vector:
    the exact band signatures plus each band's T closest-margin bit-flip
    perturbations, computed inside the same Arrow UDF pass. The array
    layout is band-major per tier, so band = pos % num_bands.
    """
    if validate:
        df = validate_vectors(df, cfg, id_col, vector_col)
    sigs = with_signatures(df, cfg, vector_col, "sigs", sig_kind=sig_kind,
                           multiprobe=multiprobe)
    # posexplode_outer, not posexplode: the non-outer Generate adds a
    # size(sigs)>0 pre-filter that makes Catalyst evaluate the signature
    # pandas_udf TWICE (once in the filter, once in the project). The UDF
    # always returns exactly num_bands entries, so outer semantics are
    # identical — and the matmul runs once.
    exploded = sigs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode_outer("sigs").alias("pos", "sig"),
    )
    return exploded.select(
        (F.col("pos") % cfg.num_bands).cast("int").alias("band"),
        "sig", "id",
    )


def write_index(
    index_df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by_band: bool = True,
    bucket_partitions: Optional[int] = None,
    bloom_filter: bool = False,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Persist the bucket table in a probe-optimal layout: range-partition
    + sort by ``(band, sig)`` so every file covers a contiguous signature
    range. Parquet min/max row-group stats then let a probe with pushed
    ``(band, sig)`` predicates skip almost every file — this layout is
    what makes single-query latency independent of index size (the Redis
    keyspace lookup of the reference, re-expressed as storage pruning).

    ``bloom_filter=True`` additionally writes a parquet column Bloom
    filter on ``sig`` (sized for ``bloom_ndv`` distinct values per row
    group). Min/max stats only prune row groups whose RANGE excludes the
    probe key; a Bloom filter skips row groups whose range covers the
    key but which don't CONTAIN it — the case that dominates in
    unsorted/appended layouts (per-micro-batch streaming appends before
    :func:`compact_index` restores the sorted layout) and in sorted
    files holding sparse high-cardinality ranges. Costs ~1 byte/value
    of extra footer payload; readers that ignore Bloom filters are
    unaffected."""
    n = bucket_partitions or int(
        index_df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = index_df.repartitionByRange(n, "band", "sig").sortWithinPartitions(
        "band", "sig"
    )
    writer = out.write.mode(mode)
    if bloom_filter:
        writer = writer.option(
            "parquet.bloom.filter.enabled#sig", "true"
        ).option("parquet.bloom.filter.expected.ndv#sig", str(bloom_ndv))
    if partition_by_band:
        writer = writer.partitionBy("band")
    writer.parquet(path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("band", "sig", "id")


def write_index_table(
    index_df: DataFrame,
    table: str,
    *,
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist the bucket index as a Spark BUCKETED TABLE —
    ``bucketBy(num_buckets, band, sig)`` + in-bucket sort — the
    co-located-join layout for repeated heavy probes: a join whose keys
    are the bucketing keys reads the table's hash distribution straight
    off the files, so the INDEX side never exchanges again. A bucketed
    self-join (the similarity-join shape) plans with ZERO exchanges;
    an index ⋈ query-sigs probe in the shuffle regime exchanges ONLY
    the query side (both plan-asserted in ``tests/test_plans.py``).
    ``write_index``'s path layout optimizes single-probe pruned READS;
    this table layout optimizes repeated JOINs — a 100 TB deployment
    that re-probes the corpus nightly wants the bucketed form, paying
    the one-time bucket shuffle at write.

    Needs a metastore-backed table name (``saveAsTable``); bucket
    metadata lives in the catalog, which is why a plain
    ``parquet(path)`` write cannot carry it."""
    (
        index_df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, "band", "sig")
        .sortBy("band", "sig")
        .saveAsTable(table)
    )


def compact_index(
    spark: SparkSession, src_path: str, dest_path: str, **write_kw
) -> None:
    """Rewrite a streamed/appended index directory (arbitrary file
    layout, e.g. the per-micro-batch appends of
    ``streaming.ingest.stream_index_vectors``) into the probe-optimal
    sorted hive layout of :func:`write_index`. The periodic compaction
    step of a continuous-ingest deployment: serving stays correct on the
    raw appends and gets its row-group pruning back after each
    compaction."""
    write_index(read_index(spark, src_path), dest_path, **write_kw)


def lsh_balance_report(index_df: DataFrame, *, ratio: float = 4.0
                       ) -> DataFrame:
    """One-row health card for the ``(band, sig)`` bucket index — the
    LSH twin of :func:`~lshrs_spark.operators.knn.ivf_balance_report`
    on the shared :func:`~lshrs_spark.operators.skew.balance_stats`
    core: ``(n_rows, n_partitions, mean_rows, max_rows,
    max_mean_ratio, gini, n_hot)`` over per-BUCKET entry counts. The
    hot-bucket hazard is the reference's own documented risk
    (``/root/reference/README.md:216`` — its Redis SETs "simply
    grow"); a bucket holding a large fraction of the corpus makes
    every query landing in it pay a proportional candidate scan, and
    this is the one-row alert card a scheduler thresholds on
    (``n_hot > 0``, ``gini`` drift) without ever scanning ids.

    The bucket key is serialized as ``band:sig`` (hex for binary
    signatures) so the Gini rank's tie-break is a plain string order
    both engines share. Scale shape: one grouped count over the index
    plus a P-row aggregation — bounded by bucket cardinality, never
    corpus size."""
    from .skew import balance_stats

    sig_s = (
        F.hex(F.col("sig"))
        if dict(index_df.dtypes).get("sig") == "binary"
        else F.col("sig").cast("string")
    )
    counts = (
        index_df.groupBy(
            F.concat_ws(
                ":", F.col("band").cast("string"), sig_s
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return balance_stats(counts, key_col="bucket", ratio=ratio)
