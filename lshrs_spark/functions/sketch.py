"""Distinct-count sketching — K-Minimum-Values (KMV) estimator.

The reference has no approximate sketches (SURVEY.md §2.6; its LSH
signatures are the only sketch in the tree). Spark's built-in
``approx_count_distinct`` (HyperLogLog++) is the right default in
production, but its register merges are engine-specific, so a DuckDB
oracle cannot recompute it. KMV is the *deterministic* alternative: with
a shared portable hash, the k smallest distinct hash values — and hence
the estimate ``(k-1) / r_k`` with ``r_k`` the k-th smallest normalized
hash — are identical in any engine, which makes the sketch itself
oracle-checkable (``entries.sketch_distinct_users``).

Scale shape: a ``distinct`` shuffle on ``(groups, hash)`` followed by a
windowed top-k (Spark executes the rank filter with WindowGroupLimit
pushdown — partial top-k before the shuffle), then a tiny per-group
aggregate. No unbounded ``collect_set`` state anywhere, so a group with
billions of distinct members costs the same memory as a small one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct", "KMV_HASH_SPACE", "bloom_build", "bloom_probe",
    "bloom_prefilter_join", "cms_build", "cms_query", "heavy_hitters",
]

# functions.text.h48 hashes into [0, 2^48)
KMV_HASH_SPACE = float(1 << 48)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    hash_col,
    *,
    k: int = 64,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group KMV distinct-count estimate from a 48-bit hash column
    expression. Exact below ``k`` distinct values; relative error
    ~ ``1/sqrt(k-2)`` above. Returns ``(*group_cols, out_col)``.

    ``floor`` (not ``round``) finalizes the estimate so engines with
    different rounding modes agree bit-for-bit.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    group_cols = list(group_cols)
    d = df.select(*group_cols, hash_col.alias("_hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_hv"))
    kept = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.max("_hv").alias("_rk")
    )
    est = (
        F.when(F.col("_n") < k, F.col("_n"))
        .otherwise(F.floor(F.lit((k - 1) * KMV_HASH_SPACE) / F.col("_rk")))
        .cast("long")
    )
    return agg.select(*group_cols, est.alias(out_col))


# --------------------------------------------------------------------- #
# Bloom filter — set membership for pipeline hygiene (seen-URL /
# seen-document probes) as a DataFrame-native sketch.
# --------------------------------------------------------------------- #

def _bloom_positions(value_col, m_bits: int, num_hashes: int):
    """k deterministic bit positions for a value: ``h48('bloom{i}|' ||
    value) % m_bits`` — portable, so any engine can rebuild the exact
    same filter."""
    from .text import h48

    return F.array(*[
        (h48(F.concat(F.lit(f"bloom{i}|"), value_col.cast("string")))
         % m_bits).cast("long")
        for i in range(num_hashes)
    ])


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Build a Bloom filter distributedly: ``(word, bits)`` — the
    filter's NON-ZERO 64-bit words. Each value contributes
    ``num_hashes`` bit positions; positions aggregate into words with
    ``bit_or`` (map-side partial aggregation applies, so the shuffle
    carries at most ``m_bits/64`` rows per partition regardless of
    corpus size). The sparse word table IS the sketch — union two of
    them and re-``bit_or`` to merge filters; at ``m_bits = 2^33``
    (1 GiB, ~600M values at 1% FP with k=3) the full table is ~134M
    rows and still a fraction of one executor's memory when densified
    driver-side."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = df.select(
        F.explode(
            _bloom_positions(F.col(value_col), m_bits, num_hashes)
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    bloom_words: DataFrame,
    candidates: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
    *,
    out_col: str = "member",
) -> DataFrame:
    """Membership probe: candidates gain ``out_col`` (true = possibly
    present, with the filter's FP rate; false = DEFINITELY absent —
    the guarantee pipeline dedup relies on). Each DISTINCT candidate
    value explodes to its k positions, equi-joins the word table, and
    is a member iff every position's bit is set; verdicts join back to
    the candidate rows BY VALUE. The value is the only correlation key
    anywhere — no positional ids, so a partial stage recompute (fetch
    failure) can never mispair the two sides, and duplicate candidate
    values probe once. The word table is the small side — left to AQE
    to broadcast when it fits."""
    vals = candidates.select(value_col).distinct()
    pos = vals.select(
        value_col,
        F.explode(
            _bloom_positions(F.col(value_col), m_bits, num_hashes)
        ).alias("p"),
    ).select(
        value_col,
        (F.col("p") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
    )
    hits = pos.join(bloom_words, "word", "left").select(
        value_col,
        (F.col("bits").isNotNull()
         & (F.col("bits").bitwiseAND(F.col("m")) != 0)).alias("_hit"),
    )
    verdict = hits.groupBy(value_col).agg(F.bool_and("_hit").alias(out_col))
    return candidates.join(verdict, value_col)


# --------------------------------------------------------------------- #
# Count-Min sketch — approximate frequencies with a hard upper-bound
# guarantee (est >= true, overestimate bounded by n/width per row).
# --------------------------------------------------------------------- #

def _cms_positions(value_col, width: int, depth: int):
    """``depth`` deterministic (row, bucket) cells for a value:
    ``bucket_i = h48('cms{i}|' || value) % width`` — portable, so any
    engine rebuilds the identical sketch."""
    from .text import h48

    return F.array(*[
        F.struct(
            F.lit(i).alias("r"),
            (h48(F.concat(F.lit(f"cms{i}|"), value_col.cast("string")))
             % width).cast("long").alias("b"),
        )
        for i in range(depth)
    ])


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 1 << 16,
    depth: int = 4,
    *,
    weight_col=None,
) -> DataFrame:
    """Build a Count-Min sketch distributedly: ``(r, b, c)`` — the
    sketch's NON-ZERO cells. Each value increments one bucket per hash
    row; cells aggregate with a plain sum (map-side partial agg, so the
    shuffle carries at most ``depth * width`` rows per partition no
    matter how many input rows). The sparse cell table IS the sketch:
    union two and re-sum to merge — the mergeability that lets per-day
    or per-shard sketches roll up without touching raw data. At
    ``width = 2^20, depth = 4`` the dense table is 4M cells (~100 MB) —
    trivially broadcastable — while counting an unbounded stream."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cell = df.select(
        F.explode(_cms_positions(F.col(value_col), width, depth)).alias("_c"),
        w.alias("_w"),
    )
    return (
        cell.select(F.col("_c.r").alias("r"), F.col("_c.b").alias("b"), "_w")
        .groupBy("r", "b")
        .agg(F.sum("_w").alias("c"))
    )


def cms_query(
    cms_cells: DataFrame,
    candidates: DataFrame,
    value_col: str,
    width: int = 1 << 16,
    depth: int = 4,
    *,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch: candidates gain ``out_col`` = the
    minimum over their ``depth`` cells (a missing cell reads 0). The
    estimate never undercounts; it overcounts by at most the hash
    collisions in the lightest row. Estimates compute per DISTINCT
    value and join back by value — the same no-positional-ids rule as
    :func:`bloom_probe` (deterministic under stage recompute). Cell
    table is the small side — AQE broadcasts it when it fits."""
    vals = candidates.select(value_col).distinct()
    pos = vals.select(
        value_col,
        F.explode(
            _cms_positions(F.col(value_col), width, depth)
        ).alias("_c"),
    ).select(value_col, F.col("_c.r").alias("r"), F.col("_c.b").alias("b"))
    reads = pos.join(cms_cells, ["r", "b"], "left").select(
        value_col, F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("_v")
    )
    est = reads.groupBy(value_col).agg(F.min("_v").alias(out_col))
    return candidates.join(est, value_col)


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Join with an explicit Bloom runtime filter: the small side's
    join keys build a Bloom word table, the big side is probed and rows
    that DEFINITELY have no partner (filter guarantee) are dropped
    BEFORE the join shuffle. With a selective small side this turns a
    100 TB shuffle into a shuffle of just the matching sliver — the
    explicit, tunable version of the engine's own runtime bloom
    pushdown, for when you need to control ``m_bits``/FP rate or the
    join is one AQE will not inject a filter into. False positives only
    add rows that the join itself then rejects — the result is
    bit-identical to the plain join. Only match-REQUIRING join types
    are allowed: an outer join through the prefilter would drop the
    very unmatched rows it is supposed to keep."""
    if how not in ("inner", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi joins, "
            f"got {how!r} — an outer join would lose pruned rows"
        )
    words = bloom_build(small.select(on), on, m_bits, num_hashes)
    probed = bloom_probe(words, big, on, m_bits, num_hashes,
                         out_col="_bloom_hit")
    pruned = probed.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    return pruned.join(small, on, how)


# --------------------------------------------------------------------- #
# Exact heavy hitters — pigeonhole candidate prune + exact verify.
# --------------------------------------------------------------------- #

def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    *,
    out_col: str = "n",
    max_tracked: int = 1 << 22,
) -> DataFrame:
    """EXACT set of values with global count >= ``threshold``, without
    ever shuffling the full value stream.

    Two passes:

    1. *Pigeonhole prune*, zero shuffle: each partition counts its own
       values natively in Arrow (``mapInArrow`` +
       ``pyarrow.compute.value_counts``) and emits only those
       with local count >= ``ceil(threshold / num_partitions)``. If a
       value's global count >= threshold, its max partition count is >=
       its average ``threshold/P``, so it MUST survive in at least one
       partition — no false negatives, ever. Values spread thinly
       (the long tail — the overwhelming majority of a 100 TB token
       stream) die here, in the map stage. Per-partition state is
       BOUNDED: when the tracked table exceeds ``max_tracked`` keys, a
       batch Misra-Gries step subtracts the overflow quantile from all
       counts and drops the non-positive — the classic undercount-only
       summary, so the emit threshold is lowered by the total amount
       subtracted and the no-false-negative guarantee survives the
       prune (a few extra candidates just flow into pass 2).
    2. *Exact verify*: semi-join the stream against the (small)
       candidate set, then one count aggregation with the usual
       map-side combine. Only candidate occurrences reach the shuffle.

    The result is bit-identical to ``GROUP BY ... HAVING count(*) >=
    threshold`` — the prune is an optimization, not an approximation.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1 (got {threshold})")
    if max_tracked < 1:
        raise ValueError(f"max_tracked must be >= 1 (got {max_tracked})")
    values = df.select(value_col)
    num_parts = max(1, values.rdd.getNumPartitions())
    local_min = max(1, -(-threshold // num_parts))  # ceil
    vc = value_col
    schema = values.schema
    cap = max_tracked

    def local_candidates(batches):
        # r15 (guide §4.2): pass 1 counts inside Arrow — the previous
        # mapInPandas shape materialized EVERY value occurrence as a
        # Python object (Arrow -> pandas object column) just to run
        # value_counts; pc.value_counts hash-aggregates the native
        # Arrow buffers and only the per-batch DISTINCT set crosses
        # into Python for the running merge. Candidate semantics are
        # unchanged: nulls are dropped (pandas dropna parity) and
        # floating NaN is dropped explicitly (pandas value_counts
        # treated NaN as missing; Spark's join would MATCH NaN keys,
        # so letting NaN become a candidate could surface rows the
        # old plan never emitted).
        import pyarrow as pa
        import pyarrow.compute as pc

        counts: dict = {}
        slack = 0  # total Misra-Gries undercount applied so far
        out_type = None
        for batch in batches:
            col = batch.column(0)
            if out_type is None:
                out_type = batch.schema.field(0).type
            if col.null_count:
                col = col.drop_null()
            if pa.types.is_floating(col.type) and len(col):
                col = col.filter(pc.invert(pc.is_nan(col)))
            if not len(col):
                continue
            vcnt = pc.value_counts(col)
            for v, c in zip(vcnt.field("values").to_pylist(),
                            vcnt.field("counts").to_pylist()):
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > cap:
                # batch MG step: subtract the k-th smallest count so at
                # most cap survive; every surviving count is undercounted
                # by exactly `sub`, every dropped value by at most `sub`
                vals = sorted(counts.values())
                sub = vals[len(vals) - cap]
                counts = {v: c - sub for v, c in counts.items() if c > sub}
                slack += sub
                if slack >= local_min:
                    # a value dropped by MG could have a true local
                    # count in [local_min, slack] — emitting only the
                    # tracked table would silently lose it. Exactness
                    # is the contract: refuse, don't approximate.
                    raise ValueError(
                        "heavy_hitters: max_tracked too small for this "
                        f"threshold/partition size (MG slack {slack} >= "
                        f"local threshold {local_min}) — raise "
                        "max_tracked, raise threshold, or repartition "
                        "into smaller partitions"
                    )
        if out_type is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array(
                    [v for v, c in counts.items()
                     if c >= local_min - slack],
                    type=out_type,
                )],
                names=[vc],
            )

    cand = values.mapInArrow(local_candidates, schema=schema).distinct()
    return (
        values.join(cand, vc, "left_semi")
        .groupBy(vc)
        .agg(F.count(F.lit(1)).alias(out_col))
        .filter(F.col(out_col) >= threshold)
    )
