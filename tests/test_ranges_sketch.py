"""interval_join (bucketized range join) and KMV distinct sketch."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lshrs_spark.functions.sketch import kmv_distinct
from lshrs_spark.functions.text import h48
from lshrs_spark.operators.ranges import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def sides(spark, rng):
    pts = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 5)), _ts(float(rng.uniform(0, 5000))))
         for i in range(300)],
        "pid long, k long, ts timestamp",
    )
    ivs = []
    for j in range(60):
        start = float(rng.uniform(0, 5000))
        ivs.append(
            (int(j), int(rng.integers(0, 5)), _ts(start),
             _ts(start + float(rng.uniform(0, 900))))
        )
    # one empty and one inverted interval — must match nothing
    ivs.append((60, 1, _ts(100.0), _ts(100.0)))
    ivs.append((61, 2, _ts(200.0), _ts(50.0)))
    intervals = spark.createDataFrame(ivs, "iid long, k long, start timestamp, end timestamp")
    return pts, intervals


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def test_bucketized_matches_theta(sides):
    pts, ivs = sides
    naive = interval_join(pts, ivs, ["k"])  # theta-join reference plan
    for width in (60, 600, 3600):
        got = interval_join(pts, ivs, ["k"], bucket_seconds=width)
        assert _pairs(got) == _pairs(naive)


def test_no_duplicate_pairs(sides):
    pts, ivs = sides
    got = interval_join(pts, ivs, ["k"], bucket_seconds=60)
    pairs = _pairs(got)
    assert len(pairs) == len(set(pairs))


def test_end_exclusive(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0.0)), (2, _ts(10.0))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(1, _ts(0.0), _ts(10.0))], "iid long, start timestamp, end timestamp"
    )
    got = interval_join(pts, ivs, [], bucket_seconds=10)
    assert _pairs(got) == [(1, 1)]  # start inclusive, end exclusive


def test_column_collision_rejected(sides):
    pts, ivs = sides
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, ivs.withColumnRenamed("iid", "pid"), ["k"])


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "v long")
    out = kmv_distinct(
        df.withColumn("g", F.lit("a")), ["g"], h48(F.col("v").cast("string")), k=64
    ).collect()
    assert out[0].approx_distinct == 7


def test_kmv_estimate_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    out = kmv_distinct(
        df.withColumn("g", F.lit("a")), ["g"], h48(F.col("v").cast("string")), k=256
    ).collect()
    est = out[0].approx_distinct
    # rel err ~ 1/sqrt(k-2) ≈ 6%; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, [], h48(F.col("v").cast("string")), k=1)


def test_bloom_no_false_negatives_and_merge(spark):
    from lshrs_spark.functions.sketch import bloom_build, bloom_probe
    from pyspark.sql import functions as F

    a = spark.range(0, 100).select(F.col("id").alias("v"))
    b = spark.range(500, 560).select(F.col("id").alias("v"))
    wa, wb = bloom_build(a, "v", 1024, 3), bloom_build(b, "v", 1024, 3)
    # merge = union + re-bit_or
    merged = wa.union(wb).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    cand = spark.range(0, 600).select(F.col("id").alias("v"))
    got = {r.v: r.member for r in
           bloom_probe(merged, cand, "v", 1024, 3).collect()}
    # zero false negatives — every inserted value reports member
    assert all(got[v] for v in range(0, 100))
    assert all(got[v] for v in range(500, 560))
    # absent values are mostly rejected (FP rate small but nonzero)
    absent = [v for v in range(100, 500)]
    fp = sum(got[v] for v in absent) / len(absent)
    assert fp < 0.2


def test_bloom_build_validates_m_bits(spark):
    from lshrs_spark.functions.sketch import bloom_build
    import pytest as _pt

    df = spark.range(3).withColumnRenamed("id", "v")
    with _pt.raises(ValueError):
        bloom_build(df, "v", 1000, 3)


def test_cms_never_undercounts_and_exact_when_wide(spark):
    from lshrs_spark.functions.sketch import cms_build, cms_query

    rows = [("a",)] * 50 + [("b",)] * 7 + [(f"x{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, ["v"])
    exact = {r.v: r.n for r in
             df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    cand = df.select("v").distinct()
    # tiny sketch: collisions certain, but est >= exact for EVERY key
    tight = cms_query(cms_build(df, "v", 16, 3), cand, "v", 16, 3)
    for r in tight.collect():
        assert r.est_count >= exact[r.v]
    # wide sketch: no collisions at this cardinality -> exact counts
    wide = cms_query(cms_build(df, "v", 1 << 14, 4), cand, "v", 1 << 14, 4)
    for r in wide.collect():
        assert r.est_count == exact[r.v]


def test_cms_merge_is_union_resum(spark):
    from lshrs_spark.functions.sketch import cms_build

    a = spark.range(0, 200).select((F.col("id") % 13).cast("string").alias("v"))
    b = spark.range(0, 100).select((F.col("id") % 7).cast("string").alias("v"))
    whole = cms_build(a.union(b), "v", 64, 3)
    merged = (
        cms_build(a, "v", 64, 3).union(cms_build(b, "v", 64, 3))
        .groupBy("r", "b").agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_cms_weighted_counts(spark):
    from lshrs_spark.functions.sketch import cms_build, cms_query

    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 10)], ["v", "w"])
    cells = cms_build(df, "v", 1 << 12, 3, weight_col="w")
    got = {r.v: r.est_count for r in
           cms_query(cells, df.select("v").distinct(), "v", 1 << 12, 3).collect()}
    assert got == {"a": 7, "b": 10}


def test_heavy_hitters_exact_and_partition_independent(spark):
    from lshrs_spark.functions.sketch import heavy_hitters

    rows = [("hot",)] * 40 + [("warm",)] * 10 + [(f"t{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, ["v"])
    for parts in (1, 7):
        got = {r.v: r.n for r in
               heavy_hitters(df.repartition(parts), "v", 10).collect()}
        assert got == {"hot": 40, "warm": 10}
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", 0)


def test_cms_and_heavy_hitters_empty_input(spark):
    from lshrs_spark.functions.sketch import cms_build, cms_query, heavy_hitters

    empty = spark.createDataFrame([], "v string")
    cells = cms_build(empty, "v", 64, 3)
    assert cells.count() == 0
    cand = spark.createDataFrame([("x",)], ["v"])
    got = cms_query(cells, cand, "v", 64, 3).collect()
    assert [r.est_count for r in got] == [0]
    assert heavy_hitters(empty, "v", 5).count() == 0


def test_bloom_prefilter_join_equals_plain_join(spark):
    from lshrs_spark.functions.sketch import bloom_prefilter_join

    big = spark.range(0, 2000).select((F.col("id") % 500).alias("k"),
                                      F.col("id").alias("payload"))
    small = spark.createDataFrame([(3,), (499,), (7,)], ["k"])
    got = bloom_prefilter_join(big, small, "k", m_bits=1024)
    want = big.join(small, "k")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # outer variants keep the guarantee too
    got_l = bloom_prefilter_join(big, small, "k", m_bits=1024, how="left_semi")
    assert got_l.count() == big.join(small, "k", "left_semi").count()


def test_bloom_prefilter_join_rejects_outer(spark):
    from lshrs_spark.functions.sketch import bloom_prefilter_join

    big = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="outer"):
        bloom_prefilter_join(big, big, "k", how="left")


def test_heavy_hitters_bounded_tracking_stays_exact(spark):
    """With a tiny max_tracked the Misra-Gries prune kicks in on every
    batch — the result must STILL equal the plain GROUP BY/HAVING."""
    from lshrs_spark.functions.sketch import heavy_hitters

    rows = [("hot",)] * 60 + [("warm",)] * 25 + \
        [(f"tail{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, ["v"]).repartition(3)
    got = {r.v: r.n for r in
           heavy_hitters(df, "v", 20, max_tracked=8).collect()}
    assert got == {"hot": 60, "warm": 25}
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", 5, max_tracked=0)


def test_heavy_hitters_refuses_unsound_prune(spark):
    """When MG slack would reach the local threshold, dropped values
    could have qualified — the operator must refuse, not approximate."""
    from pyspark.sql import functions as F2

    from lshrs_spark.functions.sketch import heavy_hitters

    # one partition, low threshold, huge tail with repeated evictions
    df = spark.range(0, 3000).select(
        (F2.col("id") % 1500).cast("string").alias("v")
    ).coalesce(1)
    with pytest.raises(Exception, match="max_tracked too small"):
        heavy_hitters(df, "v", 2, max_tracked=4).collect()
