"""Salted-aggregation semantics: bit-identical to the unsalted plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators.skew import salted_aggregate

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet")


def test_salted_equals_plain_groupby(events):
    salted = salted_aggregate(
        events,
        ["event_type"],
        [
            ("count", None, "n"),
            ("sum", "value", "sum_value"),
            ("min", "user_id", "min_user"),
            ("max", "user_id", "max_user"),
        ],
        num_salts=7,
    )
    plain = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
    s = {r.event_type: r for r in salted.collect()}
    p = {r.event_type: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k].n == p[k].n
        assert s[k].min_user == p[k].min_user
        assert s[k].max_user == p[k].max_user
        assert abs(s[k].sum_value - p[k].sum_value) < 1e-6 * abs(p[k].sum_value)


def test_salted_first_stage_bounds_group_size(events):
    """No (key, salt) partial group exceeds ~a salt's share of the hot
    key (the property that keeps one reducer from absorbing the key)."""
    n_salts = 8
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    per_salt = (
        events.select("event_type", salt.alias("s"))
        .groupBy("event_type", "s")
        .count()
    )
    hot = events.groupBy("event_type").count().collect()
    biggest = {r.event_type: r["count"] for r in hot}
    for r in per_salt.collect():
        assert r["count"] <= max(2 * biggest[r.event_type] / n_salts, 16)


def test_unsupported_kind_raises(events):
    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        salted_aggregate(events, ["event_type"], [("avg", "value", "a")])


def test_salted_join_matches_plain_join(spark):
    from lshrs_spark.operators.skew import salted_join

    rows = [(i, "hot" if i % 2 == 0 else f"k{i % 7}") for i in range(500)]
    left = spark.createDataFrame(rows, "id long, k string")
    right = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k3", 3.0), ("unused", 9.0)],
        "k string, w double",
    )
    plain = {(r.id, r.k, r.w) for r in left.join(right, "k").collect()}
    salted = {(r.id, r.k, r.w)
              for r in salted_join(left, right, ["k"], num_salts=8).collect()}
    assert salted == plain

    plain_l = sorted(
        (r.id, r.k, r.w) for r in left.join(right, "k", "left").collect()
    )
    salted_l = sorted(
        (r.id, r.k, r.w)
        for r in salted_join(left, right, ["k"], num_salts=8, how="left").collect()
    )
    assert salted_l == plain_l

    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, ["k"], how="full")


def test_skew_report_finds_hot_keys_and_salts(spark):
    from lshrs_spark.operators.skew import skew_report

    rows = [("hot", "a")] * 500 + [("warm", "b")] * 120 + \
        [(f"t{i}", "c") for i in range(50)]
    df = spark.createDataFrame(rows, ["k1", "k2"])
    got = {
        (r.k1, r.k2): (r.n, r.share_ppm, r.suggested_salts)
        for r in skew_report(
            df, ["k1", "k2"],
            hot_threshold_rows=100, target_group_rows=100,
        ).collect()
    }
    assert set(got) == {("hot", "a"), ("warm", "b")}
    n, ppm, salts = got[("hot", "a")]
    assert (n, salts) == (500, 5)
    assert ppm == 500 * 1_000_000 // 670
    assert got[("warm", "b")][2] == 2
    with pytest.raises(ValueError):
        skew_report(df, [])


def test_right_size_shuffle_floor_and_scale(spark):
    from pyspark.sql import functions as F

    from lshrs_spark.session import right_size_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    floor = spark.sparkContext.defaultParallelism
    # tiny input: recommendation floors at the cluster parallelism
    assert right_size_shuffle(docs, set_conf=False) == floor
    # blown-up plan estimate: the recommendation scales with bytes/target
    wide = docs.select(F.explode(F.split("text", " ")).alias("t"))
    for _ in range(3):
        wide = wide.union(wide)
    big = right_size_shuffle(wide, target_partition_mb=1, set_conf=False)
    assert big >= floor
    with pytest.raises(ValueError):
        right_size_shuffle(docs, target_partition_mb=0)


def test_balance_stats_gini_properties(spark):
    """The shared store-health Gini against an independent numpy
    reference: exact match on random count tables, 0 for perfectly
    balanced or single-key tables, near (P-1)/P under extreme skew,
    and invariant to relabeling the keys."""
    import numpy as np

    from lshrs_spark.operators.skew import balance_stats

    def np_gini(counts):
        x = np.sort(np.asarray(counts, dtype=np.float64))
        n = len(x)
        r = np.arange(1, n + 1)
        return float(((2 * r - n - 1) * x).sum() / (n * x.sum()))

    def card(pairs):
        df = spark.createDataFrame(pairs, "k long, n long")
        return balance_stats(df, key_col="k").collect()[0]

    rng = np.random.default_rng(113)
    for _ in range(3):
        counts = rng.integers(1, 1000, size=12).tolist()
        row = card(list(enumerate(counts)))
        assert abs(row.gini - round(np_gini(counts), 5)) < 1e-9
        assert row.n_rows == sum(counts) and row.max_rows == max(counts)

    assert card([(i, 7) for i in range(5)]).gini == 0.0   # balanced
    assert card([(0, 42)]).gini == 0.0                    # single key
    skew = card([(0, 10_000)] + [(i, 1) for i in range(1, 10)])
    assert abs(skew.gini - 0.9) < 0.01                    # ~ (P-1)/P
    assert skew.n_hot == 1 and skew.max_mean_ratio > 9.0

    # relabeling keys never changes the distribution stats
    a = card([(1, 5), (2, 50), (3, 500)])
    b = card([(9, 5), (7, 50), (5, 500)])
    assert (a.gini, a.n_rows, a.max_rows) == (b.gini, b.n_rows, b.max_rows)

    # the rank is the two-stage DISTRIBUTED ordinal (r11): a ties-heavy
    # table far wider than one shuffle partition exercises the
    # partition-boundary offsets and the (count, key) tie-break — the
    # Gini must still match numpy exactly (ties make Σ(2r−P−1)·n_r
    # rank-assignment-sensitive only across equal counts, where any
    # consistent total order gives the same sum; the numpy reference
    # sorts values alone, so agreement here proves that invariance
    # AND the offset arithmetic at once)
    wide_counts = [(i % 17) + 1 for i in range(5000)]
    wide = card(list(enumerate(wide_counts)))
    assert abs(wide.gini - round(np_gini(wide_counts), 5)) < 1e-9
    assert wide.n_rows == sum(wide_counts) and wide.n_partitions == 5000


def test_lsh_balance_report_over_planted_hot_bucket(spark):
    """The LSH index's health card (VERDICT r10 missing #3): on a
    uniform synthetic index the card is calm; planting one hot
    (band, sig) bucket raises n_hot and the card's totals track the
    physical entry count exactly. Binary signatures take the hex-key
    path without error."""
    from lshrs_spark.operators.index import lsh_balance_report

    rows = [(b, s, b * 100 + s) for b in range(4) for s in range(10)]
    idx = spark.createDataFrame(rows, "band int, sig long, id long")
    [calm] = lsh_balance_report(idx).collect()
    assert calm.n_rows == 40 and calm.n_partitions == 40
    assert calm.n_hot == 0 and calm.gini == 0.0

    hot = idx.union(
        spark.createDataFrame([(0, 0, 1000 + i) for i in range(200)],
                              "band int, sig long, id long")
    )
    [card] = lsh_balance_report(hot).collect()
    assert card.n_rows == 240 and card.n_partitions == 40
    assert card.max_rows == 201 and card.n_hot == 1
    assert card.gini > 0.5

    bin_idx = hot.selectExpr(
        "band", "cast(cast(sig as string) as binary) as sig", "id"
    )
    [bcard] = lsh_balance_report(bin_idx).collect()
    assert (bcard.n_rows, bcard.n_hot) == (card.n_rows, card.n_hot)


def test_balance_stats_empty_input_contract(spark):
    """An empty counts table (missing/empty store) must read as a
    well-typed zero card — a scheduler's `n_hot > 0` / `n_rows <
    expected` alerts would silently evaluate false-y on NULLs — while
    the genuinely undefined ratios stay NULL rather than faking a
    'perfectly balanced' gini of 0."""
    from lshrs_spark.operators.skew import balance_stats

    empty = spark.createDataFrame([], "k long, n long")
    [card] = balance_stats(empty, key_col="k").collect()
    assert card.n_rows == 0 and card.n_partitions == 0 and card.n_hot == 0
    assert card.gini is None and card.mean_rows is None
    assert card.max_rows is None and card.max_mean_ratio is None


def test_balance_stats_null_key_counts_as_distinct(spark):
    """ADVICE r11: the uniqueness check compared count(*) to a bare
    countDistinct, which skips NULLs — a counts frame whose keys are
    unique but include ONE NULL key falsely raised 'needs UNIQUE
    keys'. The struct-wrapped distinct counts the NULL key as a value:
    one NULL among unique keys is accepted, two NULLs (a genuinely
    duplicated key) still raise."""
    import pytest

    from lshrs_spark.operators.skew import balance_stats

    one_null = spark.createDataFrame(
        [(None, 7), (2, 5), (3, 9)], "k long, n long"
    )
    [card] = balance_stats(one_null, key_col="k").collect()
    assert card.n_partitions == 3 and card.n_rows == 21

    two_nulls = spark.createDataFrame(
        [(None, 7), (None, 5), (3, 9)], "k long, n long"
    )
    with pytest.raises(ValueError, match="UNIQUE keys"):
        balance_stats(two_nulls, key_col="k")


def test_balance_stats_interleaved_cards_and_duplicate_keys(spark):
    """Two r11-review CONFIRMED bugs pinned. (1) Interleaved cards:
    building card A, then card B, then reading A must give A's correct
    Gini — a SHARED persist slot let B evict A's rank intermediate and
    A's collect re-planned repartitionByRange under fresh range-bound
    sampling while the embedded offset literals reflected the old
    layout (silently wrong Gini). The eager-card contract removes the
    hazard: each call computes and releases its own slot, returning a
    local row. (2) Duplicate keys have no well-defined distributed
    ordinal (the RANGE-frame cumsum gives ties ONE shared rank, which
    broke the Σ(2r−P−1) form) — they must raise, not mis-rank."""
    import numpy as np

    from lshrs_spark.operators.skew import balance_stats

    def np_gini(counts):
        x = np.sort(np.asarray(counts, dtype=np.float64))
        n = len(x)
        r = np.arange(1, n + 1)
        return float(((2 * r - n - 1) * x).sum() / (n * x.sum()))

    rng = np.random.default_rng(211)
    c1 = rng.integers(1, 1000, size=40).tolist()
    c2 = rng.integers(1, 1000, size=40).tolist()
    card1 = balance_stats(
        spark.createDataFrame(list(enumerate(c1)), "k long, n long"),
        key_col="k",
    )
    card2 = balance_stats(
        spark.createDataFrame(list(enumerate(c2)), "k long, n long"),
        key_col="k",
    )
    # read A AFTER B was built — the order that corrupted the shared slot
    assert abs(card1.collect()[0].gini - round(np_gini(c1), 5)) < 1e-9
    assert abs(card2.collect()[0].gini - round(np_gini(c2), 5)) < 1e-9

    dup = spark.createDataFrame(
        [(1, 5), (1, 5), (2, 5), (3, 5)], "k long, n long"
    )
    with pytest.raises(ValueError, match="UNIQUE keys"):
        balance_stats(dup, key_col="k")

    # no cached residue: the card's rank intermediates are released
    from lshrs_spark.cache import _SLOTS

    assert not any(s.startswith("skew.balance_stats") for s in _SLOTS)


def test_balance_delta_drift_card_and_contracts(spark):
    """VERDICT r11 #7: the health-card history diff. Happy path — two
    hand-built cards subtract into the drift row a scheduler alerts
    on; contracts — non-card frames and multi-row frames raise, and an
    empty-store card's NULL ratios propagate as NULL deltas instead of
    faking 'no drift'."""
    import pytest

    from lshrs_spark.operators.skew import balance_delta, balance_stats

    prev = balance_stats(
        spark.createDataFrame(
            [(i, 10) for i in range(8)], "k long, n long"),
        key_col="k",
    )
    nxt = balance_stats(
        spark.createDataFrame(
            [(i, 4) for i in range(7)] + [(7, 200)], "k long, n long"),
        key_col="k",
    )
    [d] = balance_delta(prev, nxt).collect()
    assert d.n_rows_prev == 80 and d.n_rows_next == 228
    assert d.d_n_rows == 148 and d.d_n_partitions == 0
    assert abs(d.growth - round(228 / 80, 5)) < 1e-9
    assert d.d_max_rows == 190
    assert d.d_gini > 0 and d.d_n_hot == 1  # drifted toward imbalance
    # the delta of the two cards' rounded ginis, re-rounded
    [p] = prev.collect()
    [n] = nxt.collect()
    assert d.d_gini == round(n.gini - p.gini, 5)

    # extra card columns (IVF's tombstone/heal counts) are ignored
    from pyspark.sql import functions as F

    [d2] = balance_delta(
        prev.withColumn("n_tombstones", F.lit(3)), nxt).collect()
    assert d2.d_gini == d.d_gini

    # empty-store card: NULL ratios propagate, counts stay well-typed
    empty = balance_stats(
        spark.createDataFrame([], "k long, n long"), key_col="k")
    [de] = balance_delta(empty, nxt).collect()
    assert de.n_rows_prev == 0 and de.growth is None
    assert de.d_gini is None and de.d_mean_rows is None
    assert de.d_n_hot == 1

    with pytest.raises(ValueError, match="missing columns"):
        balance_delta(prev.drop("gini"), nxt)
    two = prev.unionByName(prev)
    with pytest.raises(ValueError, match="2 rows"):
        balance_delta(two, nxt)
    # ADVICE r12: a card-SHAPED frame with a NULL count column (only
    # reachable hand-built or via an outer join — real cards coalesce
    # counts to 0) used to surface as a bare TypeError from int(None);
    # it must raise the documented ValueError naming the column
    nulled = nxt.withColumn(
        "n_hot", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="NULL count columns.*n_hot"):
        balance_delta(prev, nulled)
