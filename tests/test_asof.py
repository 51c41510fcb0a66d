"""As-of join semantics: backward match, same-instant inclusion, no-match
nulls, multi-key isolation."""

from __future__ import annotations

import pytest

from lshrs_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 200, "l2"), (2, 150, "l3"), (3, 50, "l4")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 150, 2.0), (1, 200, 3.0), (2, 160, 4.0)],
        "k long, t long, rv double",
    )
    return left, right


def test_backward_match_and_ties(frames):
    left, right = frames
    out = {r.lv: (r.rv_right, r.t_right) for r in
           asof_join(left, right, ["k"], left_ts="t", right_ts="t").collect()}
    assert out["l1"] == (1.0, 90)     # most recent right <= 100
    assert out["l2"] == (3.0, 200)    # same-instant right row matches
    assert out["l3"] == (None, None)  # right at 160 > 150: no prior match
    assert out["l4"] == (None, None)  # key 3 has no right rows at all


def test_rows_preserved(frames):
    left, right = frames
    assert asof_join(left, right, ["k"], left_ts="t", right_ts="t").count() == left.count()


def test_events_ohlc_hand_computed(spark):
    """OHLC rollup: open/close resolve by (ts, event_id) — including the
    timestamp-tie case — low/high/n are plain aggregates."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # one hour bucket, type 'a': a timestamp TIE at the open
        (1, base, "a", 5.0),
        (0, base, "a", 7.0),            # same ts, smaller id -> open
        (2, base + dt.timedelta(minutes=30), "a", 1.0),
        (3, base + dt.timedelta(minutes=59), "a", 9.0),
        # next hour, type 'a'
        (4, base + dt.timedelta(hours=1), "a", 2.0),
        # type 'b'
        (5, base, "b", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    tmp = "/tmp/ohlc_test_events.parquet"
    ev.write.mode("overwrite").parquet(tmp)

    import lshrs_spark.entries as EN

    real_events = EN._events

    def fake_events(spark_, sf_dir):
        return spark_.read.parquet(tmp)

    EN._events = fake_events
    try:
        out = {(r.event_type, r.bucket_s): r
               for r in EN.QUERIES["rel_events_ohlc"](spark, "unused").collect()}
    finally:
        EN._events = real_events
    a0 = out[("a", int(base.replace(tzinfo=dt.timezone.utc).timestamp()))]
    assert (a0.open_v, a0.close_v, a0.low_v, a0.high_v, a0.n) == (
        7.0, 9.0, 1.0, 9.0, 4
    )
    a1 = out[("a", int((base + dt.timedelta(hours=1))
                       .replace(tzinfo=dt.timezone.utc).timestamp()))]
    assert (a1.open_v, a1.close_v, a1.n) == (2.0, 2.0, 1)
    b0 = out[("b", int(base.replace(tzinfo=dt.timezone.utc).timestamp()))]
    assert (b0.open_v, b0.close_v, b0.low_v, b0.high_v, b0.n) == (
        4.0, 4.0, 4.0, 4.0, 1
    )


def test_forward_asof_next_event(spark, frames):
    left, right = frames
    out = {(r.k, r.t): (r.t_right, r.rv_right) for r in
           asof_join(left, right, ["k"], left_ts="t", right_ts="t",
                     direction="forward").collect()}
    # k=1: left t=100 -> earliest right >= 100; left t=200 -> right >= 200
    rts = sorted((r.t, r.rv) for r in right.filter("k = 1").collect())
    nxt100 = next(((t, v) for t, v in rts if t >= 100), (None, None))
    nxt200 = next(((t, v) for t, v in rts if t >= 200), (None, None))
    assert out[(1, 100)] == nxt100
    assert out[(1, 200)] == nxt200
    # no future right row -> nulls
    for (k, t), (mt, mv) in out.items():
        future = [r for r in right.collect() if r.k == k and r.t >= t]
        if not future:
            assert mt is None and mv is None


def test_forward_asof_same_instant_inclusive(spark):
    left = spark.createDataFrame([(1, 100, "l")], "k long, t long, lv string")
    right = spark.createDataFrame([(1, 100, "r")], "k long, t long, rv string")
    row = asof_join(left, right, ["k"], left_ts="t", right_ts="t",
                    direction="forward").first()
    assert row.t_right == 100 and row.rv_right == "r"


def test_asof_rejects_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], left_ts="t", right_ts="t",
                  direction="nearest")


def test_asof_null_cell_not_torn_backward(spark):
    """ADVICE r4: a NULL cell in the matched right row must stay NULL —
    per-column ignorenulls carries used to fill it from an OLDER right
    row, mixing values of two rows into one match."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 3, 9, 7), (1, 5, 1, None)],
        "k int, ts int, v1 int, v2 int",
    )
    row = asof_join(left, right, ["k"]).collect()[0]
    assert (row.v1_right, row.v2_right, row.ts_right) == (1, None, 5)


def test_asof_null_cell_not_torn_forward(spark):
    left = spark.createDataFrame([(1, 1)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 2, None, 5), (1, 4, 8, 6)],
        "k int, ts int, v1 int, v2 int",
    )
    row = asof_join(left, right, ["k"], direction="forward").collect()[0]
    assert (row.v1_right, row.v2_right, row.ts_right) == (None, 5, 2)
