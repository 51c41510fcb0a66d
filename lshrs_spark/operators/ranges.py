"""Range / interval join — points joined to time intervals at scale.

The reference has no range or interval join of any kind (SURVEY.md §2.6);
this is part of the beyond-reference relational surface. The naive plan
for ``point.ts BETWEEN interval.start AND interval.end`` is a broadcast
nested-loop (or worse, a cartesian) theta join — O(points × intervals)
compares, which is unusable when both sides are large.

:func:`interval_join` instead **bucketizes time**: every interval is
exploded into the fixed-width buckets it overlaps and every point maps to
exactly one bucket, so the join becomes an *equi-join* on
``(keys..., bucket)`` that Catalyst shuffle-hash-partitions like any
other keyed join (AQE skew handling included), followed by the exact
range predicate as a post-filter. Compares drop from |P|·|I| to the
pairs that share a bucket — with a bucket width on the order of the
typical interval length, that is O(matches).

A point matches at most one exploded row per interval (its single
bucket), so no dedup step is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] = (),
    *,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_seconds: Optional[int] = None,
) -> DataFrame:
    """Inner-join every ``points`` row to each ``intervals`` row with the
    same ``on`` keys and ``start <= point_ts < end`` (end-exclusive).
    Returns all points columns plus all intervals columns (callers
    alias/prefix to avoid collisions; ``on`` keys appear once).

    ``bucket_seconds`` sets the bucketization width (default: no
    bucketing — plain theta join, only sane when one side broadcasts).
    Pick it near the typical interval length: too small explodes long
    intervals into many rows, too large puts unrelated rows in one
    bucket.
    """
    on = list(on)
    overlap = [c for c in intervals.columns if c in points.columns and c not in on]
    if overlap:
        raise ValueError(
            f"column collision between sides: {overlap}; alias before joining"
        )
    range_pred = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) < F.col(end_ts)
    )
    if bucket_seconds is None:
        cond = range_pred
        for k in on:
            cond = cond & (points[k] == intervals[k])
        joined = points.join(intervals, cond)
        # drop the duplicate key columns from the interval side
        return joined.drop(*[intervals[k] for k in on])

    w_us = int(bucket_seconds) * 1_000_000
    # exact integer microseconds: `div` is int64 division, so bucket ids
    # are exact for ANY epoch value (true `/` rounds through double and
    # is only exact below 2^53 µs)
    p = points.withColumn(
        "_bkt", F.expr(f"unix_micros({point_ts}) div {w_us}")
    )
    # Drop empty intervals BEFORE exploding: sequence(a, b) descends when
    # a > b, which would fabricate buckets for end <= start rows.
    i = intervals.filter(F.col(end_ts) > F.col(start_ts)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_ts}) div {w_us}"),
                # end-exclusive: the last overlapped bucket is the one
                # containing end - 1 microsecond
                F.expr(f"(unix_micros({end_ts}) - 1) div {w_us}"),
            )
        ),
    )
    return p.join(i, on=[*on, "_bkt"]).filter(range_pred).drop("_bkt")
