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
