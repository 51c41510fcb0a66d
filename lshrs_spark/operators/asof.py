"""As-of (backward) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row with the same keys and ``right_ts <= left_ts``. Implemented as
the union + running ``last(ignorenulls)`` window trick:

* tag sides, union, sort per key by ``(ts, side)`` (right side first on
  ties so same-instant rows match, like DuckDB/pandas ASOF semantics);
* carry right-side values forward with ``last(..., ignorenulls=True)``
  over an unbounded-preceding window;
* keep left rows.

Scale shape: ONE shuffle on the join keys + a linear window pass — no
per-group materialization, no pandas, skew handled by AQE like any other
keyed shuffle. (The alternative ``applyInPandas``/``merge_asof`` pulls
whole groups into Python workers; this stays in Tungsten.)"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join. Returns every ``left`` row plus, for each of
    ``value_cols`` (default: all non-key, non-ts right columns), the
    value from the matched right row (null if none) and
    ``{right_ts}{suffix}`` with the matched timestamp.

    ``direction="backward"`` (default) matches the LATEST right row with
    ``right_ts <= left_ts`` (ties among right rows at the same instant:
    greatest value tuple wins). ``direction="forward"`` matches the
    EARLIEST right row with ``right_ts >= left_ts`` (ties: smallest
    value tuple wins) — the next-event lookup (e.g. next click after a
    purchase). Both are the same one-shuffle union + running-window
    plan, just scanned from opposite ends of each key's timeline."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward' (got {direction!r})"
        )
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*on, right_ts)]
    value_cols = list(value_cols)

    left_cols = [c for c in left.columns if c not in (*on, left_ts)]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    u = l.unionByName(r)
    # Tertiary sort on the right-side value tuple makes the choice among
    # right rows tied on (keys, ts) deterministic (greatest value tuple
    # wins) instead of shuffle-order-dependent.
    tie = F.struct(
        *[F.col(f"{c}{suffix}") for c in value_cols],
        F.col(f"{right_ts}{suffix}"),
    )
    # Carry ONE struct of (value_cols, ts) with a single ignorenulls
    # window call so every output column comes from the SAME matched
    # right row — independent per-column carries would fill a NULL cell
    # of the matched row from a *different* right row (torn match). The
    # when() guard makes left rows contribute NULL: a struct whose
    # fields are all NULL is itself non-NULL and would defeat
    # ignorenulls.
    rstruct = F.when(F.col("_side") == 0, tie)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_side"), tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last(rstruct, ignorenulls=True).over(w)
    else:
        # forward: left rows sort BEFORE right rows at the same instant
        # (side desc: 1 then 0), so a right row at exactly left_ts is
        # inside the [current, unbounded following] frame; ties among
        # right rows resolve by ascending value tuple (first() wins)
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_side").desc(), tie)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = F.first(rstruct, ignorenulls=True).over(w)
    out = u.select(
        *on, "_ts", "_side", *[F.col(c) for c in left_cols],
        matched.alias("_rmatch"),
    )
    return (
        out.filter(F.col("_side") == 1)
        .select(
            *on,
            F.col("_ts").alias(left_ts),
            *[F.col(c) for c in left_cols],
            *[
                F.col("_rmatch").getField(f"{c}{suffix}").alias(f"{c}{suffix}")
                for c in value_cols
            ],
            F.col("_rmatch")
            .getField(f"{right_ts}{suffix}")
            .alias(f"{right_ts}{suffix}"),
        )
    )
