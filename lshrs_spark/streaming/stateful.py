"""Custom stateful streaming operator via ``applyInPandasWithState``.

``stream_first_seen`` tracks, per user, the first event of each type ever
seen on the stream (state = dict event_type -> (ts, event_id)), emitting
updates as they change. This is the canonical "keyed state machine"
shape: at scale the state store shards by the group key across
executors, checkpointing makes it exactly-once, and GroupStateTimeout
can expire idle keys.

Driven over a finite file stream in one micro-batch, the final output
equals the batch ``min_by`` aggregation — which is what the SQL oracle
checks."""

from __future__ import annotations

import uuid
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest import load_file_stream

__all__ = ["stream_first_seen"]

OUTPUT_SCHEMA = "user_id long, event_type string, first_us long, first_event_id long"
STATE_SCHEMA = "types array<string>, ts array<long>, ids array<long>"


def _make_first_seen_fn():
    """Return the stateful group function as a NESTED closure: cloudpickle
    serializes it by value, so workers never need ``lshrs_spark`` on
    their sys.path (module-level functions pickle by reference and break
    under the driver's vanilla session)."""

    def first_seen_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            types, ts, ids = state.get
            seen = {t: (int(a), int(b)) for t, a, b in zip(types, ts, ids)}
        else:
            seen = {}
        changed = {}
        for pdf in pdfs:
            for et, t_us, eid in zip(
                pdf["event_type"], pdf["t_us"], pdf["event_id"]
            ):
                cand = (int(t_us), int(eid))
                if et not in seen or cand < seen[et]:
                    seen[et] = cand
                    changed[et] = cand
        items = sorted(seen.items())
        state.update((
            [t for t, _ in items],
            [v[0] for _, v in items],
            [v[1] for _, v in items],
        ))
        if changed:
            out = sorted(changed.items())
            yield _pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(out),
                    "event_type": [t for t, _ in out],
                    "first_us": [v[0] for _, v in out],
                    "first_event_id": [v[1] for _, v in out],
                }
            )

    return first_seen_fn


def stream_first_seen(
    spark: SparkSession,
    source_path: str,
    *,
    name: Optional[str] = None,
) -> DataFrame:
    """Run the stateful first-seen operator over a finite event stream to
    completion and return the (update-mode) result table. Session conf
    is restored on return."""
    from .ingest import _stream_run_conf, scoped_session_conf

    with scoped_session_conf(spark, _stream_run_conf(spark)):
        return _stream_first_seen(spark, source_path, name)


def _stream_first_seen(spark, source_path, name):
    from pyspark.sql import functions as F

    from .ingest import run_to_memory_table

    name = name or f"stateful_{uuid.uuid4().hex[:8]}"
    stream = load_file_stream(spark, source_path).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _make_first_seen_fn(),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory_table(out, output_mode="update", name=name)


# --------------------------------------------------------------------- #
# transformWithState (Spark 4 arbitrary-state v2): typed state handles
# (value/list/map), timers, TTL — RocksDB-backed.
# --------------------------------------------------------------------- #

def _make_totals_processor():
    """Build the StatefulProcessor NESTED so cloudpickle ships the class
    by value (same worker-import rationale as `_make_first_seen_fn`)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running totals in a typed ValueState: the v2 API's
        state is schema'd and column-addressable (RocksDB row per key),
        unlike applyInPandasWithState's single opaque tuple."""

        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n bigint, cents bigint, last_us bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            n, cents, last = 0, 0, None
            if self._state.exists():
                prev = self._state.get()
                n, cents, last = int(prev[0]), int(prev[1]), int(prev[2])
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
                mx = int(pdf["t_us"].max())
                last = mx if last is None else max(last, mx)
            self._state.update((n, cents, last))
            yield _pd.DataFrame(
                {"user_id": [int(key[0])], "n": [n],
                 "cents": [cents], "last_us": [last]}
            )

        def close(self):
            pass

    return RunningTotalsProcessor()


def stream_user_totals(
    spark: SparkSession,
    source_path: str,
    *,
    name: Optional[str] = None,
) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state v2 operator (typed state handles, timers,
    TTL; RocksDB state store). Each micro-batch updates the user's
    ValueState and emits the new totals; over a finite stream the final
    update per user equals the batch aggregation, which is what the
    oracle checks. Session conf (including the RocksDB provider the v2
    operator requires) is scoped and restored.

    ENVIRONMENT-GATED (like the live-PostgreSQL path): the v2 operator's
    Python driver worker speaks protobuf to the JVM; without the
    ``protobuf`` package the query crashes deep inside Spark, so this
    fails fast with the actionable error instead."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state server speaks protobuf to the JVM); install "
            "protobuf to use stream_user_totals — "
            "applyInPandasWithState (stream_first_seen) covers custom "
            "stateful operators without it"
        ) from e
    from .ingest import _stream_run_conf, run_to_memory_table, scoped_session_conf

    from pyspark.sql import functions as F

    conf = _stream_run_conf(spark)
    conf["spark.sql.streaming.stateStore.providerClass"] = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    with scoped_session_conf(spark, conf):
        name = name or f"tws_{uuid.uuid4().hex[:8]}"
        stream = load_file_stream(spark, source_path).select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.unix_micros("ts").alias("t_us"),
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_totals_processor(),
            outputStructType="user_id long, n long, cents long, last_us long",
            outputMode="Update",
            timeMode="None",
        )
        return run_to_memory_table(out, output_mode="update", name=name)
