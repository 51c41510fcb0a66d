"""Structured Streaming ingest — the Spark-native replacement for the
reference's buffered realtime ``ingest()`` path
(``/root/reference/lshrs/core/main.py:386-440``: in-memory op buffer,
lock, flush-on-threshold, restore-on-failure).

Micro-batch ``foreachBatch`` + checkpointing gives the same at-least-once
semantics with retry, but distributed: each micro-batch computes
signatures with the same pandas_udf as the batch path and appends to the
parquet bucket index. ``stream_aggregate`` shows the windowed/stateful
side (watermarks for late data)."""

from __future__ import annotations

import json
import uuid
from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import LSHConfig
from ..operators.index import build_index

__all__ = [
    "run_to_memory_table",
    "stream_index_vectors",
    "stream_aggregate_complete",
    "windowed_event_counts",
    "session_event_counts",
    "scoped_session_conf",
    "stream_dedup_ingest",
    "sliding_event_counts",
    "stream_ivf_stage",
    "ivf_absorb_staging",
    "truncated_ivf_absorb_staging",
    "stream_bm25_ingest",
]


@contextmanager
def scoped_session_conf(spark: SparkSession, pairs: dict[str, str]):
    """Set session confs for the duration of the block, restoring each
    key's prior value (or unsetting it) on exit — the mechanism that
    keeps streaming helpers from leaking conf changes into unrelated
    queries sharing the session (ADVICE r2)."""
    old: dict[str, Optional[str]] = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, prev in old.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)


def _stream_run_conf(spark: SparkSession) -> dict[str, str]:
    """Conf for one run-to-completion streaming query: ns-as-long parquet
    reads, and state-store right-sizing — ONLY when the session still has
    the stock 200 default, which would mean 200 state-store tasks per
    micro-batch however small the stream. Applied via
    :func:`scoped_session_conf`, never left behind."""
    conf = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # NTZ->LTZ ts normalization (load_file_stream) must interpret
        # wall clocks as UTC for oracle parity, independent of caller.
        "spark.sql.session.timeZone": "UTC",
    }
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        conf["spark.sql.shuffle.partitions"] = str(
            spark.sparkContext.defaultParallelism
        )
    return conf


def load_file_stream(spark: SparkSession, source_path: str) -> DataFrame:
    """File-source stream with nanosecond-timestamp handling: Spark's
    parquet reader rejects TIMESTAMP(NANOS); read them as long and
    convert via integer division (ns are > 2^60 — float division would
    lose precision).

    Documented side effect: sets ``spark.sql.legacy.parquet.nanosAsLong``
    — required not just for schema inference here but whenever the
    returned (lazy) stream later executes, so it cannot be restored
    before returning. It is the ONLY session conf touched; the
    run-to-completion helpers below additionally scope it (plus
    state-store right-sizing) with :func:`scoped_session_conf` so they
    leave the session conf exactly as they found it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(source_path).schema
    # The file source needs a directory/glob base; turn a bare file path
    # into a glob that matches exactly that file.
    if source_path.endswith(".parquet"):
        head, sep, tail = source_path.rpartition("/")
        # A bare relative filename (no separator) globs in cwd ("."),
        # not at filesystem root ("/{name}").
        source_path = f"{head}/{{{tail}}}" if sep else f"./{{{tail}}}"
    stream = spark.readStream.schema(schema).parquet(source_path)
    for f in schema.fields:
        if f.name == "ts" and f.dataType.typeName() == "long":
            stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.name == "ts" and f.dataType.typeName() == "timestamp_ntz":
            # MICROS(isAdjustedToUTC=false) testdata generation: event-time
            # watermarks and unix_micros require LTZ; the run-to-completion
            # helpers pin the session zone to UTC so this cast keeps the
            # wall-clock instant identical to the oracle's naive epoch().
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def stream_index_vectors(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    cfg: LSHConfig,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
    bloom_filter: bool = False,
):
    """Stream a directory of vector parquet files into the bucket index.

    Returns the started StreamingQuery; caller drives it
    (``processAllAvailable`` in tests, ``awaitTermination`` in prod).

    ``bloom_filter=True`` writes a parquet Bloom filter on ``sig`` in
    every appended file: micro-batch appends are UNSORTED (no range
    layout until ``compact_index`` runs), so min/max row-group stats
    barely prune point probes — the Bloom filter is what keeps serving
    reads cheap between compactions.
    """
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # sig_kind derived from cfg (long when rows_per_band < 64, else
        # binary) so wide-band configs stream correctly too
        idx = build_index(batch_df, cfg, id_col, vector_col)
        w = idx.write.mode("append")
        if bloom_filter:
            w = w.option("parquet.bloom.filter.enabled#sig", "true").option(
                "parquet.bloom.filter.expected.ndv#sig", "1000000"
            )
        w.parquet(index_path)

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def run_to_memory_table(
    df: DataFrame,
    *,
    output_mode: str = "complete",
    name: Optional[str] = None,
) -> DataFrame:
    """Drive a (finite) streaming DataFrame to completion into a memory
    sink and return the result table — the shared harness behind every
    stream-equals-batch correctness entry."""
    spark = df.sparkSession
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_aggregate_complete(
    spark: SparkSession,
    source_path: str,
    group_cols: list[str],
    aggs: list,
    *,
    name: Optional[str] = None,
) -> DataFrame:
    """Run a streaming aggregation over a (finite) file stream to
    completion in complete output mode and return the result table —
    exactly equivalent to the batch aggregation, which is what the
    correctness oracle checks. Session conf is restored on return."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        stream = load_file_stream(spark, source_path)
        return run_to_memory_table(
            stream.groupBy(*group_cols).agg(*aggs), name=name
        )


def stream_ohlc_hourly(
    spark: SparkSession,
    source_path: str,
    *,
    watermark: str = "1 hour",
    name: Optional[str] = None,
) -> DataFrame:
    """Streaming hypertable rollup: hourly per-type OHLC (open/close by
    event time via ``min_by``/``max_by`` on a zero-padded
    ``(unix_micros, event_id)`` text key, low/high/count) over the
    watermarked event stream — the batch ``rel_events_ohlc`` semantics,
    maintained incrementally (complete mode on the finite test stream;
    the watermark bounds state at scale). ``min_by``/``max_by`` are
    plain aggregates, so the streaming state per (type, window) is one
    running tuple, not the window's rows."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        stream = load_file_stream(spark, source_path)
        ok = F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        )
        agg = (
            stream.withColumn("ok", ok)
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
            .agg(
                F.round(F.min_by("value", F.col("ok")), 5).alias("open_v"),
                F.round(F.max_by("value", F.col("ok")), 5).alias("close_v"),
                F.round(F.min("value"), 5).alias("low_v"),
                F.round(F.max("value"), 5).alias("high_v"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "event_type",
                F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
                "open_v", "close_v", "low_v", "high_v", "n",
            )
        )
        return run_to_memory_table(agg, name=name)


def windowed_event_counts(
    spark: SparkSession,
    source_path: str,
    *,
    window: str = "1 day",
    watermark: str = "1 hour",
    name: Optional[str] = None,
) -> DataFrame:
    """Tumbling event-time window counts with a watermark, driven to
    completion over a finite file stream (complete mode so every window
    is emitted; watermark still bounds state at scale). Session conf is
    restored on return."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        return _windowed_event_counts(spark, source_path, window, watermark, name)


def _windowed_event_counts(spark, source_path, window, watermark, name):
    stream = load_file_stream(spark, source_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Per-row rounding to integer cents BEFORE the sum keeps the
            # aggregate exact under any partial-agg order (oracle parity).
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            # epoch seconds, not a timestamp: exact integer comparison with
            # the oracle regardless of engine timestamp internals
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    return run_to_memory_table(agg, name=name)


def session_event_counts(
    spark: SparkSession,
    source_path: str,
    *,
    gap: str = "30 minutes",
    name: Optional[str] = None,
) -> DataFrame:
    """Gap-based session windows per user over the event stream
    (``F.session_window``), driven to completion in complete mode.
    One row per (user, session): ``(session_start µs, user_id, n_events)``.

    Session semantics are end-exclusive: an event exactly ``gap`` after
    the previous one starts a NEW session — the batch islands oracle
    must flag new sessions with ``delta >= gap``, not ``>``.

    Session conf is restored on return.
    """
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        return _session_event_counts(spark, source_path, gap, name)


def _session_event_counts(spark, source_path, gap, name):
    stream = load_file_stream(spark, source_path)
    agg = (
        stream.groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            # epoch microseconds: exact integer parity with the oracle
            F.unix_micros(F.col("w.start")).alias("session_start"),
            "user_id",
            "n_events",
        )
    )
    return run_to_memory_table(agg, name=name)


def stream_scd2_ingest(
    spark: SparkSession,
    source_path: str,
    table_path: str,
    keys,
    tracked,
    *,
    base_version: int = 2,
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
):
    """Streaming dimension maintenance: each micro-batch of updates is
    applied to the SCD2 history table at ``{table_path}/current`` via
    :func:`~lshrs_spark.operators.diff.scd2_apply` with ``version =
    base_version + epoch_id``.

    Replay-safe: the version derives from the epoch id, and a retried
    batch whose ``_CURRENT`` marker already points at this epoch's
    directory short-circuits — the apply completed before the crash and
    only the checkpoint commit was lost (re-running would read and
    overwrite the same path, which Spark refuses, wedging the query).
    A crash BEFORE the marker repoint leaves ``_CURRENT`` on the prior
    version, so the retry rebuilds the epoch from unchanged input —
    idempotent (``scd2_apply`` at a fixed version re-derives the same
    rows). Each apply writes to a ``v{epoch}-{run}`` directory and
    repoints the marker atomically, so a crash mid-write never corrupts
    the readable table (single-writer, like every streaming sink here;
    micro-batches are serialized by the engine).

    The directory/marker name carries an INCARNATION token (the
    checkpoint's persistent query id, which survives restarts of the
    same checkpoint but changes when the checkpoint is deleted and
    recreated): epoch ids reset with a fresh checkpoint, and a bare
    ``v{epoch}`` marker left by a prior incarnation would collide with
    the new run's first epochs — the short-circuit would silently DROP
    those batches. With the token in the name, a stale marker never
    equals a new incarnation's directory, so the batch applies on top
    of the retained history as a fresh write. Returns the started
    StreamingQuery."""
    import os as _os

    keys = list(keys)
    tracked = list(tracked)
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    from ..operators.diff import scd2_apply

    _run_token: list = []

    def run_token() -> str:
        """Stable across restarts of the SAME checkpoint (its metadata
        query id), fresh for a recreated checkpoint or checkpoint-less
        run — the incarnation half of the replay short-circuit key."""
        if _run_token:
            return _run_token[0]
        tok = None
        if checkpoint:
            # Plain open() only resolves local paths; a scheme'd
            # checkpoint URI (hdfs://, s3a://) would ALWAYS fall through
            # to a per-process random token, silently defeating the
            # replay short-circuit across restarts (ADVICE r6). Read via
            # the checkpoint's own Hadoop filesystem instead.
            try:
                jvm = spark._jvm
                p = jvm.org.apache.hadoop.fs.Path(
                    checkpoint.rstrip("/") + "/metadata"
                )
                fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
                if fs.exists(p):
                    fin = fs.open(p)
                    try:
                        # ONE Py4J round trip for the whole (tiny) file —
                        # a per-byte fin.read() loop costs one driver-to-
                        # JVM RPC per byte and would silently truncate
                        # past its loop cap. commons-io ships with Spark.
                        raw = bytes(
                            jvm.org.apache.commons.io.IOUtils.toByteArray(
                                fin
                            )
                        )
                        tok = json.loads(raw.decode("utf-8")).get("id")
                    finally:
                        fin.close()
            except Exception:
                tok = None
            if tok is None:
                import logging

                logging.getLogger(__name__).warning(
                    "stream_scd2_ingest: checkpoint metadata at %s is "
                    "unreadable; falling back to a per-process run token "
                    "— the crash-replay short-circuit will not match "
                    "across restarts",
                    checkpoint,
                )
        if tok is None:
            tok = uuid.uuid4().hex
        _run_token.append(str(tok).replace("-", "")[:12])
        return _run_token[0]

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        marker = _os.path.join(table_path, "_CURRENT")
        vdir = f"v{epoch_id}-{run_token()}"
        cur_dir = None
        if _os.path.exists(marker):
            with open(marker) as fh:
                cur_dir = fh.read().strip()
        # Replay short-circuit: if the marker already points at this
        # epoch's directory FOR THIS INCARNATION, the batch was fully
        # applied before the crash (marker repoints only after the
        # write completed) and only the checkpoint commit was lost.
        # Without this, the retry would read the directory while
        # mode('overwrite')-writing the same path — Spark refuses
        # ("cannot overwrite a path that is also being read from") and
        # the query wedges permanently. A stale marker from a PRIOR
        # incarnation (checkpoint deleted, epoch ids reset) carries a
        # different token, so it can never match — that batch applies
        # as a fresh write instead of being dropped.
        if cur_dir == vdir:
            return
        if cur_dir is not None:
            hist = spark.read.parquet(_os.path.join(table_path, cur_dir))
        else:
            hist = (
                batch_df.select(
                    *keys, *tracked,
                    F.lit(0).cast("long").alias("valid_from"),
                    F.lit(-1).cast("long").alias("valid_to"),
                ).limit(0)
            )
        out = scd2_apply(
            hist, batch_df.select(*keys, *tracked), keys, tracked,
            version=base_version + epoch_id,
        )
        out.write.mode("overwrite").parquet(_os.path.join(table_path, vdir))
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(vdir)
        _os.replace(tmp, marker)

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_scd2_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Current SCD2 history as of the last committed micro-batch."""
    import os as _os

    with open(_os.path.join(table_path, "_CURRENT")) as fh:
        cur = fh.read().strip()
    return spark.read.parquet(_os.path.join(table_path, cur))


def stream_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    state_path: str,
    *,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    seed: int = 42,
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
    key_fn=None,
):
    """Streaming incremental dedup — the production ingest shape: each
    micro-batch of documents is MinHash-banded and joined against the
    ACCUMULATED corpus band-key store (parquet at
    ``{state_path}/band_keys``) before admission.

    ``key_fn`` (optional) swaps the key generator: any callable
    ``batch_df -> (id, band, sig)`` plugs a different modality into the
    same store/join/replay machinery — e.g.
    :func:`~lshrs_spark.operators.dedup.image_dhash_band_keys` for
    STREAMING IMAGE DEDUP over binary payload batches (perceptual
    dHash blocks as band keys). Default: MinHash over ``text``. Batch docs that share
    a band with the stored corpus are recorded as ``(new_id,
    corpus_id)`` candidate pairs under ``{state_path}/duplicates`` and
    NOT admitted; clean docs append their band keys to the store.

    Scale shape: the store is the narrow ``(id, band, sig)`` key table
    (not the documents), the join is an equi-join on ``(band, sig)``
    with the (small) batch side broadcast by Catalyst, and micro-batches
    are serialized by the streaming engine so store read-then-append is
    race-free. Intra-batch duplicates are admitted together (dedup
    granularity = batch boundary); run :func:`~lshrs_spark.operators.
    dedup.minhash_band_pairs` over the store to clean up afterwards.

    Replay-safe: both sinks are keyed by ``epoch={epoch_id}``
    subdirectories written with overwrite, so a micro-batch retried
    after a failure/restart rewrites exactly its own output instead of
    appending twice, and the store read EXCLUDES the current epoch's
    partition — a replayed batch never collides with its own
    half-written keys. ``new_id != corpus_id`` self-pairs are dropped as
    defense-in-depth (an id legitimately re-sent later is an upsert,
    not a duplicate of itself).

    Returns the started StreamingQuery (caller drives it)."""
    from pyspark.errors import AnalysisException

    from ..operators.dedup import minhash_band_keys

    keys_path = f"{state_path}/band_keys"
    dups_path = f"{state_path}/duplicates"
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    if key_fn is None:
        def key_fn(batch_df):
            return minhash_band_keys(
                batch_df, num_hashes, rows_per_band, n, seed=seed
            )

    def dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        keys = key_fn(batch_df).persist()
        dups = None
        try:
            try:
                stored = (
                    spark.read.option("basePath", keys_path)
                    .parquet(keys_path)
                    .where(F.col("epoch") != F.lit(int(epoch_id)))
                    .select("id", "band", "sig")
                )
            except AnalysisException:
                stored = None  # first batch: nothing admitted yet
            admit = keys
            if stored is not None:
                dups = (
                    keys.alias("a")
                    .join(stored.alias("b"), on=["band", "sig"])
                    .where(F.col("a.id") != F.col("b.id"))
                    .select(
                        F.col("a.id").alias("new_id"),
                        F.col("b.id").alias("corpus_id"),
                    )
                    .distinct()
                    .persist()
                )
                dups.write.mode("overwrite").parquet(
                    f"{dups_path}/epoch={int(epoch_id)}"
                )
                admit = keys.join(
                    dups.select(F.col("new_id").alias("id")).distinct(),
                    "id",
                    "left_anti",
                )
            admit.write.mode("overwrite").parquet(
                f"{keys_path}/epoch={int(epoch_id)}"
            )
        finally:
            keys.unpersist()
            if dups is not None:
                dups.unpersist()

    writer = stream.writeStream.foreachBatch(dedup_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def sliding_event_counts(
    spark: SparkSession,
    source_path: str,
    *,
    window: str = "2 days",
    slide: str = "1 day",
    name: Optional[str] = None,
) -> DataFrame:
    """Sliding (overlapping) event-time windows over the event stream —
    each event contributes to ``window/slide`` windows; completes the
    window-type coverage next to tumbling (`windowed_event_counts`) and
    session (`session_event_counts`) windows. Session conf is restored
    on return."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        stream = load_file_stream(spark, source_path)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.window("ts", window, slide).alias("w"), F.col("event_type")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "value_cents"
                ),
            )
            .select(
                F.unix_timestamp(F.col("w.start")).alias("window_start"),
                "event_type",
                "n",
                "value_cents",
            )
        )
        return run_to_memory_table(agg, name=name)


def stream_attribution_join(
    spark: SparkSession,
    source_path: str,
    *,
    left_type: str = "view",
    right_type: str = "click",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    name: Optional[str] = None,
) -> DataFrame:
    """Stream-stream join with an event-time range condition — the
    attribution pattern: every ``right_type`` event (click) matched to
    the same user's earlier ``left_type`` events (views) within
    ``horizon``. Both sides carry watermarks AND the join predicate
    bounds event time on both sides, so Spark derives a state watermark
    and evicts matched/expired rows per micro-batch — join state is
    O(events inside the horizon), not O(stream length), which is what
    makes this run forever on an unbounded click stream. Returns
    ``(user_id, view_id, click_id, lag_sec)``; session conf restored on
    return.

    ``how="left_outer"`` additionally emits every UNMATCHED view — but
    only once the state watermark passes ``view_ts + horizon`` (Spark
    must prove no future click can still match before it may emit the
    null row), so outer results for the newest events trail by
    ``watermark + horizon`` of event time. The outer output carries
    ``view_us`` and sentinel ``click_id = lag_sec = -1`` for no-match
    rows (nullable ints degrade to float64 in pandas, poisoning schema
    comparison).

    Spark requires equality somewhere in a stream-stream join condition
    for state keying — ``user_id`` is it here; the range predicate
    prunes within the key's state."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer' (got {how!r})")
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        left = (
            load_file_stream(spark, source_path)
            .filter(F.col("event_type") == left_type)
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", watermark)
        )
        right = (
            load_file_stream(spark, source_path)
            .filter(F.col("event_type") == right_type)
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", watermark)
        )
        joined = left.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
            how,
        )
        if how == "inner":
            joined = joined.select(
                "user_id",
                "view_id",
                "click_id",
                ((F.unix_micros("click_ts") - F.unix_micros("view_ts"))
                 / 1_000_000).cast("long").alias("lag_sec"),
            )
        else:
            joined = joined.select(
                "user_id",
                "view_id",
                F.coalesce(F.col("click_id"), F.lit(-1)).cast("long")
                .alias("click_id"),
                F.coalesce(
                    ((F.unix_micros("click_ts") - F.unix_micros("view_ts"))
                     / 1_000_000).cast("long"),
                    F.lit(-1),
                ).alias("lag_sec"),
                F.unix_micros("view_ts").alias("view_us"),
            )
        return run_to_memory_table(joined, output_mode="append", name=name)


def windowed_counts_with_late_stats(
    spark: SparkSession,
    source_path: str,
    *,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    name: Optional[str] = None,
) -> tuple[DataFrame, int]:
    """Watermarked tumbling window counts in UPDATE mode, one file per
    micro-batch, returning ``(result, n_dropped_late)`` — the
    operational signal a production stream owner alarms on:
    ``numRowsDroppedByWatermark`` summed over the run's state
    operators. Data loss from mis-sized watermarks is silent unless the
    pipeline surfaces this number next to its outputs; here it rides
    the same return value."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        schema = spark.read.parquet(source_path).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_path)
        )
        for f in schema.fields:
            if f.name == "ts" and f.dataType.typeName() == "long":
                stream = stream.withColumn(
                    "ts", F.expr("timestamp_micros(ts div 1000)")
                )
            elif f.name == "ts" and f.dataType.typeName() == "timestamp_ntz":
                stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        agg = (
            stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_timestamp(F.col("w.start")).alias("window_start"),
                "event_type",
                "n",
            )
        )
        qname = name or f"late_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            dropped = 0
            for prog in q.recentProgress:
                for op in (prog.get("stateOperators") or []):
                    dropped += int(op.get("numRowsDroppedByWatermark", 0))
        finally:
            q.stop()
        # update-mode memory sink appends every emitted update; the
        # latest row per key is the final count
        tbl = spark.table(qname)
        w = Window.partitionBy("window_start", "event_type")
        latest = tbl.withColumn("_max_n", F.max("n").over(w)).filter(
            F.col("n") == F.col("_max_n")
        ).drop("_max_n").distinct()
        return latest, dropped


def stream_static_enrich(
    spark: SparkSession,
    source_path: str,
    dim_df: DataFrame,
    on: str,
    *,
    name: Optional[str] = None,
) -> DataFrame:
    """Stream-static join: every micro-batch equi-joins the (small,
    finite) dimension table — Spark re-plans the static side per batch,
    so a broadcast hint on ``dim_df`` keeps the join shuffle-free
    stream-side at any scale (the standard enrichment topology:
    clickstream x account table). Returns the enriched stream driven to
    completion; session conf restored."""
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        stream = load_file_stream(spark, source_path)
        enriched = stream.join(F.broadcast(dim_df), on)
        return run_to_memory_table(enriched, output_mode="append", name=name)


def stream_deduped_counts(
    spark: SparkSession,
    source_path: str,
    *,
    key_cols: Optional[list] = None,
    watermark: str = "1 hour",
    name: Optional[str] = None,
) -> DataFrame:
    """Exactly-once-per-key counting on an at-least-once stream:
    ``dropDuplicatesWithinWatermark`` on the event id discards redelivered
    rows (state bounded by the watermark horizon — old keys are evicted,
    unlike plain ``dropDuplicates`` whose key state grows forever), then
    a per-type count. Complements :func:`stream_dedup_ingest`, which
    dedups document CONTENT against a persistent corpus; this one dedups
    delivery RETRIES inside the stream itself. Session conf restored on
    return."""
    key_cols = key_cols or ["event_id"]
    with scoped_session_conf(spark, _stream_run_conf(spark)):
        stream = (
            load_file_stream(spark, source_path)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(key_cols)
        )
        # One stateful operator per query: the dedup stream lands in the
        # sink (append — rows emit as they pass the dedup state), the
        # rollup runs batch-side over the sink table, exactly as a
        # production job would aggregate the deduped landing zone.
        deduped = run_to_memory_table(stream, output_mode="append", name=name)
        return deduped.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )


def stream_segmented_ingest(
    spark: SparkSession,
    source_path: str,
    store_root: str,
    cfg: LSHConfig,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
    bucket_partitions: Optional[int] = None,
):
    """Stream vectors into a :class:`~lshrs_spark.store.
    SegmentedIndexStore`: each micro-batch commits one epoch-keyed
    immutable segment (replay-safe — a retried batch rewrites its own
    segment, the manifest gains it once), and every commit is a new
    manifest version a :class:`~lshrs_spark.serving.
    SegmentedIndexServer` picks up on ``refresh()``. The continuous-
    ingest topology end to end: stream -> segments -> snapshot-isolated
    serving, with ``compact()`` as the periodic maintenance step.
    Returns the started StreamingQuery."""
    from ..store import SegmentedIndexStore

    store = SegmentedIndexStore.create(spark, store_root)
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        idx = build_index(batch_df, cfg, id_col, vector_col)
        kw = {}
        if bucket_partitions:
            kw["bucket_partitions"] = bucket_partitions
        store.append_epoch(idx, epoch_id, **kw)

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_ivf_stage(
    spark: SparkSession,
    source_path: str,
    staging_path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
):
    """Continuous ANN ingest, stage 1 of the standard two-step: each
    micro-batch of vectors lands in a replay-safe epoch-keyed staging
    area (``{staging}/epoch=N``, overwrite per epoch — a retried batch
    rewrites its own output, same contract as
    :func:`stream_dedup_ingest`'s sinks). Absorb staged vectors into the
    centroid-partitioned store with :func:`ivf_absorb_staging` on
    whatever cadence serving freshness requires.

    Staging exists because the store's layout key (nearest-centroid
    assignment) is a JOIN against the centroid table, and the store is
    read by partition-schema-strict servers — appending arbitrary epoch
    directories inside it would break both replay idempotency and the
    serving layout. Returns the started StreamingQuery."""
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def stage_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vector_col).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(f"{staging_path}/epoch={int(epoch_id)}")
        )

    writer = stream.writeStream.foreachBatch(stage_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def ivf_absorb_staging(
    spark: SparkSession,
    staging_path: str,
    store_path: str,
    centroids,
) -> int:
    """Stage 2: assign staged vectors to their nearest centroid and
    append them into the centroid-partitioned IVF store, then clear the
    staging area. IDEMPOTENT: staged ids already present in the store
    are anti-joined away first, so a crash between absorb and the
    staging cleanup (or a replayed stage epoch) cannot duplicate
    vectors. Returns the number of vectors absorbed. A live
    :class:`~lshrs_spark.serving.IVFServer` sees the new vectors at its
    next ``refresh()``."""
    import shutil

    from ..operators.knn import ivf_assign

    try:
        staged = spark.read.option("basePath", staging_path).parquet(
            staging_path
        ).select("id", "embedding")
    except Exception:
        return 0  # nothing staged
    try:
        existing = spark.read.parquet(store_path).select("id")
        staged = staged.join(existing, "id", "left_anti")
    except Exception:
        pass  # first absorb: store does not exist yet
    staged = staged.localCheckpoint()  # count + write read ONE snapshot
    n = staged.count()
    if n:
        assign = ivf_assign(staged, centroids, id_col="id",
                            vector_col="embedding")
        (
            staged.join(assign, "id")
            # co-locate before the partitioned append (same trap
            # ivf_write_store fixed in r8: without this every task
            # writes a file into every centroid dir it touches —
            # tasks x centroids tiny files per absorbed batch); the
            # records cap splits a skewed hot centroid's single task
            .repartition(F.col("centroid_id"))
            .write.mode("append")
            .option("maxRecordsPerFile", 1 << 22)
            .partitionBy("centroid_id")
            .parquet(store_path)
        )
    shutil.rmtree(staging_path, ignore_errors=True)
    return n


def truncated_ivf_absorb_staging(
    spark: SparkSession,
    staging_path: str,
    store_path: str,
    *,
    full_files: int = 8,
    full_row_group_bytes: int = 1 << 16,
) -> int:
    """Stage 2 of continuous ingest for the MATRYOSHKA tier — the
    streaming twin every other serving tier already has (VERDICT r8
    #2's completion): absorb vectors staged by :func:`stream_ivf_stage`
    into a :func:`~lshrs_spark.operators.knn.truncated_ivf_write_store`
    layout via :func:`~lshrs_spark.operators.knn.truncated_ivf_append`
    — assignment against the EXISTING stored centroids (never
    retrained), truncated files into the centroid partitions plus an
    id-sorted ``_full`` segment — then clear the staging area. A live
    :class:`~lshrs_spark.serving.TruncatedIVFServer` sees the batch at
    its next ``refresh()``; fold accumulated segments with
    :func:`~lshrs_spark.operators.knn.truncated_ivf_compact` on the
    usual LSM cadence.

    IDEMPOTENT like :func:`ivf_absorb_staging`: staged ids already
    present in the TRUNCATED tree (the candidate source — an orphan
    ``_full`` row is never a candidate) are anti-joined away first, so
    a replayed stage epoch cannot duplicate candidates. The one crash
    window — absorb died after the sidecar segment committed but
    before the truncated files — leaves duplicate ``_full`` rows for
    those ids after the replay: harmless to results (the refine fetch
    dedupes by id; same id is the same vector) and physically removed
    by the next compaction. The store must already exist (centroids
    come from it). Returns the number of vectors absorbed."""
    import shutil

    from ..operators.knn import truncated_ivf_append

    try:
        staged = spark.read.option("basePath", staging_path).parquet(
            staging_path
        ).select("id", "embedding")
    except Exception:
        return 0  # nothing staged
    existing = spark.read.parquet(store_path).select("id")
    staged = staged.join(existing, "id", "left_anti")
    staged = staged.localCheckpoint()  # count + append read ONE snapshot
    n = staged.count()
    if n:
        truncated_ivf_append(
            staged, store_path, id_col="id", vector_col="embedding",
            full_files=full_files,
            full_row_group_bytes=full_row_group_bytes,
        )
    shutil.rmtree(staging_path, ignore_errors=True)
    return n


def stream_bm25_ingest(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    *,
    num_buckets: int = 32,
    checkpoint: Optional[str] = None,
    max_files_per_trigger: int = 1,
):
    """Streaming BM25 index maintenance: each micro-batch of documents
    appends its postings under ``{index_path}/epoch={n}/bucket={m}/``
    and its corpus-constant deltas under ``{index_path}/_stats/
    epoch={n}/`` — an append-only keyword index a live
    :class:`~lshrs_spark.serving.BM25Server(..., epochs=True)` picks up
    at its next ``refresh()`` (stats rows are additive, so the server
    just sums them; a query term still reads only its bucket
    directories across epochs).

    Replay-safe: both sinks are epoch-keyed ``mode('overwrite')``
    paths, so a retried micro-batch rewrites exactly its own output —
    the same idempotency contract as every streaming sink here. Run
    :func:`~lshrs_spark.functions.text.bm25_compact` on the usual LSM
    cadence (e.g. when epochs exceed a few hundred) to fold the
    accumulated per-micro-batch partitions and stats rows back into
    ONE sorted epoch — rankings are preserved bit-identically and live
    servers pick the folded tree up at their next ``refresh()``.
    ``num_buckets`` must match the existing layout's count (the server
    refuses mixed-bucket layouts; compaction re-buckets to repair one).
    Returns the started StreamingQuery."""
    from ..functions.text import bm25_postings, bm25_stats_row

    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def index_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # shared pipeline with the batch writer: one definition of the
        # layout schema and bucket key, so the streamed epochs stay
        # readable by the same BM25Server
        postings, dl = bm25_postings(batch_df, num_buckets)
        dl = dl.persist()
        try:
            (
                postings.repartition(F.col("bucket"))
                .sortWithinPartitions("tok", "id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{index_path}/epoch={int(epoch_id)}")
            )
            bm25_stats_row(dl, num_buckets).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{index_path}/_stats/epoch={int(epoch_id)}")
        finally:
            dl.unpersist()

    writer = stream.writeStream.foreachBatch(index_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
