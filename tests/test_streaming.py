"""Structured Streaming ingest: micro-batch index append equals the batch
build; streaming aggregation equals batch aggregation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark import LSHConfig
from lshrs_spark.operators.index import build_index
from lshrs_spark.streaming.ingest import (
    load_file_stream,
    stream_aggregate_complete,
    stream_index_vectors,
)

CFG = LSHConfig(dim=16, num_perm=16, num_bands=4, rows_per_band=4, seed=42)


@pytest.fixture()
def vector_dir(spark, tmp_path, rng):
    """Three parquet files of vectors — three micro-batches."""
    src = tmp_path / "vectors"
    for part in range(3):
        vecs = rng.standard_normal((10, 16)).astype(np.float32)
        rows = [(part * 10 + i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
            1
        ).write.mode("append").parquet(str(src))
    return str(src)


def test_stream_index_matches_batch_build(spark, vector_dir, tmp_path):
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = stream_index_vectors(
        spark, vector_dir, index_path, CFG, checkpoint=ckpt, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.read.parquet(index_path)
    batch = build_index(spark.read.parquet(vector_dir), CFG, "vec_id", "embedding")
    assert streamed.count() == batch.count() == 30 * CFG.num_bands
    assert (
        streamed.exceptAll(batch).count() == 0
        and batch.exceptAll(streamed).count() == 0
    )


def test_stream_aggregate_equals_batch(spark, vector_dir):
    out = stream_aggregate_complete(
        spark,
        vector_dir,
        [],
        [F.count(F.lit(1)).alias("n"), F.sum("vec_id").alias("s")],
    ).collect()[0]
    assert out.n == 30
    assert out.s == sum(range(30))


def test_load_file_stream_converts_nanos(spark):
    stream = load_file_stream(spark, "/root/testdata/sf0.001/events.parquet")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert stream.isStreaming


def test_stream_index_wide_band_binary_sigs(spark, vector_dir, tmp_path):
    """rows_per_band >= 64 forces binary signatures — streaming ingest
    must derive the kind from cfg instead of hardcoding long."""
    wide = LSHConfig(dim=16, num_perm=128, num_bands=2, rows_per_band=64, seed=42)
    index_path = str(tmp_path / "index_wide")
    q = stream_index_vectors(spark, vector_dir, index_path, wide)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.read.parquet(index_path)
    assert dict(streamed.dtypes)["sig"] == "binary"
    batch = build_index(spark.read.parquet(vector_dir), wide, "vec_id", "embedding")
    assert (
        streamed.exceptAll(batch).count() == 0
        and batch.exceptAll(streamed).count() == 0
    )


def test_stream_helpers_leave_session_conf_unchanged(spark):
    """ADVICE r2 #3: the run-to-completion streaming helpers must not
    leak conf changes (shuffle partitions / nanosAsLong) into the shared
    session — even when the session still has the stock 200 default."""
    from lshrs_spark.streaming.ingest import session_event_counts

    src = "/root/testdata/sf0.001/events.parquet"
    keys = ["spark.sql.shuffle.partitions",
            "spark.sql.legacy.parquet.nanosAsLong"]
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        before = {k: spark.conf.get(k) for k in keys}
        out = stream_aggregate_complete(
            spark, src, ["event_type"], [F.count(F.lit(1)).alias("n")]
        )
        assert out.count() > 0
        assert {k: spark.conf.get(k) for k in keys} == before
        out = session_event_counts(spark, src)
        assert out.count() > 0
        assert {k: spark.conf.get(k) for k in keys} == before
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def test_stream_dedup_ingest_flags_cross_batch_duplicates(spark, tmp_path):
    """Streaming incremental dedup: batch 2's copy of a batch-1 doc is
    flagged against the stored corpus keys and NOT admitted; clean docs
    accumulate in the band-key store."""
    import os
    import time

    from lshrs_spark.streaming.ingest import stream_dedup_ingest

    src = tmp_path / "docs"
    batches = [
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "one two three four five six seven eight")],
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 0
         (11, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
        [(20, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),  # dup of 11
         (21, "unique prose entirely different words and phrases here")],
    ]
    seen: set[str] = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        t = time.time() - 100 + i * 10   # strictly increasing mtimes
        for name in os.listdir(src):
            p = os.path.join(str(src), name)
            if name.startswith("part-") and p not in seen:
                seen.add(p)
                os.utime(p, (t, t))
    state = str(tmp_path / "state")
    q = stream_dedup_ingest(
        spark, str(src), state,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dups = {(r.new_id, r.corpus_id)
            for r in spark.read.parquet(f"{state}/duplicates").collect()}
    assert dups == {(10, 0), (20, 11)}
    admitted = {r.id for r in
                spark.read.parquet(f"{state}/band_keys").select("id")
                .distinct().collect()}
    assert admitted == {0, 1, 11, 21}   # duplicates never enter the store

    # --- replay: delete the last commit marker and restart, forcing the
    # streaming engine to re-run the final micro-batch (ADVICE r3: the
    # old append-mode sinks doubled dup rows and self-flagged the
    # replayed batch's own keys, refusing re-admission) -----------------
    commits = sorted(
        f for f in os.listdir(tmp_path / "ckpt" / "commits")
        if not f.startswith(".")
    )
    os.remove(tmp_path / "ckpt" / "commits" / commits[-1])
    crc = tmp_path / "ckpt" / "commits" / f".{commits[-1]}.crc"
    if crc.exists():             # stale Hadoop checksum blocks the re-commit
        os.remove(crc)
    q.awaitTermination(60)       # checkpoint lock must release before restart
    for _ in range(100):
        if not q.isActive:
            break
        time.sleep(0.1)
    q2 = stream_dedup_ingest(
        spark, str(src), state,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    dup_rows = spark.read.parquet(f"{state}/duplicates").collect()
    assert {(r.new_id, r.corpus_id) for r in dup_rows} == {(10, 0), (20, 11)}
    assert len(dup_rows) == 2            # idempotent: no doubled rows
    admitted_rows = spark.read.parquet(f"{state}/band_keys").select(
        "id"
    ).collect()
    assert {r.id for r in admitted_rows} == {0, 1, 11, 21}
    # 4 admitted ids x (num_hashes=8 / rows_per_band=2)=4 band keys each;
    # a replayed append (vs overwrite) would double id 21's keys
    assert len(admitted_rows) == 16


def test_stream_ivf_stage_and_absorb(spark, tmp_path):
    """Continuous ANN ingest: micro-batches stage replay-safely, absorb
    assigns + appends to the centroid-partitioned store idempotently,
    and a live IVFServer sees new vectors after refresh()."""
    import numpy as np

    from lshrs_spark.operators.knn import ivf_centroids_by_id, ivf_write_store
    from lshrs_spark.serving import IVFServer
    from lshrs_spark.streaming.ingest import (
        ivf_absorb_staging,
        stream_ivf_stage,
    )

    rng = np.random.default_rng(73)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(df.filter("vec_id < 40"), 4)
    store = str(tmp_path / "store")
    ivf_write_store(df.filter("vec_id < 40"), cents, store)

    src = tmp_path / "src"
    df.filter("vec_id >= 40 AND vec_id < 80").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    df.filter("vec_id >= 80").coalesce(1).write.mode("append").parquet(str(src))
    staging = str(tmp_path / "staging")
    q = stream_ivf_stage(
        spark, str(src), staging,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    srv = IVFServer.from_store(store)
    assert ivf_absorb_staging(spark, staging, store, cents) == 80
    ids = {r.id for r in spark.read.parquet(store).select("id").collect()}
    assert ids == set(range(120))
    # co-located absorb (round-9): the appended batch lands as ONE file
    # per touched centroid dir (base write + absorb = at most 2), never
    # tasks x centroids tiny files
    import glob as _glob
    import os as _os

    for d in _glob.glob(f"{store}/centroid_id=*"):
        n_files = len(_glob.glob(_os.path.join(d, "*.parquet")))
        assert n_files <= 2, (d, n_files)
    srv.refresh()
    got = srv.topk(vecs[100], 120, nprobe=4)
    assert 100 in [i for i, _, _ in got]           # streamed vector served
    # idempotent: re-staging already-absorbed ids absorbs nothing new
    df.filter("vec_id >= 80").select(
        F.col("vec_id").alias("id"), "embedding"
    ).write.mode("overwrite").parquet(f"{staging}/epoch=99")
    assert ivf_absorb_staging(spark, staging, store, cents) == 0
    assert spark.read.parquet(store).count() == 120


def _write_events(spark, path, rows):
    import datetime as dt  # noqa: F401

    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_attribution_join_equals_batch(spark, tmp_path):
    import datetime as dt

    from lshrs_spark.streaming.ingest import stream_attribution_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: one view, one click inside the horizon, one outside
        (1, t0, 1, "view", 1.0),
        (2, t0 + 10 * m, 1, "click", 1.0),
        (3, t0 + 40 * m, 1, "click", 1.0),
        # user 2: view with no click
        (4, t0, 2, "view", 1.0),
        # user 3: click with no view
        (5, t0, 3, "click", 1.0),
        # user 4: two views funnel into one click (both within horizon)
        (6, t0, 4, "view", 1.0),
        (7, t0 + 5 * m, 4, "view", 1.0),
        (8, t0 + 20 * m, 4, "click", 1.0),
    ]
    src = str(tmp_path / "events_attr.parquet")
    _write_events(spark, src, rows)
    got = sorted(
        (r.user_id, r.view_id, r.click_id, r.lag_sec)
        for r in stream_attribution_join(spark, src).collect()
    )
    assert got == [
        (1, 1, 2, 600),
        (4, 6, 8, 1200),
        (4, 7, 8, 900),
    ]


def test_stream_attribution_left_outer_emits_unmatched(spark, tmp_path):
    """Unmatched views emit (click_id=-1) once the state watermark
    passes view_ts + horizon — a far-future event advances it; views
    inside the unclosed tail must NOT emit a premature null row."""
    import datetime as dt

    from lshrs_spark.streaming.ingest import stream_attribution_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "view", 1.0),            # converts
        (2, t0 + 10 * m, 1, "click", 1.0),
        (3, t0, 2, "view", 1.0),            # never converts -> null row
        (4, t0, 3, "click", 1.0),           # click without view: no row
        # watermark driver: advances both sides' event time far past
        # t0 + horizon + watermark, closing the window for users 1-3
        (5, t0 + 600 * m, 9, "view", 1.0),
        (6, t0 + 600 * m, 9, "click", 1.0),
    ]
    src = str(tmp_path / "events_attr_outer.parquet")
    _write_events(spark, src, rows)
    out = stream_attribution_join(spark, src, how="left_outer")
    got = sorted(
        (r.user_id, r.view_id, r.click_id, r.lag_sec) for r in out.collect()
    )
    # user 9's view sits inside the unclosed tail: its (matched) row
    # emits immediately via the inner path, never as a null
    assert got == [
        (1, 1, 2, 600),
        (2, 3, -1, -1),
        (9, 5, 6, 0),
    ]
    with pytest.raises(ValueError, match="how must be"):
        stream_attribution_join(spark, src, how="full_outer")


def test_stream_deduped_counts_drops_redelivered(spark, tmp_path):
    import datetime as dt

    from lshrs_spark.streaming.ingest import stream_deduped_counts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    base = [
        (1, t0, 1, "view", 1.0),
        (2, t0, 1, "click", 2.0),
        (3, t0, 2, "view", 3.0),
    ]
    # at-least-once delivery: every row arrives twice with the same id
    src = str(tmp_path / "events_dup.parquet")
    _write_events(spark, src, base + base)
    got = {
        r.event_type: (r.n, r.value_cents)
        for r in stream_deduped_counts(spark, src).collect()
    }
    assert got == {"view": (2, 400), "click": (1, 200)}


def test_stream_user_totals_tws(spark, tmp_path):
    """transformWithStateInPandas (arbitrary-state v2) — runs only where
    protobuf is installed (its state server speaks protobuf to the JVM);
    otherwise assert the fast actionable gate instead of Spark's deep
    worker crash."""
    import datetime as dt

    from lshrs_spark.streaming.stateful import stream_user_totals

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 2.5),
        (3, t0, 2, "view", 3.0),
    ]
    src = str(tmp_path / "events_tws.parquet")
    _write_events(spark, src, rows)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="protobuf"):
            stream_user_totals(spark, src)
        return
    got = {r.user_id: (r.n, r.cents, r.last_us)
           for r in stream_user_totals(spark, src).collect()}
    assert got[1] == (2, 350, int(rows[1][1].timestamp() * 1_000_000))
    assert got[2] == (1, 300, int(t0.timestamp() * 1_000_000))


def test_stream_static_enrich_equals_batch_join(spark, tmp_path):
    import datetime as dt

    from lshrs_spark.streaming.ingest import stream_static_enrich

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "view", 1.0), (2, t0, 2, "click", 2.0),
            (3, t0, 3, "view", 3.0)]
    src = str(tmp_path / "events_enrich.parquet")
    _write_events(spark, src, rows)
    dim = spark.createDataFrame(
        [("view", 10), ("click", 20)], ["event_type", "weight"]
    )
    got = stream_static_enrich(spark, src, dim, "event_type")
    assert sorted((r.event_id, r.weight) for r in got.collect()) == [
        (1, 10), (2, 20), (3, 10)
    ]


def test_windowed_counts_surface_dropped_late_rows(spark, tmp_path):
    import datetime as dt
    import os as _os
    import time as _time

    from lshrs_spark.streaming.ingest import windowed_counts_with_late_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "late_events")
    _os.makedirs(src, exist_ok=True)

    def write_file(name, rows, mtime):
        sub = str(tmp_path / f"tmp_{name}")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(sub)
        import shutil

        part = [f for f in _os.listdir(sub) if f.endswith(".parquet")][0]
        dst = f"{src}/{name}.parquet"
        shutil.copy(f"{sub}/{part}", dst)
        _os.utime(dst, (mtime, mtime))

    # batches 1-2: fresh events 2h in — the watermark a batch runs
    # under comes from data one COMMITTED batch back, so two fresh
    # batches guarantee the late batch executes under wm ~ t0+1h30
    f1 = [(1, t0 + dt.timedelta(hours=2), 1, "view", 1.0)]
    f2 = [(2, t0 + dt.timedelta(hours=2, minutes=5), 2, "view", 1.0)]
    # batch 3: events at t0, far behind the watermark -> dropped
    late = [(3, t0, 3, "view", 1.0), (4, t0, 4, "click", 1.0)]
    now = _time.time()
    write_file("b0", f1, now - 180)
    write_file("b1", f2, now - 120)
    write_file("b2", late, now - 60)

    result, dropped = windowed_counts_with_late_stats(
        spark, src, window="1 hour", watermark="30 minutes"
    )
    assert dropped == 2
    got = {(r.window_start, r.event_type): r.n for r in result.collect()}
    # only the fresh window survives, with both fresh events
    fresh_ws = int((t0 + dt.timedelta(hours=2)).timestamp())
    assert got == {(fresh_ws, "view"): 2}


def test_stream_scd2_ingest_matches_batch_and_replays(spark, tmp_path):
    """Two micro-batches of dimension updates through stream_scd2_ingest
    must equal the same scd2_apply sequence in batch; re-applying a
    batch at ITS OWN version (the replay case: version = epoch id) is a
    no-op."""
    import os
    import time

    from lshrs_spark.operators.diff import scd2_apply
    from lshrs_spark.streaming.ingest import (
        read_scd2_table,
        stream_scd2_ingest,
    )

    src = str(tmp_path / "dim_updates")
    b0 = spark.createDataFrame([(1, 100), (2, 200)], "k long, cents long")
    b1 = spark.createDataFrame([(1, 150), (3, 300)], "k long, cents long")
    b0.coalesce(1).write.mode("append").parquet(src)
    table = str(tmp_path / "scd2_table")
    q = stream_scd2_ingest(
        spark, src, table, ["k"], ["cents"],
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
        b1.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.k, r.cents, r.valid_from, r.valid_to)
        for r in read_scd2_table(spark, table).collect()
    )
    # batch reference: epoch 0 -> version 2, epoch 1 -> version 3
    hist = b0.select(
        "k", "cents",
        F.lit(2).cast("long").alias("valid_from"),
        F.lit(-1).cast("long").alias("valid_to"),
    ).limit(0)
    hist = scd2_apply(hist, b0, ["k"], ["cents"], version=2)
    hist = scd2_apply(hist, b1, ["k"], ["cents"], version=3)
    want = sorted(
        (r.k, r.cents, r.valid_from, r.valid_to) for r in hist.collect()
    )
    assert got == want
    # replay idempotency: re-applying b1 at version 3 changes nothing
    replay = scd2_apply(
        read_scd2_table(spark, table), b1, ["k"], ["cents"], version=3
    )
    got2 = sorted(
        (r.k, r.cents, r.valid_from, r.valid_to) for r in replay.collect()
    )
    assert got2 == want


def test_stream_scd2_retry_after_marker_repoint_short_circuits(
    spark, tmp_path
):
    """ADVICE r4 (medium): crash between the _CURRENT repoint and the
    checkpoint commit means the engine replays the epoch. The replayed
    apply must short-circuit (marker already at v{epoch}) instead of
    reading v{epoch} while overwrite-writing the same path — which
    Spark refuses, wedging the query permanently. Simulated by deleting
    the epoch's commit file and restarting the stream."""
    import os
    import time

    from lshrs_spark.streaming.ingest import (
        read_scd2_table,
        stream_scd2_ingest,
    )

    src = str(tmp_path / "dim_updates")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "scd2_table")
    b0 = spark.createDataFrame([(1, 100), (2, 200)], "k long, cents long")
    b0.coalesce(1).write.mode("append").parquet(src)
    q = stream_scd2_ingest(
        spark, src, table, ["k"], ["cents"], checkpoint=ckpt,
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = sorted(
        (r.k, r.cents, r.valid_from, r.valid_to)
        for r in read_scd2_table(spark, table).collect()
    )
    # lose the commit for epoch 0: marker points at v0, engine replays 0
    commits = os.path.join(ckpt, "commits")
    last = max(f for f in os.listdir(commits) if not f.startswith("."))
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")   # hadoop checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    q = stream_scd2_ingest(
        spark, src, table, ["k"], ["cents"], checkpoint=ckpt,
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()          # replays epoch 0 — must not wedge
        assert q.exception() is None
    finally:
        q.stop()
    got = sorted(
        (r.k, r.cents, r.valid_from, r.valid_to)
        for r in read_scd2_table(spark, table).collect()
    )
    assert got == want


def test_stream_scd2_fresh_checkpoint_does_not_drop_colliding_epoch(
    spark, tmp_path
):
    """ADVICE r5 (low): after deleting the checkpoint and restarting,
    epoch ids reset — a stale _CURRENT marker whose epoch number
    happens to equal the replayed epoch's must NOT short-circuit (that
    would silently drop the batch). The marker/directory name carries
    the checkpoint's query id, so a new incarnation's v0 never equals
    the old incarnation's v0."""
    import os
    import shutil
    import time

    from lshrs_spark.streaming.ingest import (
        read_scd2_table,
        stream_scd2_ingest,
    )

    src = str(tmp_path / "dim_updates")
    table = str(tmp_path / "scd2_table")
    b0 = spark.createDataFrame([(1, 100), (2, 200)], "k long, cents long")
    b0.coalesce(1).write.mode("append").parquet(src)
    q = stream_scd2_ingest(
        spark, src, table, ["k"], ["cents"],
        checkpoint=str(tmp_path / "ckpt1"), max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(os.path.join(table, "_CURRENT")) as fh:
        marker1 = fh.read().strip()
    assert marker1.startswith("v0-")   # epoch 0, incarnation 1

    # incarnation 2: checkpoint gone, source replaced — the new stream's
    # epoch 0 carries DIFFERENT data than the marker's epoch 0
    shutil.rmtree(src)
    b1 = spark.createDataFrame([(1, 150), (3, 300)], "k long, cents long")
    b1.coalesce(1).write.mode("append").parquet(src)
    q = stream_scd2_ingest(
        spark, src, table, ["k"], ["cents"],
        checkpoint=str(tmp_path / "ckpt2"), max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    with open(os.path.join(table, "_CURRENT")) as fh:
        marker2 = fh.read().strip()
    assert marker2.startswith("v0-") and marker2 != marker1
    got = {
        (r.k, r.cents, r.valid_to)
        for r in read_scd2_table(spark, table).collect()
    }
    # b1 applied on top of the retained history, not dropped: k=1's 100
    # closed, 150 current; k=3 admitted
    assert (1, 150, -1) in got and (3, 300, -1) in got
    assert any(k == 1 and c == 100 and vt != -1 for k, c, vt in got)


def test_stream_image_dedup_ingest_blocks_near_dup_payloads(spark, tmp_path):
    """Streaming IMAGE dedup: the generic key_fn hook plugs perceptual
    dHash block keys into the same accumulated-store machinery. A
    later batch's near-identical image is recorded as a duplicate and
    not admitted; a genuinely different image is admitted."""
    import time

    import numpy as np

    from lshrs_spark.multimodal import dhash48, encode_ppm
    from lshrs_spark.operators.dedup import image_dhash_band_keys
    from lshrs_spark.streaming.ingest import stream_dedup_ingest

    rng = np.random.default_rng(53)
    base = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (255, 255, 255)
    other = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    # near must actually be a near-dup of base for the test's premise
    assert bin(dhash48(base) ^ dhash48(near)).count("1") <= 6

    src = str(tmp_path / "img_stream")
    b0 = spark.createDataFrame(
        [(1, bytearray(encode_ppm(base)))], "id long, payload binary"
    )
    b1 = spark.createDataFrame(
        [(2, bytearray(encode_ppm(near))), (3, bytearray(encode_ppm(other)))],
        "id long, payload binary",
    )
    b0.coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "img_state")
    q = stream_dedup_ingest(
        spark, src, state,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=2,
        key_fn=lambda df: image_dhash_band_keys(df, max_hamming=6),
    )
    try:
        q.processAllAvailable()
        b1.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {
        r.id for r in spark.read.parquet(f"{state}/band_keys")
        .select("id").distinct().collect()
    }
    dups = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(f"{state}/duplicates").collect()
    }
    assert 1 in admitted and 3 in admitted
    assert 2 not in admitted
    assert (2, 1) in dups


def test_stream_audio_dedup_ingest_blocks_near_dup_payloads(
    spark, tmp_path
):
    """Streaming AUDIO dedup: the same generic key_fn hook plugs the
    perceptual audio-fingerprint block keys into the accumulated-store
    machinery — a later batch's re-leveled near-identical clip is
    recorded as a duplicate and not admitted; a different clip is."""
    import time

    import numpy as np

    from lshrs_spark.multimodal import audio_fingerprint, encode_wav
    from lshrs_spark.operators.dedup import audio_fingerprint_band_keys
    from lshrs_spark.streaming.ingest import stream_dedup_ingest

    rng = np.random.default_rng(59)
    base = rng.integers(-3000, 3000, size=48).astype(np.int16)
    near = (base + 40).astype(np.int16)       # re-leveled copy
    other = rng.integers(-3000, 3000, size=48).astype(np.int16)
    assert bin(
        audio_fingerprint(base) ^ audio_fingerprint(near)
    ).count("1") <= 3

    src = str(tmp_path / "wav_stream")
    spark.createDataFrame(
        [(1, bytearray(encode_wav(base)))], "id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "wav_state")
    q = stream_dedup_ingest(
        spark, src, state,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=2,
        key_fn=lambda df: audio_fingerprint_band_keys(df, max_hamming=3),
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, bytearray(encode_wav(near))),
             (3, bytearray(encode_wav(other)))],
            "id long, payload binary",
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {
        r.id for r in spark.read.parquet(f"{state}/band_keys")
        .select("id").distinct().collect()
    }
    dups = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(f"{state}/duplicates").collect()
    }
    assert 1 in admitted and 3 in admitted
    assert 2 not in admitted
    assert (2, 1) in dups


def test_stream_bm25_ingest_serves_like_batch_index(spark, tmp_path):
    """Streaming BM25 maintenance: epoch-keyed postings + additive
    stats. After two micro-batches, BM25Server(epochs=True) over the
    streamed layout ranks identically to a batch bm25_index_write over
    the full corpus."""
    import time

    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server
    from lshrs_spark.streaming.ingest import stream_bm25_ingest

    rows = [
        (i, f"alpha beta doc{i} " * 3 + ("vector hash " * (i % 3)))
        for i in range(40)
    ]
    src = str(tmp_path / "docs")
    half = 20
    spark.createDataFrame(rows[:half], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)

    idx = str(tmp_path / "bm25_stream")
    q = stream_bm25_ingest(
        spark, src, idx, num_buckets=8,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            rows[half:], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()

    srv = BM25Server(idx, epochs=True)
    batch_store = str(tmp_path / "bm25_batch")
    bm25_index_write(
        spark.createDataFrame(rows, "doc_id long, text string"),
        batch_store, num_buckets=8,
    )
    ref = BM25Server(batch_store)
    for terms in (["vector", "hash"], ["alpha"], ["doc3", "beta"]):
        got = srv.search(terms, k=15)
        want = ref.search(terms, k=15)
        assert [(i, m) for i, m, _, _ in got] == [(i, m) for i, m, _ in
                                                  [(i, m, s) for i, m, s, _ in want]]
        for (_, _, s, _), (_, _, w, _) in zip(got, want):
            assert abs(s - w) < 1e-12 + 1e-9 * abs(w)


def _parquet_files(root):
    import os

    return [
        os.path.join(d, f)
        for d, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_bm25_compact_preserves_rankings_and_shrinks_files(spark, tmp_path):
    """VERDICT r5 #4: folding a streamed epoch layout into one sorted
    epoch must return bit-identical rankings (disjoint doc ids union
    verbatim; corpus constants are exact integer sums) while collapsing
    the per-micro-batch partitions and _stats rows — the postings twin
    of the LSH store's compact()."""
    import time

    from lshrs_spark.functions.text import bm25_compact
    from lshrs_spark.serving import BM25Server
    from lshrs_spark.streaming.ingest import stream_bm25_ingest

    rows = [
        (i, f"alpha beta doc{i} " * 3 + ("vector hash " * (i % 3)))
        for i in range(30)
    ]
    src = str(tmp_path / "docs")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)
    idx = str(tmp_path / "bm25_epochs")
    q = stream_bm25_ingest(
        spark, src, idx, num_buckets=8,
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    srv = BM25Server(idx, epochs=True)
    queries = (["vector", "hash"], ["alpha"], ["doc3", "beta"])
    before = [srv.search(t, k=15) for t in queries]
    files_before = _parquet_files(idx)
    rows_before = spark.read.parquet(idx).count()
    assert spark.read.parquet(f"{idx}/_stats").count() == 3  # 1/epoch

    n = bm25_compact(spark, idx)
    assert n == rows_before                       # postings union verbatim
    srv.refresh()
    after = [srv.search(t, k=15) for t in queries]
    assert after == before                        # bit-identical rankings
    files_after = _parquet_files(idx)
    assert len(files_after) < len(files_before)   # small-files folded
    assert spark.read.parquet(f"{idx}/_stats").count() == 1
    # a fresh server over the compacted tree agrees too
    fresh = [BM25Server(idx, epochs=True).search(t, k=15) for t in queries]
    assert fresh == before

    # epoch-id-reset safety: a restart with a FRESH checkpoint writes
    # epoch=0 again — the compacted corpus lives at epoch=-1 (an id the
    # stream can never produce), so the new micro-batch lands alongside
    # it instead of clobbering it
    import os

    assert os.path.isdir(f"{idx}/epoch=-1")
    spark.createDataFrame(
        [(100, "vector hash newdoc alpha")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src + "_more")
    q = stream_bm25_ingest(
        spark, src + "_more", idx, num_buckets=8,
        checkpoint=str(tmp_path / "ckpt_fresh"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    srv.refresh()
    assert srv._n == 31                           # 30 compacted + 1 new
    got = srv.search(["newdoc"], k=3)
    assert [i for i, _, _, _ in got] == [100]
    # old docs still ranked (compacted corpus survived the reset epoch)
    assert [i for i, _, _, _ in srv.search(["doc3"], k=3)] == [3]


def test_bm25_compact_repairs_mixed_bucket_counts(spark, tmp_path):
    """Epochs written with differing num_buckets (the refused-to-serve
    layout) are re-bucketed into one consistent count by compaction;
    positional postings survive, so phrase queries keep working."""
    import pytest

    from lshrs_spark.functions.text import (
        bm25_compact,
        bm25_postings,
        bm25_stats_row,
    )
    from lshrs_spark.serving import BM25Server

    idx = str(tmp_path / "bm25_mixed_epochs")
    for epoch, nb, docs in (
        (0, 4, [(1, "the quick brown fox"), (2, "the lazy dog")]),
        (1, 8, [(3, "quick silver fox"), (4, "the brown bear")]),
    ):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        postings, dl = bm25_postings(df, nb, store_positions=True)
        (
            postings.repartition(F.col("bucket"))
            .sortWithinPartitions("tok", "id")
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(f"{idx}/epoch={epoch}")
        )
        bm25_stats_row(dl, nb).coalesce(1).write.mode("overwrite").parquet(
            f"{idx}/_stats/epoch={epoch}"
        )
    with pytest.raises(ValueError, match="num_buckets"):
        BM25Server(idx, epochs=True)

    bm25_compact(spark, idx)
    srv = BM25Server(idx, epochs=True)
    assert srv._num_buckets == 8                  # max count wins
    got = srv.search(["quick", "fox"], k=4)
    assert [i for i, _, _, _ in got] == [1, 3, 2, 4] or [
        i for i, _, _, _ in got
    ][:2] == [3, 1]                               # both epochs' docs found
    assert {i for i, m, _, _ in got if m == 2} == {1, 3}
    assert srv.phrase(["quick", "brown"]) == {1: 1}
    # batch layouts are already one sorted epoch — refuse, don't mangle
    from lshrs_spark.functions.text import bm25_index_write

    batch = str(tmp_path / "bm25_batch_only")
    bm25_index_write(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string"),
        batch, num_buckets=4,
    )
    with pytest.raises(ValueError, match="epochs layout"):
        bm25_compact(spark, batch)


def test_bm25_compact_validation_and_swap_hygiene(spark, tmp_path):
    """ADVICE r6: (a) num_buckets=0 / empty _stats raise clear errors
    instead of int(None)/silent fallthrough; (b) a non-local scheme'd
    path is refused before any destructive local-fs call; (c) a
    successful compact leaves no .tmp-*/.old-* siblings behind."""
    import os

    import pytest

    from lshrs_spark.functions.text import (
        bm25_compact,
        bm25_postings,
        bm25_stats_row,
    )

    idx = str(tmp_path / "bm25_epochs")
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    postings, dl = bm25_postings(df, 4, store_positions=False)
    (
        postings.repartition(F.col("bucket"))
        .sortWithinPartitions("tok", "id")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{idx}/epoch=0")
    )
    bm25_stats_row(dl, 4).coalesce(1).write.mode("overwrite").parquet(
        f"{idx}/_stats/epoch=0"
    )

    with pytest.raises(ValueError, match="num_buckets must be >= 1"):
        bm25_compact(spark, idx, num_buckets=0)
    # object-store schemes are refused up front (rename is a copy there)
    with pytest.raises(ValueError, match="non-local path"):
        bm25_compact(spark, "s3://bucket/bm25")
    with pytest.raises(ValueError, match="non-local path"):
        bm25_compact(spark, "s3a://bucket/bm25")

    # the swap itself runs through the path's Hadoop filesystem
    # (ADVICE r7) — a file:// scheme'd URI compacts fine
    n = bm25_compact(spark, f"file://{idx}")
    assert n == 4
    base = os.path.basename(idx)
    strays = [d for d in os.listdir(tmp_path)
              if d.startswith(base + ".")]
    assert strays == []

    # empty _stats + no override: clear error before any destructive step
    empty = str(tmp_path / "bm25_empty_stats")
    (
        postings.repartition(F.col("bucket"))
        .sortWithinPartitions("tok", "id")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{empty}/epoch=0")
    )
    bm25_stats_row(dl, 4).limit(0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{empty}/_stats/epoch=0")
    with pytest.raises(ValueError, match="_stats table is empty"):
        bm25_compact(spark, empty)


def test_swap_via_rename_failure_branches():
    """ADVICE r8: a failed second rename hop restores the original at
    ``dst`` AND deletes the fully-written tmp tree instead of stranding
    it; a failed first hop raises with nothing moved; success deletes
    only the old tree. Driven through a duck-typed fake filesystem so
    every branch is exercised without a JVM."""
    import pytest

    from lshrs_spark.fswap import swap_via_rename as _swap_via_rename

    class FakeFS:
        def __init__(self, fail=()):
            self.fail = set(fail)
            self.renames = []
            self.deletes = []

        def rename(self, a, b):
            self.renames.append((a, b))
            return (a, b) not in self.fail

        def delete(self, p, recursive):
            self.deletes.append(p)
            return True

    # success: dst->old, tmp->dst, old deleted, tmp untouched
    fs = FakeFS()
    _swap_via_rename(fs, "dst", "tmp", "old", label="t")
    assert fs.renames == [("dst", "old"), ("tmp", "dst")]
    assert fs.deletes == ["old"]

    # first hop fails: nothing else happens
    fs = FakeFS(fail={("dst", "old")})
    with pytest.raises(IOError, match="aside failed"):
        _swap_via_rename(fs, "dst", "tmp", "old", label="t")
    assert fs.renames == [("dst", "old")]
    assert fs.deletes == []

    # second hop fails: original restored, tmp deleted (not stranded)
    fs = FakeFS(fail={("tmp", "dst")})
    with pytest.raises(IOError, match="original layout restored"):
        _swap_via_rename(fs, "dst", "tmp", "old", label="t")
    assert fs.renames == [("dst", "old"), ("tmp", "dst"), ("old", "dst")]
    assert fs.deletes == ["tmp"]

    # tmp cleanup failure never masks the real error
    class AngryFS(FakeFS):
        def delete(self, p, recursive):
            raise RuntimeError("delete broke")

    fs = AngryFS(fail={("tmp", "dst")})
    with pytest.raises(IOError, match="original layout restored"):
        _swap_via_rename(fs, "dst", "tmp", "old", label="t")

    # ADVICE r9: when the ROLLBACK rename also fails, the error names
    # both surviving trees (never claims "restored") and nothing is
    # deleted — both the original and the rewritten tree stay on disk
    fs = FakeFS(fail={("tmp", "dst"), ("old", "dst")})
    with pytest.raises(IOError, match="preserved at old.*rewritten tree at tmp"):
        _swap_via_rename(fs, "dst", "tmp", "old", label="t")
    assert fs.renames == [("dst", "old"), ("tmp", "dst"), ("old", "dst")]
    assert fs.deletes == []


def test_stream_truncated_ivf_stage_and_absorb(spark, tmp_path):
    """The matryoshka tier's streaming ingest twin (VERDICT r8 #2
    completion): micro-batches stage replay-safely, absorb appends
    against the STORED centroid set idempotently, a live
    TruncatedIVFServer serves the streamed vectors after refresh(),
    and the crash-replay window's duplicate sidecar rows are
    result-invisible (server + stored-query dedupe) and physically
    removed by compaction."""
    import numpy as np

    from lshrs_spark.operators.knn import (
        truncated_ivf_compact,
        truncated_ivf_write_store,
        truncated_topk_stored,
    )
    from lshrs_spark.serving import TruncatedIVFServer
    from lshrs_spark.streaming.ingest import (
        stream_ivf_stage,
        truncated_ivf_absorb_staging,
    )

    rng = np.random.default_rng(91)
    vecs = rng.standard_normal((120, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    store = str(tmp_path / "tstore")
    ref = str(tmp_path / "tref")
    truncated_ivf_write_store(df.filter("vec_id < 40"), 4, 8, store,
                              full_files=2)
    # same centroid set (deterministic lowest-4 ids live in the base)
    truncated_ivf_write_store(df, 4, 8, ref, full_files=2)

    src = tmp_path / "src"
    df.filter("vec_id >= 40 AND vec_id < 80").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    df.filter("vec_id >= 80").coalesce(1).write.mode("append").parquet(
        str(src)
    )
    q = stream_ivf_stage(
        spark, str(src), str(tmp_path / "staging"),
        checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    srv = TruncatedIVFServer.from_store(store)
    assert truncated_ivf_absorb_staging(
        spark, str(tmp_path / "staging"), store, full_files=2
    ) == 80
    srv.refresh()
    srv_ref = TruncatedIVFServer.from_store(ref)
    for qi in (0, 50, 100):
        got = srv.topk(vecs[qi], 10, nprobe=4, coarse_k=40)
        want = srv_ref.topk(vecs[qi], 10, nprobe=4, coarse_k=40)
        assert [(i, r) for i, _, r in got] == [(i, r) for i, _, r in want]
    # idempotent: re-staging absorbed ids absorbs nothing
    df.filter("vec_id >= 80").select(
        F.col("vec_id").alias("id"), "embedding"
    ).write.mode("overwrite").parquet(f"{tmp_path}/staging/epoch=99")
    assert truncated_ivf_absorb_staging(
        spark, str(tmp_path / "staging"), store
    ) == 0
    assert spark.read.parquet(store).count() == 120

    # crash-replay window: a dead absorb left an extra sidecar segment
    # for ids 80-89 (same ids, same vectors) — results must not repeat
    # ids, and compaction must physically drop the duplicates
    df.filter("vec_id >= 80 AND vec_id < 90").select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).coalesce(1).write.mode("append").parquet(f"{store}/_full")
    assert spark.read.parquet(f"{store}/_full").count() == 130
    srv.refresh()
    got = srv.topk(vecs[85], 20, nprobe=4, coarse_k=60)
    ids = [i for i, _, _ in got]
    assert len(ids) == len(set(ids))       # no duplicated result rows
    assert ids[0] == 85                     # still retrievable, rank 1
    queries = spark.createDataFrame(
        [(85, [float(x) for x in vecs[85]])], "qid long, qvec array<float>"
    )
    out = truncated_topk_stored(spark, store, queries, 20,
                                coarse_k=60, nprobe=4).collect()
    oids = [r.id for r in out]
    assert len(oids) == len(set(oids))
    assert oids[0] == 85
    n = truncated_ivf_compact(spark, store, full_files=2)
    assert n == 120
    assert spark.read.parquet(f"{store}/_full").count() == 120
    srv.refresh()
    got2 = srv.topk(vecs[85], 20, nprobe=4, coarse_k=60)
    assert [(i, r) for i, _, r in got2] == [(i, r) for i, _, r in got]
