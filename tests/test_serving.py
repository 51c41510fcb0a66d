"""IndexServer (no-Spark-job serving) differential tests vs the Spark
probe path — same results, ~100× lower latency (reference p95 target:
``/root/reference/requirements.md:73``)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from lshrs_spark.core import LSHRS
from lshrs_spark.operators.probe import candidates_from_path
from lshrs_spark.operators.probe import top_k as probe_top_k
from lshrs_spark.serving import IndexServer


@pytest.fixture(scope="module")
def saved_index(spark, tmp_path_factory):
    rng = np.random.default_rng(99)
    n, d = 2000, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    lsh = LSHRS(spark, d, num_perm=32, num_bands=8, rows_per_band=4)
    lsh.index(list(range(n)), vecs)
    path = str(tmp_path_factory.mktemp("srv") / "idx")
    lsh.save_to_disk(path, include_vectors=True)
    return path, lsh, vecs, rng


def test_topk_matches_spark_probe(spark, saved_index):
    path, lsh, vecs, rng = saved_index
    for _ in range(8):
        q = vecs[rng.integers(0, len(vecs))] + 0.1 * rng.standard_normal(
            vecs.shape[1]
        ).astype(np.float32)
        srv = IndexServer.from_saved(path)
        served = srv.get_top_k(q, 10)
        cands = candidates_from_path(
            spark, os.path.join(path, "index.parquet"), q, lsh.cfg
        )
        via_spark = [
            r.id
            for r in probe_top_k(cands, 10).orderBy("rank").select("id").collect()
        ]
        assert served == via_spark


def test_topp_matches_lshrs_query(spark, saved_index):
    path, lsh, vecs, rng = saved_index
    srv = IndexServer.from_saved(path)
    for _ in range(5):
        q = vecs[rng.integers(0, len(vecs))] + 0.1 * rng.standard_normal(
            vecs.shape[1]
        ).astype(np.float32)
        served = srv.query(q, top_k=10, top_p=0.5)
        ref = lsh.query(q, top_k=10, top_p=0.5)
        assert [i for i, _ in served] == [i for i, _ in ref]
        assert all(
            abs(a - b) < 1e-5 for (_, a), (_, b) in zip(served, ref)
        )


def test_serving_latency_under_target(saved_index):
    path, _, vecs, _ = saved_index
    srv = IndexServer.from_saved(path)  # metadata warmed at construction
    srv.get_top_k(vecs[0], 10)
    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        srv.get_top_k(vecs[i % len(vecs)], 10)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p95 = lat[int(len(lat) * 0.95)]
    assert p95 < 0.100, f"serving p95 {p95 * 1e3:.1f} ms exceeds 100 ms target"


def test_empty_candidates_and_errors(spark, saved_index):
    path, lsh, vecs, _ = saved_index
    srv = IndexServer.from_saved(path)
    with pytest.raises(ValueError, match="dimension mismatch"):
        srv.get_top_k(np.ones(5, dtype=np.float32))
    with pytest.raises(ValueError, match="zero vector"):
        srv.get_top_k(np.zeros(32, dtype=np.float32))
    with pytest.raises(ValueError, match="top_k"):
        srv.get_top_k(vecs[0], 0)
    with pytest.raises(ValueError, match="top_p"):
        srv.query(vecs[0], top_p=1.5)


def test_query_empty_index_short_circuit(spark, tmp_path):
    """ADVICE r01 parity: empty candidate set -> [] in top_p mode even
    with no vector store registered (both LSHRS and IndexServer)."""
    d = 16
    lsh = LSHRS(spark, d, num_perm=16, num_bands=4, rows_per_band=4)
    lsh._vectors_df = None
    assert lsh.query(np.ones(d, dtype=np.float32), top_p=0.5) == []
    lsh.index([0], np.ones((1, d), dtype=np.float32))
    path = str(tmp_path / "novec")
    lsh.save_to_disk(path)  # no vectors stored
    srv = IndexServer.from_saved(path)
    # candidates exist but no vector table -> the documented RuntimeError
    with pytest.raises(RuntimeError, match="vector table"):
        srv.query(np.ones(d, dtype=np.float32), top_p=0.5)


# --------------------------------------------------------------------- #
# IVFServer: the ANN twin — stored IVF layout, no Spark job
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def ivf_store(spark, tmp_path_factory):
    from lshrs_spark.operators.knn import ivf_centroids_by_id, ivf_write_store

    rng = np.random.default_rng(123)
    n, d = 1500, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(df, 16)
    path = str(tmp_path_factory.mktemp("ivf") / "store")
    ivf_write_store(df, cents, path)
    return path, df, cents, vecs, rng


def test_ivf_server_matches_spark_stored_path(spark, ivf_store):
    from lshrs_spark.operators.knn import ivf_topk_stored
    from lshrs_spark.serving import IVFServer

    path, df, cents, vecs, rng = ivf_store
    srv = IVFServer.from_store(path)
    for qi in range(6):
        q = vecs[rng.integers(0, len(vecs))] + 0.05 * rng.standard_normal(
            vecs.shape[1]
        ).astype(np.float32)
        served = srv.topk(q, k=10, nprobe=4)
        qdf = spark.createDataFrame(
            [(0, [float(x) for x in q])], "qid long, qvec array<float>"
        )
        via_spark = [
            (r.id, r.score, r.rank)
            for r in ivf_topk_stored(spark, path, cents, qdf, 10, 4)
            .orderBy("rank").collect()
        ]
        assert [(i, r) for i, _, r in served] == [
            (i, r) for i, _, r in via_spark
        ]
        assert all(
            abs(a[1] - b[1]) < 1e-6 for a, b in zip(served, via_spark)
        )


def test_ivf_server_latency_and_pruning(ivf_store):
    import time

    from lshrs_spark.serving import IVFServer

    path, _, _, vecs, _ = ivf_store
    srv = IVFServer.from_store(path)
    srv.topk(vecs[0], 10, 4)  # warm
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        srv.topk(vecs[i], 10, 4)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    assert lat[int(len(lat) * 0.95)] < 0.100
    # pruning: nprobe partitions only -> far fewer rows read than corpus
    cids = srv.probe_centroids(vecs[0], 2)
    assert len(cids) == 2


# --------------------------------------------------------------------- #
# Continuous ingest -> serving: stream appends, refresh, compact
# --------------------------------------------------------------------- #

def test_streamed_index_serves_and_compacts(spark, tmp_path):
    import shutil

    from lshrs_spark.config import LSHConfig
    from lshrs_spark.operators.index import build_index, compact_index
    from lshrs_spark.operators.probe import candidates_from_path
    from lshrs_spark.operators.probe import top_k as probe_top_k
    from lshrs_spark.streaming.ingest import stream_index_vectors

    cfg = LSHConfig(dim=16, num_perm=16, num_bands=4, rows_per_band=4)
    rng = np.random.default_rng(77)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    df.filter("vec_id < 150").coalesce(1).write.parquet(str(src / "a.parquet"))
    df.filter("vec_id >= 150").coalesce(1).write.parquet(str(src / "b.parquet"))
    idx_path = str(tmp_path / "streamed_idx")
    q = stream_index_vectors(
        spark, f"{src}/*", idx_path, cfg,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # serving over the RAW streamed layout (no sort, no hive dirs)
    srv = IndexServer(idx_path, cfg)
    qv = vecs[7]
    want = [
        r.id for r in probe_top_k(
            candidates_from_path(spark, idx_path, qv, cfg), 5
        ).orderBy("rank").select("id").collect()
    ]
    assert srv.get_top_k(qv, 5) == want

    # compact into the sorted hive layout; same answers
    compact_path = str(tmp_path / "compacted_idx")
    compact_index(spark, idx_path, compact_path)
    srv2 = IndexServer(compact_path, cfg)
    assert srv2.get_top_k(qv, 5) == want

    # refresh() picks up post-construction appends
    extra = rng.standard_normal((50, 16)).astype(np.float32)
    df2 = spark.createDataFrame(
        [(1000 + i, v.tolist()) for i, v in enumerate(extra)],
        "vec_id long, embedding array<float>",
    )
    build_index(df2, cfg).write.mode("append").parquet(idx_path)
    srv.refresh()
    want2 = [
        r.id for r in probe_top_k(
            candidates_from_path(spark, idx_path, qv, cfg), 5
        ).orderBy("rank").select("id").collect()
    ]
    assert srv.get_top_k(qv, 5) == want2


def test_lshrs_serve_end_to_end(spark):
    """User-API glue: LSHRS.serve() returns a warm IndexServer whose
    answers match the Spark query path, including top-p rerank."""
    from lshrs_spark.core import LSHRS

    rng = np.random.default_rng(55)
    n, d = 800, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    lsh = LSHRS(spark, d, num_perm=16, num_bands=4, rows_per_band=4)
    lsh.index(list(range(n)), vecs)
    srv = lsh.serve()
    for i in (3, 77, 240):
        assert srv.get_top_k(vecs[i], 5) == lsh.get_top_k(vecs[i], 5)
    sp = srv.query(vecs[9], top_k=5, top_p=0.5)
    rp = lsh.query(vecs[9], top_k=5, top_p=0.5)
    assert [i for i, _ in sp] == [i for i, _ in rp]


def test_serving_binary_signatures(spark, tmp_path):
    """rows_per_band >= 64 -> binary sigs; pyarrow must prune/compare
    binary equality exactly like the Spark probe."""
    from lshrs_spark.core import LSHRS
    from lshrs_spark.operators.probe import candidates_from_path
    from lshrs_spark.operators.probe import top_k as probe_top_k

    rng = np.random.default_rng(88)
    n, d = 600, 24
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    lsh = LSHRS(spark, d, num_perm=128, num_bands=2, rows_per_band=64)
    assert not lsh.cfg.use_long_sig
    lsh.index(list(range(n)), vecs)
    path = str(tmp_path / "binidx")
    lsh.save_to_disk(path)
    srv = IndexServer.from_saved(path)
    for i in (0, 5, 99):
        want = [
            r.id for r in probe_top_k(
                candidates_from_path(
                    spark, os.path.join(path, "index.parquet"), vecs[i], lsh.cfg
                ), 5
            ).orderBy("rank").select("id").collect()
        ]
        assert srv.get_top_k(vecs[i], 5) == want


def test_delete_tombstones_visible_after_refresh(spark, tmp_path):
    """VERDICT r2 #4: a LSHRS.delete() on an index bound to a saved dir
    writes _deleted tombstones; a live IndexServer stops serving those
    ids at refresh(), with no full re-save; a later save_to_disk clears
    the sidecar."""
    rng = np.random.default_rng(17)
    n, d = 400, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    lsh = LSHRS(spark, d, num_perm=16, num_bands=4, rows_per_band=4)
    lsh.index(list(range(n)), vecs)
    path = str(tmp_path / "idx")
    lsh.save_to_disk(path, include_vectors=True)

    srv = IndexServer.from_saved(path)
    q = vecs[7]
    assert 7 in srv.get_top_k(q, 5)            # exact match serves itself

    lsh.delete([7])
    assert 7 in srv.get_top_k(q, 5)            # stale until refresh
    srv.refresh()
    assert 7 not in srv.get_top_k(q, 500)      # gone even with a huge k
    ids, _ = srv.candidate_counts(q)
    assert 7 not in ids
    assert 7 not in [i for i, _ in srv.query(q, top_k=10, top_p=1.0)]

    # the in-session index agrees with the server
    assert 7 not in [r.id for r in lsh.index_df.select("id").distinct().collect()]
    # load_from_disk applies outstanding tombstones
    reloaded = LSHRS.load_from_disk(spark, path)
    assert 7 not in [
        r.id for r in reloaded.index_df.select("id").distinct().collect()
    ]

    # a fresh save has the delete applied -> sidecar cleared
    lsh.save_to_disk(path, include_vectors=True)
    assert not os.path.exists(os.path.join(path, "_deleted"))
    srv2 = IndexServer.from_saved(path)
    assert srv2._deleted is None
    assert 7 not in srv2.get_top_k(q, 500)


def test_ivf_delete_tombstones_visible_after_refresh(spark, tmp_path):
    """IVF twin of the LSH tombstone contract: ivf_delete appends a
    _deleted sidecar; IVFServer drops those ids at refresh() without a
    store rewrite."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_delete,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(23)
    n, d = 300, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    store = str(tmp_path / "ivf")
    ivf_write_store(emb, ivf_centroids_by_id(emb, 8), store)
    srv = IVFServer.from_store(store)
    q = vecs[42]
    assert 42 in [i for i, _, _ in srv.topk(q, 5, nprobe=8)]

    ivf_delete(store, [42])
    assert 42 in [i for i, _, _ in srv.topk(q, 5, nprobe=8)]   # stale
    srv.refresh()
    got = srv.topk(q, n, nprobe=8)
    assert 42 not in [i for i, _, _ in got]
    assert len(got) == n - 1                                   # others intact


def test_ivf_compact_merges_tombstones(spark, tmp_path):
    """ivf_compact rewrites only the affected partitions, removes the
    _deleted sidecar, and serves identically afterwards — for both the
    Spark query path (ivf_topk_stored, tombstone-aware) and IVFServer."""
    import os

    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_compact,
        ivf_delete,
        ivf_topk_stored,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(29)
    n, d = 300, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    store = str(tmp_path / "ivf")
    cents = ivf_centroids_by_id(emb, 8)
    ivf_write_store(emb, cents, store)
    untouched = {
        p: sorted(os.listdir(os.path.join(store, p)))
        for p in os.listdir(store)
        if p.startswith("centroid_id=")
    }
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[42]]), (1, [float(x) for x in vecs[7]])],
        "qid long, qvec array<float>",
    )
    ivf_delete(store, [42, 43])
    affected = {f"centroid_id={r.centroid_id}" for r in spark.createDataFrame(
        [(42,), (43,)], "id long").join(
        spark.read.parquet(store).select("id", "centroid_id"), "id").collect()}
    # Spark path respects tombstones even BEFORE compaction
    pre = {(r.qid, r.id, round(r.score, 6), r.rank) for r in
           ivf_topk_stored(spark, store, cents, queries, 10, 8).collect()}
    assert not any(t[1] in (42, 43) for t in pre)

    ivf_compact(spark, store)
    assert not os.path.exists(os.path.join(store, "_deleted"))
    assert not any(p.startswith("_compact_tmp") for p in os.listdir(store))
    post = {(r.qid, r.id, round(r.score, 6), r.rank) for r in
            ivf_topk_stored(spark, store, cents, queries, 10, 8).collect()}
    assert post == pre                                 # serves identically
    ids_left = {r.id for r in spark.read.parquet(store).select("id").collect()}
    assert ids_left == set(range(n)) - {42, 43}
    srv = IVFServer.from_store(store)
    got = srv.topk(vecs[42], n, nprobe=8)
    assert 42 not in [i for i, _, _ in got] and len(got) == n - 2
    for p, files in untouched.items():
        if p not in affected and os.path.exists(os.path.join(store, p)):
            assert sorted(os.listdir(os.path.join(store, p))) == files, p


def test_ivf_compact_noop_without_tombstones(spark, tmp_path):
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_compact,
        ivf_write_store,
    )

    rng = np.random.default_rng(31)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in
         enumerate(rng.standard_normal((50, 8)).astype(np.float32))],
        "vec_id long, embedding array<float>",
    )
    store = str(tmp_path / "ivf")
    ivf_write_store(emb, ivf_centroids_by_id(emb, 4), store)
    ivf_compact(spark, store)   # no sidecar: no-op, no error
    assert spark.read.parquet(store).count() == 50


def test_pq_server_matches_spark_adc(spark, tmp_path):
    """PQServer (no Spark job) returns the same rows as the Spark ADC
    query over the same stored layout; ivf_delete tombstones apply at
    refresh()."""
    from lshrs_spark.operators.knn import (
        ivf_delete,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        pq_write_store,
    )
    from lshrs_spark.serving import PQServer

    rng = np.random.default_rng(53)
    n, dim = 400, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "pq")
    pq_write_store(emb, cb, store, m=4, dim=dim)

    q = [float(x) for x in vecs[7]]
    codes = pq_encode(emb, cb, m=4, dim=dim)
    want = [(r.id, r.dist2, r.rank) for r in
            pq_adc_topk(q, cb, codes, 10, m=4, dim=dim).collect()]
    srv = PQServer.from_store(store)
    got = srv.topk(np.array(q), 10)
    # ids + ranks exact; distances may differ by 1 ulp at the rounding
    # boundary (numpy einsum vs Spark's sequential fold, both pre-round)
    assert [(i, rk) for i, _, rk in got] == [(i, rk) for i, _, rk in want]
    assert all(abs(a[1] - b[1]) < 2e-5 for a, b in zip(got, want))

    top1 = got[0][0]
    ivf_delete(store, [top1])           # generic _deleted sidecar
    assert srv.topk(np.array(q), 10)[0][0] == top1   # stale until refresh
    srv.refresh()
    after = srv.topk(np.array(q), 10)
    assert all(i != top1 for i, _, _ in after)
    assert len(after) == 10


def test_ivfpq_server_matches_spark_stored_path(spark, tmp_path):
    """IVFPQServer == ivfpq_topk_stored over the same store (ids+ranks
    exact, distances within rounding ulp); partition pruning holds."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_topk_stored,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import IVFPQServer

    rng = np.random.default_rng(61)
    n, dim = 500, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(emb, 8)
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "ivfpq")
    ivfpq_write_store(emb, cents, cb, store, m=4, dim=dim)

    srv = IVFPQServer.from_store(store)
    for qi in (3, 77, 240):
        q = [float(x) for x in vecs[qi]]
        want = [(r.id, r.rank) for r in
                ivfpq_topk_stored(spark, store, cents, cb, q, 10, 3,
                                  m=4, dim=dim).orderBy("rank").collect()]
        got = srv.topk(np.array(q), 10, nprobe=3)
        assert [(i, rk) for i, _, rk in got] == want, qi
    # pruning: fewer partitions than centroids are touched
    assert len(srv.probe_centroids(vecs[0], 3)) == 3


def test_ivfpq_delete_and_compact(spark, tmp_path):
    """Tombstones apply to both the Spark IVFADC path and IVFPQServer;
    ivf_compact works unchanged on the code-table store (it only needs
    id + centroid_id) and serving is identical afterwards."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_compact,
        ivf_delete,
        ivfpq_topk_stored,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import IVFPQServer

    rng = np.random.default_rng(67)
    n, dim = 300, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(emb, 6)
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "ivfpq")
    ivfpq_write_store(emb, cents, cb, store, m=4, dim=dim)

    q = [float(x) for x in vecs[11]]
    first = ivfpq_topk_stored(spark, store, cents, cb, q, 5, 6,
                              m=4, dim=dim).orderBy("rank").first()
    ivf_delete(store, [int(first.id)])
    pre = [(r.id, r.rank) for r in
           ivfpq_topk_stored(spark, store, cents, cb, q, 5, 6,
                             m=4, dim=dim).orderBy("rank").collect()]
    assert all(i != first.id for i, _ in pre)      # Spark path tombstone-aware

    ivf_compact(spark, store)
    import os
    assert not os.path.exists(os.path.join(store, "_deleted"))
    post = [(r.id, r.rank) for r in
            ivfpq_topk_stored(spark, store, cents, cb, q, 5, 6,
                              m=4, dim=dim).orderBy("rank").collect()]
    assert post == pre
    srv = IVFPQServer.from_store(store)
    got = [(i, rk) for i, _, rk in srv.topk(np.array(q), 5, nprobe=6)]
    assert got == pre


def test_batch_topk_matches_per_query(saved_index):
    """get_top_k_batch must equal a per-query loop — same dedup of
    shared buckets, same (-collisions, id) ordering — and one scan."""
    path, lsh, vecs, rng = saved_index
    srv = IndexServer.from_saved(path)
    qs = [
        (vecs[rng.integers(0, len(vecs))]
         + 0.1 * rng.standard_normal(vecs.shape[1])).astype(np.float32)
        for _ in range(20)
    ] + [vecs[0], vecs[0]]  # duplicate queries share every bucket
    batch = srv.get_top_k_batch(qs, 10)
    solo = [srv.get_top_k(q, 10) for q in qs]
    assert batch == solo
    assert batch[-1] == batch[-2]
    assert srv.get_top_k_batch([], 10) == []
    with pytest.raises(ValueError, match="top_k"):
        srv.get_top_k_batch(qs[:1], 0)


def test_batch_topk_binary_sigs_and_tombstones(spark, tmp_path):
    from lshrs_spark.core import LSHRS

    rng = np.random.default_rng(77)
    n, d = 400, 24
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    lsh = LSHRS(spark, d, num_perm=128, num_bands=2, rows_per_band=64)
    assert not lsh.cfg.use_long_sig
    lsh.index(list(range(n)), vecs)
    path = str(tmp_path / "batchbin")
    lsh.save_to_disk(path)
    srv = IndexServer.from_saved(path)
    qs = [vecs[i] for i in (0, 3, 7)]
    assert srv.get_top_k_batch(qs, 5) == [srv.get_top_k(q, 5) for q in qs]
    # tombstone one id that currently serves for query 0
    victim = srv.get_top_k(vecs[0], 5)[0]
    lsh.delete([victim])
    srv.refresh()
    after = srv.get_top_k_batch(qs, 5)
    assert victim not in after[0]
    assert after == [srv.get_top_k(q, 5) for q in qs]


def test_ivf_batch_topk_matches_per_query(ivf_store):
    """topk_batch must equal the per-query loop exactly (same probed
    partitions, same (score desc, id asc) ordering, same floats)."""
    from lshrs_spark.serving import IVFServer

    path, df, cents, vecs, rng = ivf_store
    srv = IVFServer.from_store(path)
    qs = [
        (vecs[rng.integers(0, len(vecs))]
         + 0.1 * rng.standard_normal(vecs.shape[1])).astype(np.float32)
        for _ in range(12)
    ] + [vecs[0], vecs[0]]  # co-probed duplicates share the read
    batch = srv.topk_batch(qs, 10, nprobe=4)
    solo = [srv.topk(q, 10, nprobe=4) for q in qs]
    assert batch == solo
    assert batch[-1] == batch[-2]
    assert srv.topk_batch([], 10) == []


def test_ivfpq_batch_topk_matches_per_query(spark, tmp_path):
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import IVFPQServer

    rng = np.random.default_rng(62)
    n, dim = 400, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(emb, 8)
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "ivfpq_batch")
    ivfpq_write_store(emb, cents, cb, store, m=4, dim=dim)

    srv = IVFPQServer.from_store(store)
    qs = [vecs[i] for i in (3, 77, 240)] + [vecs[3]]
    batch = srv.topk_batch(qs, 10, nprobe=3)
    solo = [srv.topk(q, 10, nprobe=3) for q in qs]
    assert batch == solo          # bit-equal: fixed-extent ADC rows
    assert batch[0] == batch[-1]
    assert srv.topk_batch([], 10) == []


def test_ivf_tombstones_large_sidecar_no_isin_literal(spark, tmp_path):
    """VERDICT r4 #1: the stored-IVF tombstone filter must be an
    anti-join against the sidecar RELATION, never an `isin` literal
    whose plan size grows with the tombstone count (driver OOM under a
    GDPR-scale deletion workload). Asserted with a 10k-id sidecar: the
    query-path plan contains no isin/IN literal list, results match a
    manual anti-join, and ivf_compact handles the same sidecar."""
    from lshrs_spark.operators.knn import (
        _apply_ivf_tombstones,
        ivf_centroids_by_id,
        ivf_compact,
        ivf_delete,
        ivf_topk_stored,
        ivf_write_store,
    )

    rng = np.random.default_rng(31)
    n, d = 12_000, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    store = str(tmp_path / "ivf_big")
    cents = ivf_centroids_by_id(emb, 4)
    ivf_write_store(emb, cents, store)

    dead = list(range(0, 10_000))          # >= 10k tombstones, one batch
    ivf_delete(store, dead)

    scan = spark.read.parquet(store)
    filtered = _apply_ivf_tombstones(spark, scan, store)
    plan = filtered._jdf.queryExecution().toString()
    assert " IN (" not in plan and "isin" not in plan
    assert "LeftAnti" in plan.replace(" ", "")

    got = {r.id for r in filtered.select("id").collect()}
    assert got == set(range(10_000, 12_000))

    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[11_500]])], "qid long, qvec array<float>"
    )
    top = ivf_topk_stored(spark, store, cents, queries, 10, 4).collect()
    assert len(top) == 10 and all(r.id >= 10_000 for r in top)

    ivf_compact(spark, store)
    import os

    assert not os.path.exists(os.path.join(store, "_deleted"))
    left = {r.id for r in spark.read.parquet(store).select("id").collect()}
    assert left == set(range(10_000, 12_000))


def test_ivf_stored_filtered_ann_pushdown_and_results(spark, tmp_path):
    """Filtered ANN on the STORED layout: a metadata predicate passed
    as extra_filter reaches the parquet reader (PushedFilters) beside
    the centroid PartitionFilters, and results equal the in-memory
    ivf_topk over the pre-filtered corpus."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_topk,
        ivf_topk_stored,
        ivf_write_store,
    )

    rng = np.random.default_rng(37)
    n, d = 600, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], i % 5) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label long",
    )
    cents = ivf_centroids_by_id(emb, 8)
    store = str(tmp_path / "ivf_meta")
    ivf_write_store(emb, cents, store, extra_cols=["label"])

    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[123]])], "qid long, qvec array<float>"
    )
    from pyspark.sql import functions as F

    got = ivf_topk_stored(
        spark, store, cents, queries, 10, 8,
        extra_filter=F.col("label") == 2,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "EqualTo(label,2)" in plan
    assert "PartitionFilters" in plan

    want = ivf_topk(emb.filter(F.col("label") == 2), cents, queries, 10, 8)
    g = sorted((r.qid, r.id, round(r.score, 6), r.rank) for r in got.collect())
    w = sorted((r.qid, r.id, round(r.score, 6), r.rank) for r in want.collect())
    assert g == w and len(g) == 10
    assert all(t[1] % 5 == 2 for t in g)


def test_ivf_server_filtered_where_matches_spark_path(spark, tmp_path):
    """Filtered ANN at the SERVING layer: IVFServer.topk(where=) reads
    the same layout with the metadata predicate pushed into the
    pyarrow reader and returns the same rows as the Spark
    ivf_topk_stored(extra_filter=) path."""
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_topk_stored,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(41)
    n, d = 500, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label long",
    )
    cents = ivf_centroids_by_id(emb, 8)
    store = str(tmp_path / "ivf_where")
    ivf_write_store(emb, cents, store, extra_cols=["label"])

    srv = IVFServer.from_store(store)
    q = vecs[77]
    got = srv.topk(q, 10, nprobe=8, where=("label", 1))
    assert len(got) == 10 and all(i % 3 == 1 for i, _, _ in got)

    queries = spark.createDataFrame(
        [(0, [float(x) for x in q])], "qid long, qvec array<float>"
    )
    want = [
        (r.id, round(r.score, 9), r.rank)
        for r in ivf_topk_stored(
            spark, store, cents, queries, 10, 8,
            extra_filter=F.col("label") == 1,
        ).orderBy("rank").collect()
    ]
    assert [(i, round(s, 9), rk) for i, s, rk in got] == want

    # batch path agrees with the solo path under the same filter
    batch = srv.topk_batch([q, vecs[5]], 10, nprobe=8, where=("label", 1))
    assert batch[0] == got
    assert all(i % 3 == 1 for i, _, _ in batch[1])


def test_ivfpq_server_filtered_where(spark, tmp_path):
    """Filtered ANN on the IVFADC tier: metadata columns stored beside
    the code table; where= serves only eligible ids and equals the
    unfiltered result restricted to the predicate."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import IVFPQServer

    rng = np.random.default_rng(47)
    n, dim = 400, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], i % 4) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label long",
    )
    cents = ivf_centroids_by_id(emb, 8)
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "ivfpq_meta")
    ivfpq_write_store(emb, cents, cb, store, m=4, dim=dim,
                      extra_cols=["label"])

    srv = IVFPQServer.from_store(store)
    q = vecs[200]
    got = srv.topk(q, 10, nprobe=8, where=("label", 3))
    assert len(got) == 10 and all(i % 4 == 3 for i, _, _ in got)
    # equals the unfiltered ADC ranking restricted to eligible ids
    full = srv.topk(q, n, nprobe=8)
    want = [(i, d) for i, d, _ in full if i % 4 == 3][:10]
    assert [(i, d) for i, d, _ in got] == want


def test_bm25_server_matches_spark_scoring(spark, tmp_path):
    """No-Spark-job BM25 serving: BM25Server over the stored postings
    layout ranks identically to the Spark text_bm25_topk scoring
    expression for the same query terms (same formula, same
    association; scores compared to 1e-9 relative)."""
    import sys

    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    store = str(tmp_path / "bm25_idx")
    bm25_index_write(docs, store, num_buckets=16)

    srv = BM25Server(store)
    terms = ["vector", "hash", "join", "stream"]
    got = srv.search(terms, k=10)

    sys.path.insert(0, "/root/repo")
    import lshrs_spark.entries as entries

    want = [
        (r.doc_id, r.matched, r.bm25)
        for r in entries.QUERIES["text_bm25_topk"](spark, sf)
        .orderBy("bm25", ascending=False)
        .collect()
    ]
    # the entry rounds to 5 dp and orders desc by score / asc by id
    assert [(i, m) for i, m, _, _ in got] == [(i, m) for i, m, _ in want]
    for (_, _, s, _), (_, _, w) in zip(got, want):
        assert abs(s - w) < 5e-5 + 1e-9 * abs(w)   # 5-dp-rounded reference

    # term absent from the corpus contributes nothing and doesn't crash
    got2 = srv.search(["vector", "zzznotaterm"], k=5)
    assert len(got2) == 5 and all(m == 1 for _, m, _, _ in got2)


def test_pq_server_filtered_where(spark, tmp_path):
    """Filtered ANN on the flat-PQ tier: metadata columns ride in the
    code table; where= equals the unfiltered ADC ranking restricted to
    eligible ids."""
    from lshrs_spark.operators.knn import pq_codebooks, pq_write_store
    from lshrs_spark.serving import PQServer

    rng = np.random.default_rng(59)
    n, dim = 300, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], i % 2) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label long",
    )
    cb = pq_codebooks(emb, m=4, k=8, dim=dim, iterations=1)
    store = str(tmp_path / "pq_meta")
    pq_write_store(emb, cb, store, m=4, dim=dim, extra_cols=["label"])

    srv = PQServer.from_store(store)
    q = vecs[150]
    got = srv.topk(q, 10, where=("label", 0))
    assert len(got) == 10 and all(i % 2 == 0 for i, _, _ in got)
    full = srv.topk(q, n)
    want = [(i, d) for i, d, _ in full if i % 2 == 0][:10]
    assert [(i, d) for i, d, _ in got] == want


def test_bm25_server_phrase_matches_spark_phrase_search(spark, tmp_path):
    """Positional postings serve exact phrase queries; counts equal the
    Spark phrase_search operator (overlapping occurrences included)."""
    from lshrs_spark.functions.text import (
        bm25_index_write,
        phrase_search,
        token_postings,
    )
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [
            (1, "key scan key scan fast"),
            (2, "scan key nothing here"),
            (3, "a key scan a a a"),
            (4, "key key key"),
        ],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bm25_pos")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)

    got = srv.phrase(["key", "scan"])
    want = {
        r.id: r.n_matches
        for r in phrase_search(token_postings(docs), ["key", "scan"]).collect()
    }
    assert got == want == {1: 2, 3: 1}
    assert srv.phrase(["key", "key"]) == {4: 2}       # overlapping
    assert srv.phrase(["nothing", "missing"]) == {}
    # BM25 scoring still works on the positional layout
    assert len(srv.search(["key"], k=4)) == 4


def test_bm25_phrase_requires_positional_layout(spark, tmp_path):
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [(1, "key scan")], "doc_id long, text string"
    )
    store = str(tmp_path / "bm25_nopos")
    bm25_index_write(docs, store, num_buckets=4)   # no positions
    with pytest.raises(ValueError, match="store_positions"):
        BM25Server(store).phrase(["key", "scan"])


def test_index_server_eligible_ids_mask(spark, tmp_path):
    """LSH-tier filtered query: eligible_ids masks candidates before
    the top-k cut, so the result is the unfiltered ranking restricted
    to the eligible set (never an underfilled post-filter)."""
    from lshrs_spark.config import LSHConfig
    from lshrs_spark.operators.index import build_index, write_index
    from lshrs_spark.serving import IndexServer

    rng = np.random.default_rng(61)
    n, d = 400, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cfg = LSHConfig(dim=d, num_perm=64, num_bands=8, rows_per_band=8,
                    seed=42)
    store = str(tmp_path / "lsh_mask")
    write_index(build_index(emb, cfg, "vec_id", "embedding"), store)
    srv = IndexServer(store, cfg)

    q = vecs[42]
    evens = [i for i in range(n) if i % 2 == 0]
    got = srv.get_top_k(q, 10, eligible_ids=evens)
    assert all(i % 2 == 0 for i in got)
    full = srv.get_top_k(q, n)
    assert got == [i for i in full if i % 2 == 0][:10]


def test_review_fixes_bm25_and_ivfpq_batch_where(spark, tmp_path):
    """Code-review regressions: (a) duplicated query terms must not
    double a document's BM25 contribution; (b) IVFPQServer.topk_batch
    must honor where= like topk does; (c) bm25_index_write rejects
    append mode (it would corrupt the _stats corpus constants);
    (d) bench's p95_index generalizes lat[94] exactly."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import BM25Server, IVFPQServer

    docs = spark.createDataFrame(
        [(1, "key lock key"), (2, "key door")], "doc_id long, text string"
    )
    store = str(tmp_path / "bm25_dup")
    bm25_index_write(docs, store, num_buckets=4)
    srv = BM25Server(store)
    assert srv.search(["key", "key"], 5) == srv.search(["key"], 5)
    assert all(m == 1 for _, m, _, _ in srv.search(["key", "key"], 5))
    with pytest.raises(ValueError, match="overwrite"):
        bm25_index_write(docs, store, mode="append")

    rng = np.random.default_rng(67)
    n, dim = 200, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], i % 2) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label long",
    )
    cents = ivf_centroids_by_id(emb, 4)
    cb = pq_codebooks(emb, m=4, k=4, dim=dim, iterations=1)
    pstore = str(tmp_path / "ivfpq_where")
    ivfpq_write_store(emb, cents, cb, pstore, m=4, dim=dim,
                      extra_cols=["label"])
    psrv = IVFPQServer.from_store(pstore)
    q = vecs[100]
    batch = psrv.topk_batch([q], 10, nprobe=4, where=("label", 1))
    assert batch[0] == psrv.topk(q, 10, nprobe=4, where=("label", 1))
    assert all(i % 2 == 1 for i, _, _ in batch[0])

    import bench

    assert bench.p95_index(100) == 94
    assert bench.p95_index(20) == 18
    assert bench.p95_index(1) == 0


def test_bm25_server_rejects_mixed_num_buckets(spark, tmp_path):
    """ADVICE r5: epochs written with differing num_buckets would hash
    query terms to the wrong bucket for the other epochs and silently
    drop postings — the server must refuse to open such a layout."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [(1, "key scan"), (2, "key door")], "doc_id long, text string"
    )
    store = str(tmp_path / "bm25_mixed")
    bm25_index_write(docs, store, num_buckets=8)
    assert BM25Server(store).search(["key"], 2)   # consistent: serves fine
    # a second _stats row claiming a different bucket count (what a
    # stream_bm25_ingest epoch with the wrong default would leave)
    spark.createDataFrame(
        [(1, 5, 16)], "n_docs long, total_len long, num_buckets long"
    ).coalesce(1).write.parquet(f"{store}/_stats/epoch=9")
    with pytest.raises(ValueError, match="num_buckets"):
        BM25Server(store)


def test_bm25_server_empty_corpus_search_returns_empty(spark, tmp_path):
    """ADVICE r5: an index over zero documents must serve [] instead of
    raising ZeroDivisionError on the avg-doc-length divide."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame([], "doc_id long, text string")
    store = str(tmp_path / "bm25_empty")
    bm25_index_write(docs, store, num_buckets=4)
    assert BM25Server(store).search(["key", "scan"], 5) == []


def test_index_server_eligible_ids_precomputed_array(spark, tmp_path):
    """ADVICE r5: a precomputed int64 ndarray (prepare_eligible_ids) is
    consumed as-is — same result as the list form, no per-query set
    rebuild in the serving hot path."""
    from lshrs_spark.config import LSHConfig
    from lshrs_spark.operators.index import build_index, write_index
    from lshrs_spark.serving import IndexServer, prepare_eligible_ids

    rng = np.random.default_rng(71)
    n, d = 300, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cfg = LSHConfig(dim=d, num_perm=64, num_bands=8, rows_per_band=8,
                    seed=42)
    store = str(tmp_path / "lsh_prearr")
    write_index(build_index(emb, cfg, "vec_id", "embedding"), store)
    srv = IndexServer(store, cfg)

    evens = [i for i in range(n) if i % 2 == 0]
    pre = prepare_eligible_ids(evens + evens)     # dupes collapse
    assert pre.dtype == np.int64 and len(pre) == len(evens)
    assert np.all(pre[:-1] < pre[1:])             # sorted unique
    q = vecs[7]
    assert srv.get_top_k(q, 10, eligible_ids=pre) == srv.get_top_k(
        q, 10, eligible_ids=evens
    )
    # set / generator / dict-view inputs normalize too
    assert np.array_equal(prepare_eligible_ids(set(evens)), pre)
    assert np.array_equal(prepare_eligible_ids(i for i in evens), pre)
    assert np.array_equal(
        prepare_eligible_ids({i: None for i in evens}.keys()), pre
    )
    assert srv.get_top_k(q, 10, eligible_ids=(i for i in evens)) == \
        srv.get_top_k(q, 10, eligible_ids=evens)


def test_index_server_multiprobe_matches_spark_and_raises_recall(
    spark, tmp_path
):
    """Multi-probe serving: candidate sets are a superset of the
    exact-probe sets, collision counts agree with the Spark path fed
    the same perturbed probe rows, and the full-ranking contract
    (-collisions, id) holds."""
    from lshrs_spark.config import LSHConfig
    from lshrs_spark.operators.index import build_index, write_index
    from lshrs_spark.operators.probe import candidates, query_signatures_df
    from lshrs_spark.serving import IndexServer

    rng = np.random.default_rng(83)
    n, d = 400, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cfg = LSHConfig(dim=d, num_perm=64, num_bands=4, rows_per_band=16,
                    seed=42)
    idx = build_index(emb, cfg, "vec_id", "embedding")
    store = str(tmp_path / "lsh_multiprobe")
    write_index(idx, store)
    srv = IndexServer(store, cfg)

    for qi in (3, 77, 240):
        q = vecs[qi]
        ids0, c0 = srv.candidate_counts(q)
        ids2, c2 = srv.candidate_counts(q, multiprobe=2)
        assert set(ids0) <= set(ids2)            # superset, never fewer
        # spark path with the same perturbed probe rows agrees exactly
        sp = {
            (r.id, r.collisions)
            for r in candidates(
                idx,
                query_signatures_df(spark, q[None, :], cfg, multiprobe=2),
            ).collect()
        }
        assert {(int(i), int(c)) for i, c in zip(ids2, c2)} == sp
        got = srv.get_top_k(q, 10, multiprobe=2)
        order = np.argsort(-c2, kind="stable")[:10]
        assert got == [int(i) for i in ids2[order]]
    # across many queries, multiprobe candidates strictly grow somewhere
    grew = sum(
        len(srv.candidate_counts(vecs[i], multiprobe=2)[0])
        > len(srv.candidate_counts(vecs[i])[0])
        for i in range(0, 60, 3)
    )
    assert grew > 0
    # batch serving parity: result i == the single-query result
    batch = srv.get_top_k_batch([vecs[3], vecs[77], vecs[240]], 10,
                                multiprobe=2)
    assert batch == [
        srv.get_top_k(vecs[i], 10, multiprobe=2) for i in (3, 77, 240)
    ]
    # and the in-session LSHRS API carries the same knob end-to-end
    from lshrs_spark import LSHRS

    lsh = LSHRS(spark, d, num_perm=64, num_bands=4, rows_per_band=16,
                seed=42)
    lsh.index_dataframe(emb, "vec_id", "embedding")
    for qi in (3, 240):
        assert lsh.get_top_k(vecs[qi], 10, multiprobe=2) == srv.get_top_k(
            vecs[qi], 10, multiprobe=2
        )
    assert lsh.get_top_k_batch([vecs[3], vecs[240]], 10, multiprobe=2) == [
        srv.get_top_k(vecs[3], 10, multiprobe=2),
        srv.get_top_k(vecs[240], 10, multiprobe=2),
    ]


def test_bm25_search_batch_matches_and_shares_term_reads(spark, tmp_path):
    """search_batch result i == search(queries[i]) exactly, and each
    DISTINCT term across the batch is read from the postings layout
    once — the BM25 analogue of IndexServer.get_top_k_batch's shared
    pruned read."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    rows = [
        (i, f"alpha beta doc{i} " * 3 + ("vector hash " * (i % 3)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / "bm25_batchapi")
    bm25_index_write(docs, store, num_buckets=8)
    srv = BM25Server(store)

    queries = [
        ["vector", "hash"], ["alpha"], ["doc3", "beta"],
        ["alpha", "alpha", "vector"], ["zzzmissing"], [],
    ]
    want = [srv.search(t, 7) for t in queries]

    calls: list = []
    orig = srv._postings

    def counting(term, columns=("id", "tf", "dl"), extra_filter=None):
        calls.append(term)
        return orig(term, columns=columns, extra_filter=extra_filter)

    srv._postings = counting
    got = srv.search_batch(queries, 7)
    assert got == want
    assert sorted(calls) == sorted(set(calls))   # one read per term
    assert len(calls) == 6  # vector hash alpha doc3 beta zzzmissing
    # empty corpus: batch of empties
    empty = spark.createDataFrame([], "doc_id long, text string")
    estore = str(tmp_path / "bm25_batchapi_empty")
    bm25_index_write(empty, estore, num_buckets=4)
    assert BM25Server(estore).search_batch(queries, 5) == [[]] * len(queries)


def test_bm25_phrase_rarest_first_prunes_and_matches(spark, tmp_path):
    """VERDICT r5 #1 (served path): a phrase LEADING with a near-stop
    token must cost the rare token's postings, not the stop word's —
    terms intersect in ascending document frequency, and later (common)
    terms' positions are read only for surviving doc ids. Results are
    identical to phrase order."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    rows = [(i, "the filler the padding the noise") for i in range(50)]
    rows += [(100, "the quick brown fox"), (101, "a quick brown dog"),
             (102, "the slow brown fox the quick step")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / "bm25_rare")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)

    # df("the")=52, df("quick")=3, df("fox")=2
    assert srv._doc_freq("the") == 52 and srv._doc_freq("fox") == 2
    assert srv.phrase(["the", "quick"]) == {100: 1, 102: 1}
    assert srv.phrase(["the", "quick", "brown", "fox"]) == {100: 1}
    # reversed/offset phrasing still anchored to original positions
    assert srv.phrase(["quick", "brown", "fox"]) == {100: 1}
    assert srv.phrase(["the", "zzzmissing"]) == {}


def test_ivf_server_serves_mips_via_augmentation(spark, tmp_path):
    """End-to-end MIPS on the serving tier with ZERO serving changes:
    store the IVF layout over norm-AUGMENTED vectors, append 0 to the
    query, and the cosine-ranking IVFServer returns exactly the
    maximum-inner-product top-k (all partitions probed => exact; the
    reduction's monotonicity does the rest)."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_write_store,
        mips_augment,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(321)
    n, d = 800, 16
    vecs = rng.standard_normal((n, d)) * rng.uniform(0.2, 4.0, size=(n, 1))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    aug = mips_augment(df, out_col="avec")
    cents = ivf_centroids_by_id(aug, 8, vector_col="avec")
    path = str(tmp_path / "mips_store")
    ivf_write_store(aug, cents, path, vector_col="avec")
    srv = IVFServer.from_store(path)
    for _ in range(4):
        q = vecs[rng.integers(0, n)] + 0.05 * rng.standard_normal(d)
        served = srv.topk(np.append(q, 0.0), k=10, nprobe=8)
        dots = vecs @ q
        want = sorted(range(n), key=lambda i: (-dots[i], i))[:10]
        assert [i for i, _, _ in served] == want


def test_bm25_phrase_batch_matches_singles_one_read_per_term(spark, tmp_path):
    """VERDICT r6 #6: phrase_batch result i == phrase(phrases[i]), and
    the batch pays ONE positions read per DISTINCT term across the
    whole batch (counted by instrumenting _postings)."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [
            (1, "key scan key scan fast"),
            (2, "scan key nothing here"),
            (3, "a key scan a a a"),
            (4, "key key key"),
            (5, "fast scan a key"),
        ],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bm25_pos_batch")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)

    phrases = [
        ["key", "scan"], ["key", "key"], ["a", "a"],
        ["key", "scan"], ["nothing", "missing"], ["fast"],
    ]
    reads = []
    orig = srv._postings
    srv._postings = lambda *a, **kw: (reads.append(a[0]), orig(*a, **kw))[1]
    # max_cached_df=None: this test asserts the shared-cache guarantee
    # itself, so cache every term unconditionally (the default "auto"
    # cap routes every term of this 5-doc corpus to the pruned path)
    got = srv.phrase_batch(phrases, max_cached_df=None)
    srv._postings = orig
    # AT MOST one read per DISTINCT term (never per occurrence: 9 here);
    # lazily-loaded terms a dead phrase never reaches are skipped
    # entirely ("nothing" after "missing" empties the intersection).
    distinct = {t for p in phrases for t in p}
    assert len(reads) == len(set(reads)), "a term was read twice"
    assert set(reads) <= distinct
    assert "nothing" not in reads  # pruned by the early-empty break
    assert set(reads) >= distinct - {"nothing"}
    for res, p in zip(got, phrases):
        assert res == srv.phrase(p), p
    assert got[0] == {1: 2, 3: 1}
    assert got[1] == {4: 2}
    assert got[4] == {}

    with pytest.raises(ValueError, match="at least one token"):
        srv.phrase_batch([["key"], []])
    assert srv.phrase_batch([]) == []


def test_bm25_phrase_batch_df_cap_and_eviction(spark, tmp_path):
    """ADVICE r7: terms above ``max_cached_df`` bypass the shared batch
    cache and take the pruned per-phrase read (bounded by survivors,
    possibly multiple reads), while results stay identical; cached
    terms are released after their last phrase (instrumented by read
    pattern: a re-appearing cached term is still read only once)."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [(i, f"common rare{i % 3} common filler{i}") for i in range(12)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bm25_pos_cap")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)

    phrases = [["common", "rare0"], ["common", "rare1"],
               ["common", "rare0"]]
    uncapped = srv.phrase_batch(phrases, max_cached_df=None)

    reads = []
    orig = srv._postings
    srv._postings = lambda *a, **kw: (reads.append(a[0]), orig(*a, **kw))[1]
    capped = srv.phrase_batch(phrases, max_cached_df=6)
    srv._postings = orig

    assert capped == uncapped == [srv.phrase(p) for p in phrases]
    # "common" (df=12 > cap) is NON-leading (rare{i} df=4 leads under
    # rarest-first) so it takes the pruned per-phrase read — once per
    # DISTINCT phrase (r13 whole-phrase dedup: the repeated
    # ["common","rare0"] re-uses the first result, 2 reads not 3);
    # the rare terms stay cached: one read each despite rare0 repeating.
    assert reads.count("common") == 2
    assert reads.count("rare0") == 1
    assert reads.count("rare1") == 1


def test_bm25_phrase_batch_auto_cap_default(spark, tmp_path):
    """VERDICT r8 #7: the bounded-memory behavior is default-ON —
    ``max_cached_df="auto"`` derives the cap from the layout's own
    corpus stats (df > 5% of n_docs routes to the pruned per-phrase
    read), so a planted stop-word term's full positions list never
    enters the batch cache while results stay identical."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    # 100 docs; "the" in 60 (df 60% >> the 5% auto cap = 5 docs);
    # "quick" in 4 (under the cap -> cached); rare{i} in 2 each.
    def text(i):
        if i < 2:
            return "the quick rare0"
        if i < 4:
            return "the quick rare1"
        if i < 60:
            return "the stone"
        return "stone filler"

    docs = spark.createDataFrame(
        [(i, text(i)) for i in range(100)], "doc_id long, text string"
    )
    store = str(tmp_path / "bm25_pos_auto")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)
    assert srv._doc_freq("the") == 60

    phrases = [["the", "quick", "rare0"], ["the", "quick", "rare1"]]
    calls = []
    orig = srv._postings
    srv._postings = lambda *a, **kw: (
        calls.append((a[0], kw.get("extra_filter",
                                   a[2] if len(a) > 2 else None))),
        orig(*a, **kw),
    )[1]
    got = srv.phrase_batch(phrases)  # default: auto cap
    srv._postings = orig

    assert got == [srv.phrase(p) for p in phrases]
    the_reads = [f for t, f in calls if t == "the"]
    # read per-phrase (bypassed the cache)...
    assert len(the_reads) == len(phrases)
    # ...and every read carried the survivor pruning filter — the full
    # stop-word positions list was never materialized: rarest-first
    # ordering puts rare{i}/quick before "the", so survivors exist.
    assert all(f is not None for f in the_reads)
    # the cached side keeps the one-read-per-distinct-term guarantee
    assert [t for t, _ in calls].count("quick") == 1
    # explicit None still opts out (caches unconditionally)
    calls2 = []
    srv._postings = lambda *a, **kw: (calls2.append(a[0]),
                                      orig(*a, **kw))[1]
    assert srv.phrase_batch(phrases, max_cached_df=None) == got
    srv._postings = orig
    assert calls2.count("the") == 1


def test_bm25_phrase_batch_overflow_falls_back_to_single_path(
        spark, tmp_path):
    """r14: phrase_batch packs (doc id, shifted position) into one
    int64 key per posting position (vectorized intersection); a layout
    outside the packing envelope — ids at/above 2^42 — must fall back
    to the single-phrase set path and return identical results, not
    corrupt keys silently."""
    import pyarrow as pa

    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha beta alpha")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bm25_pos_ovf")
    bm25_index_write(docs, store, num_buckets=4, store_positions=True)
    srv = BM25Server(store)

    big = 1 << 50
    orig = srv._postings

    def shifted(term, columns=("id", "tf", "dl"), extra_filter=None):
        # shift ids BEFORE applying any survivor filter — the filter's
        # ids are from the shifted space the caller observed
        tbl = orig(term, columns=columns)
        if "positions" in tbl.schema.names:
            tbl = tbl.set_column(
                tbl.schema.get_field_index("id"), "id",
                pa.array([v + big for v in
                          tbl.column("id").to_pylist()], pa.int64()))
        if extra_filter is not None:
            tbl = tbl.filter(extra_filter)
        return tbl

    srv._postings = shifted
    phrases = [["alpha", "beta"], ["beta", "alpha"]]
    got = srv.phrase_batch(phrases, max_cached_df=None)
    singles = [srv.phrase(p) for p in phrases]
    srv._postings = orig
    assert got == singles
    # the shifted ids really did flow through (fallback, not a miss)
    assert all(d >= big for r in got for d in r)
    assert got[0] and got[1]


def test_bm25_phrase_batch_hot_slot_and_phrase_dedup(spark, tmp_path):
    """VERDICT r12 wrong #4: the capped batch amortization sat 4x over
    the uncapped control because an over-cap LEADING term re-read its
    full unpruned positions list for every phrase it led. Pins the two
    r13 fixes: (1) whole-phrase dedup — a repeated phrase costs zero
    extra reads; (2) the leading-term hot slot — one unpruned read per
    distinct over-cap lead per batch — plus the r14 second-term slot:
    a second-position over-cap term is read once per distinct
    (lead, second) group (pruned by the lead's doc set, which every
    phrase in the group shares), not once per phrase. Results must
    equal the single-phrase path in INPUT order despite grouped
    processing."""
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    def text(i):
        if i < 10:
            return "beta alpha end"
        if i < 20:
            return "alpha beta end"
        if i < 30:
            return "delta alpha end"
        return "alpha filler end"

    docs = spark.createDataFrame(
        [(i, text(i)) for i in range(40)], "doc_id long, text string"
    )
    store = str(tmp_path / "bm25_pos_hot")
    bm25_index_write(docs, store, num_buckets=8, store_positions=True)
    srv = BM25Server(store)
    # alpha df=40, beta df=20, delta df=10 — ALL over the cap of 5, so
    # every phrase leads with an over-cap term (beta or delta)
    phrases = [["beta", "alpha"], ["alpha", "beta"],
               ["delta", "alpha"], ["beta", "alpha"]]

    calls = []
    orig = srv._postings
    srv._postings = lambda *a, **kw: (
        calls.append((a[0], kw.get("extra_filter",
                                   a[2] if len(a) > 2 else None))),
        orig(*a, **kw),
    )[1]
    got = srv.phrase_batch(phrases, max_cached_df=5)
    srv._postings = orig

    # input-order results, identical to the single-phrase path — the
    # duplicate phrase fans out the same dict
    assert got == [srv.phrase(p) for p in phrases]
    assert got[0] == got[3] and got[0] and got[1] and got[2]
    # each distinct over-cap LEAD read exactly once, UNPRUNED (the hot
    # slot serves both beta-led distinct phrases); the duplicate
    # phrase added no reads at all
    beta_reads = [f for t, f in calls if t == "beta"]
    delta_reads = [f for t, f in calls if t == "delta"]
    assert len(beta_reads) == 1 and beta_reads[0] is None
    assert len(delta_reads) == 1 and delta_reads[0] is None
    # the second-position over-cap term shares ONE survivor-pruned
    # read per distinct (lead, second) group (r14): both beta-led
    # phrases reuse the beta-doc-pruned alpha map, the delta-led
    # phrase takes its own — 2 reads, every one survivor-filtered
    alpha_reads = [f for t, f in calls if t == "alpha"]
    assert len(alpha_reads) == 2
    assert all(f is not None for f in alpha_reads)


def test_truncated_ivf_server_matches_spark_two_stage(spark, tmp_path):
    """TruncatedIVFServer (coarse at stored truncated width + full-width
    rerank from the _full sidecar) returns the same ids/ranks as the
    Spark truncated_topk plan with the same centroids/nprobe/coarse_k,
    and the batch path equals per-query serving."""
    import numpy as np
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import (
        truncated_ivf_write_store,
        truncated_topk,
    )
    from lshrs_spark.serving import TruncatedIVFServer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "trunc_ivf")
    truncated_ivf_write_store(emb, 8, 16, path)
    srv = TruncatedIVFServer.from_store(path)
    assert srv._coarse_dims == 16

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    want: dict = {}
    for r in truncated_topk(
        emb, queries, 5, coarse_dims=16, coarse_k=20,
        num_centroids=8, nprobe=4,
    ).collect():
        want.setdefault(r.qid, []).append((r.rank, r.id, r.score))

    qvecs = [np.array(r.embedding, dtype=np.float32)
             for r in emb.filter(F.col("vec_id") < 5)
             .orderBy("vec_id").collect()]
    batch = srv.topk_batch(qvecs, 5, nprobe=4, coarse_k=20)
    for qid, q in enumerate(qvecs):
        got = srv.topk(q, 5, nprobe=4, coarse_k=20)
        w = sorted(want[qid])
        assert [(i, rk) for i, _, rk in got] == [(i, rk) for rk, i, _ in w]
        for (_, gs, _), (_, _, ws) in zip(got, w):
            assert gs == pytest.approx(ws, abs=1e-6)
        assert [(i, rk) for i, _, rk in batch[qid]] == \
            [(i, rk) for i, _, rk in got]

    # coarse_k = corpus: rerank is exhaustive -> exact brute-force order
    n = emb.count()
    full = srv.topk(qvecs[0], 5, nprobe=8, coarse_k=n)
    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in emb.collect()
    )
    q = qvecs[0].astype(np.float64)
    scores = [(i, float((v / np.linalg.norm(v)) @ (q / np.linalg.norm(q))))
              for i, v in rows]
    brute = sorted(scores, key=lambda t: (-t[1], t[0]))[:5]
    assert [i for i, _, _ in full] == [i for i, _ in brute]

    with pytest.raises(ValueError, match="coarse_k"):
        srv.topk(qvecs[0], 10, coarse_k=5)
    assert srv.topk_batch([], 5) == []
    with pytest.raises(ValueError, match="overwrite"):
        truncated_ivf_write_store(emb, 8, 16, path, mode="append")


def test_truncated_ivf_server_filtered_where(spark, tmp_path):
    """The filtered-ANN hook on the matryoshka tier: where=(col, value)
    masks candidates inside the pruned coarse read (extra_cols stored
    in the truncated layout), so results are exactly the unfiltered
    two-stage run restricted to eligible ids computed independently."""
    import numpy as np
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import truncated_ivf_write_store
    from lshrs_spark.serving import TruncatedIVFServer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "trunc_ivf_flt")
    truncated_ivf_write_store(emb, 8, 16, path, extra_cols=("label",))
    srv = TruncatedIVFServer.from_store(path)

    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    q = np.array(
        emb.filter("vec_id = 3").collect()[0].embedding, dtype=np.float32
    )
    n = emb.count()
    want_label = labels[3]
    # exhaustive coarse + all partitions: the filter is the ONLY pruning,
    # so the result must equal brute-force over eligible docs
    got = srv.topk(q, 5, nprobe=8, coarse_k=n, where=("label", want_label))
    assert got, "filtered query returned nothing"
    assert all(labels[i] == want_label for i, _, _ in got)
    rows = [(r.vec_id, np.array(r.embedding, dtype=np.float64))
            for r in emb.collect() if labels[r.vec_id] == want_label]
    qd = q.astype(np.float64) / np.linalg.norm(q)
    brute = sorted(
        ((i, float((v / np.linalg.norm(v)) @ qd)) for i, v in rows),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [i for i, _, _ in got] == [i for i, _ in brute]
    # batch twin agrees
    assert srv.topk_batch([q], 5, nprobe=8, coarse_k=n,
                          where=("label", want_label))[0] == got


def test_ivf_write_store_splits_hot_centroid_files(spark, tmp_path):
    """ADVICE r8: the co-located partitioned write funnels each
    centroid's rows into ONE task, so a skewed hot centroid needs the
    ``max_records_per_file`` safety valve — several right-sized files
    instead of one giant written by a straggler."""
    import glob

    from lshrs_spark.operators.knn import ivf_centroids_by_id, ivf_write_store

    # every vector points the same way -> all 300 rows land on one
    # centroid (ties broken by centroid_id asc): maximal skew
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids_by_id(df, 2)
    hot = str(tmp_path / "ivf_hot")
    ivf_write_store(df, cents, hot, max_records_per_file=100)
    files = glob.glob(f"{hot}/centroid_id=0/*.parquet")
    assert len(files) >= 3, files  # 300 rows / 100-record cap

    # default cap (4M records) leaves the co-located single file
    cold = str(tmp_path / "ivf_cold")
    ivf_write_store(df, cents, cold)
    assert len(glob.glob(f"{cold}/centroid_id=0/*.parquet")) == 1


def test_truncated_store_rowgroup_cap_is_per_write(spark, tmp_path):
    """VERDICT r8 #6 / ADVICE r8: the ``_full`` sidecar's row-group cap
    rides the write's own options, NOT the session-global Hadoop conf —
    a concurrent writer in the same SparkSession keeps default-sized
    row groups, and the session conf is untouched afterwards."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import truncated_ivf_write_store

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    before = hconf.get("parquet.block.size")

    emb = spark.range(3000).select(
        F.col("id").alias("vec_id"),
        F.expr("array_repeat(cast(id as double) / 3000.0 + 0.1, 32)")
        .alias("embedding"),
    )
    store = str(tmp_path / "trunc_conc")
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(
            truncated_ivf_write_store, emb, 4, 8, store,
            full_row_group_bytes=1 << 14,
        )
        # interleave plain writes in the foreground until the store
        # write completes — every one must keep default row groups
        other_paths = []
        i = 0
        while not fut.done() or i == 0:
            p = str(tmp_path / f"plain_{i}")
            spark.range(20000).selectExpr(
                "id", "array_repeat(cast(id as double), 16) v"
            ).coalesce(1).write.mode("overwrite").parquet(p)
            other_paths.append(p)
            i += 1
        fut.result()

    for p in other_paths:
        f = glob.glob(f"{p}/part-*.parquet")[0]
        # 20k rows ~ 3 MB << the 128 MB default block: exactly 1 group
        assert pq.ParquetFile(f).metadata.num_row_groups == 1, p

    # the sidecar itself DID get the small groups it asked for
    side = glob.glob(f"{store}/_full/part-*.parquet")
    assert side
    groups = sum(pq.ParquetFile(f).metadata.num_row_groups for f in side)
    assert groups >= 20, groups

    assert hconf.get("parquet.block.size") == before  # conf untouched


def test_truncated_ivf_append_serve_compact_roundtrip(spark, tmp_path):
    """VERDICT r8 #2: incremental maintenance for the matryoshka store.
    Append assigns against the EXISTING stored centroids (no retrain),
    a live server picks the batch up at refresh(), tombstones fold, and
    compaction returns the layout to canonical form — rankings at every
    stage identical to a from-scratch rebuild at the same centroid set
    (guaranteed here: the deterministic lowest-id centroid set lives
    entirely inside the base batch)."""
    import glob
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import (
        ivf_delete,
        truncated_ivf_append,
        truncated_ivf_compact,
        truncated_ivf_write_store,
    )
    from lshrs_spark.serving import TruncatedIVFServer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 300)
    batch = emb.filter(F.col("vec_id") >= 300)
    n_total, n_batch = emb.count(), batch.count()
    assert n_batch > 0
    inc = str(tmp_path / "trunc_inc")
    ref = str(tmp_path / "trunc_ref")
    truncated_ivf_write_store(base, 8, 16, inc, full_files=4)
    truncated_ivf_write_store(emb, 8, 16, ref, full_files=4)

    srv = TruncatedIVFServer.from_store(inc)  # opened BEFORE the append
    srv_ref = TruncatedIVFServer.from_store(ref)

    qvecs = [
        np.array(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("vec_id") % 97 == 0)
        .orderBy("vec_id").collect()
    ]
    assert len(qvecs) >= 5

    def serve(s):
        return [s.topk(q, 10, nprobe=4, coarse_k=40) for q in qvecs]

    def ids_ranks(res):
        return [[(i, rk) for i, _, rk in per_q] for per_q in res]

    pre = serve(srv)
    truncated_ivf_append(batch, inc, full_files=4)
    # a live server sees nothing until refresh() (dataset snapshot)
    assert serve(srv) == pre
    # append left the base _full files plus one 4-file segment
    assert len(glob.glob(f"{inc}/_full/part-*.parquet")) == 8

    srv.refresh()
    want = serve(srv_ref)
    got = serve(srv)
    assert ids_ranks(got) == ids_ranks(want)
    for gq, wq in zip(got, want):
        for (_, gs, _), (_, ws, _) in zip(gq, wq):
            assert gs == pytest.approx(ws, abs=1e-12)

    # an appended row is genuinely retrievable: its own vector returns
    # itself at rank 1 through the refreshed incremental store
    bid = int(batch.agg(F.min("vec_id")).collect()[0][0])
    bvec = np.array(
        batch.filter(F.col("vec_id") == bid).collect()[0].embedding,
        dtype=np.float64,
    )
    assert srv.topk(bvec, 1, nprobe=8, coarse_k=40)[0][0] == bid

    # tombstone an appended id; compact folds segments AND tombstones
    ivf_delete(inc, [bid])
    srv.refresh()
    after_del = serve(srv)
    n = truncated_ivf_compact(spark, inc, full_files=4)
    assert n == n_total - 1
    srv.refresh()
    post = serve(srv)
    assert ids_ranks(post) == ids_ranks(after_del)
    # canonical layout restored: one globally-sorted 4-file sidecar,
    # one co-located file per centroid dir, sidecars clean, no strays
    assert len(glob.glob(f"{inc}/_full/part-*.parquet")) == 4
    assert not os.path.exists(f"{inc}/_deleted")
    for d in glob.glob(f"{inc}/centroid_id=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    strays = [d for d in os.listdir(tmp_path)
              if d.startswith("trunc_inc.")]
    assert strays == []
    # the deleted row is gone, everything else still served identically
    assert srv.topk(bvec, 1, nprobe=8, coarse_k=40)[0][0] != bid

    # schema guard: extra_cols must match the stored layout
    with pytest.raises(ValueError, match="extra_cols mismatch"):
        truncated_ivf_append(
            batch.withColumn("flag", F.lit(1)), inc, extra_cols=("flag",)
        )
    # object-store schemes refused before any destructive step
    with pytest.raises(ValueError, match="non-local path"):
        truncated_ivf_compact(spark, "s3://bucket/store")


def test_ivfpq_append_matches_rebuild(spark, tmp_path):
    """ivfpq_append closes the last rebuild-only tier: codes come from
    the STORED codebooks and assignment from the STORED centroids
    (m/dim inferred from the sidecar — self-describing), so
    append == from-scratch rebuild at the same model, bit-equal through
    the server's ADC scoring; a live server sees the batch only at
    refresh(); extra_cols are schema-guarded."""
    import numpy as np
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_append,
        ivfpq_write_store,
        pq_codebooks,
    )
    from lshrs_spark.serving import IVFPQServer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter("vec_id < 300")
    batch = emb.filter("vec_id >= 300")
    cb = pq_codebooks(base, m=4, k=16, dim=64, iterations=1).cache()
    cb.count()
    cents = ivf_centroids_by_id(base, 8)
    ref = str(tmp_path / "pq_ref")
    inc = str(tmp_path / "pq_inc")
    ivfpq_write_store(emb, cents, cb, ref, 4, 64)
    ivfpq_write_store(base, cents, cb, inc, 4, 64)

    qvecs = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin([0, 150, 350, 499]))
        .collect()
    }
    srv = IVFPQServer.from_store(inc)       # opened BEFORE the append
    pre = srv.topk(qvecs[0], 10, 4)
    ivfpq_append(batch, inc)
    assert srv.topk(qvecs[0], 10, 4) == pre  # snapshot until refresh
    srv.refresh()
    srv_ref = IVFPQServer.from_store(ref)
    for qi, qv in qvecs.items():
        assert srv.topk(qv, 10, 4) == srv_ref.topk(qv, 10, 4), qi
    # an appended row's own vector retrieves it (nprobe=all partitions)
    got = [i for i, _, _ in srv.topk(qvecs[350], 5, 8)]
    assert 350 in got
    with pytest.raises(ValueError, match="extra_cols mismatch"):
        ivfpq_append(batch.withColumn("flag", F.lit(1)), inc,
                     extra_cols=("flag",))


def test_pq_append_matches_rebuild(spark, tmp_path):
    """pq_append (flat-PQ twin of ivfpq_append): codes from the stored
    codebooks, appended segment serves bit-equal to a rebuild at the
    same model after refresh(); extra_cols schema-guarded."""
    import numpy as np
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import (
        pq_append,
        pq_codebooks,
        pq_write_store,
    )
    from lshrs_spark.serving import PQServer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter("vec_id < 300")
    batch = emb.filter("vec_id >= 300")
    cb = pq_codebooks(base, m=4, k=16, dim=64, iterations=1).cache()
    cb.count()
    ref = str(tmp_path / "flatpq_ref")
    inc = str(tmp_path / "flatpq_inc")
    pq_write_store(emb, cb, ref, 4, 64)
    pq_write_store(base, cb, inc, 4, 64)
    srv = PQServer.from_store(inc)
    qv = np.array(
        emb.filter("vec_id = 350").collect()[0].embedding, dtype=np.float64
    )
    pre = srv.topk(qv, 10)
    pq_append(batch, inc)
    assert srv.topk(qv, 10) == pre          # snapshot until refresh
    srv.refresh()
    srv_ref = PQServer.from_store(ref)
    assert srv.topk(qv, 10) == srv_ref.topk(qv, 10)
    assert srv.topk(qv, 1)[0][0] == srv_ref.topk(qv, 1)[0][0]
    with pytest.raises(ValueError, match="extra_cols mismatch"):
        pq_append(batch.withColumn("flag", F.lit(1)), inc,
                  extra_cols=("flag",))


def test_ivf_server_mmr_matches_spark_operator(spark, ivf_store):
    """topk_mmr's greedy loop is pick-identical to the Spark
    mmr_rerank operator over the SAME shortlist (ids, raw scores and
    vectors lifted from the server's own scored-candidate pass)."""
    from lshrs_spark.operators.mmr import mmr_rerank
    from lshrs_spark.serving import IVFServer

    path, df, cents, vecs, rng = ivf_store
    srv = IVFServer.from_store(path)
    for qi in range(4):
        q = vecs[37 * qi + 5] + 0.05 * rng.standard_normal(
            vecs.shape[1]
        ).astype(np.float32)
        served = srv.topk_mmr(q, k=6, shortlist=25, nprobe=4, lam=0.5)
        assert [r for _, r, _ in served] == list(range(1, 7))
        # rebuild the identical shortlist from the server internals
        ids, svecs, scores = srv._scored_candidates(q, 4, None)
        fin = ~np.isnan(scores)
        ids, svecs, scores = ids[fin], svecs[fin], scores[fin]
        order = np.lexsort((ids, -scores))[:25]
        rows = [
            (0, int(ids[i]), [float(x) for x in svecs[i]],
             float(scores[i]))
            for i in order
        ]
        sdf = spark.createDataFrame(
            rows, "qid long, id long, vec array<double>, rel double"
        )
        via_spark = [
            (r.id, r.mmr_rank, r.mmr_score)
            for r in mmr_rerank(sdf, k=6, lam=0.5)
            .orderBy("mmr_rank").collect()
        ]
        assert served == via_spark


def test_ivf_server_mmr_diversifies_planted_duplicates(spark, tmp_path):
    """A store with a near-duplicate pair at the top: plain topk
    returns both copies back-to-back, topk_mmr pushes the copy down."""
    from lshrs_spark.operators.knn import ivf_centroids_by_id, ivf_write_store
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(7)
    d = 32
    q, w, u = np.linalg.qr(rng.standard_normal((d, 3)))[0].T
    base = rng.standard_normal((60, d))
    # ids 0/1: near-identical pair at cosine ~0.9 to q; id 2: cosine
    # 0.85 to q along a DIFFERENT off-q direction. At lam=0.5 the
    # duplicate's objective is 0.5*0.9 - 0.5*~1.0 < 0 while id 2 and
    # any moderately relevant diverse doc stay positive.
    base[0] = 0.9 * q + np.sqrt(1 - 0.81) * w
    base[1] = base[0] + 1e-4 * rng.standard_normal(d)
    base[2] = 0.85 * q + np.sqrt(1 - 0.7225) * u
    base = base.astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(df, 4)
    path = str(tmp_path / "dup_store")
    ivf_write_store(df, cents, path)
    srv = IVFServer.from_store(path)
    plain = [i for i, _, _ in srv.topk(q.astype(np.float32), 3, nprobe=4)]
    assert set(plain[:2]) == {0, 1}  # the duplicate pair crowds the top
    mmr = [i for i, _, _ in srv.topk_mmr(q.astype(np.float32), 3,
                                         shortlist=20, nprobe=4, lam=0.5)]
    assert mmr[0] in (0, 1)
    twin = 1 - mmr[0]
    assert twin not in mmr[:2]


def test_truncated_server_mmr_diversified_serving(spark, tmp_path):
    """topk_mmr on the matryoshka tier: greedy picks equal mmr_select
    over the full-width scores/vectors of topk's own shortlist (zero
    extra I/O), and rank 1 equals the relevance winner."""
    import numpy as np

    from lshrs_spark.operators.knn import truncated_ivf_write_store
    from lshrs_spark.serving import TruncatedIVFServer, mmr_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "trunc_mmr")
    truncated_ivf_write_store(emb, 8, 16, path)
    srv = TruncatedIVFServer.from_store(path)
    qrows = {r.vec_id: np.asarray(r.embedding, dtype=np.float32)
             for r in emb.filter("vec_id < 4").collect()}
    for qid, q in qrows.items():
        got = srv.topk_mmr(q, 5, nprobe=4, coarse_k=20, lam=0.5)
        assert [r for _, r, _ in got] == list(range(1, 6))
        # reconstruct the expected selection from topk's own shortlist
        short = srv.topk(q, 20, nprobe=4, coarse_k=20)
        ids = np.array([i for i, _, _ in short], dtype=np.int64)
        scores = np.array([s for _, s, _ in short], dtype=np.float64)
        fids, vecs = srv._fetch_full(np.sort(ids))
        pos = {int(i): j for j, i in enumerate(fids)}
        vv = np.stack([vecs[pos[int(i)]] for i in ids])
        want = mmr_select(ids, scores, vv, 5, lam=0.5)
        assert got == want
        # pick 1 is the pure relevance winner (self-retrieval: the
        # query IS a corpus vector)
        assert got[0][0] == short[0][0] == qid


def test_ivf_server_mmr_batch_matches_single(spark, ivf_store):
    from lshrs_spark.serving import IVFServer

    path, df, cents, vecs, rng = ivf_store
    srv = IVFServer.from_store(path)
    qs = [
        (vecs[13 * i + 2] + 0.04 * rng.standard_normal(
            vecs.shape[1]).astype(np.float32))
        for i in range(5)
    ]
    batch = srv.topk_mmr_batch(qs, 6, shortlist=25, nprobe=4, lam=0.5)
    for q, got in zip(qs, batch):
        assert got == srv.topk_mmr(q, 6, shortlist=25, nprobe=4, lam=0.5)


def test_bm25_store_report_flat_and_epoched(spark, tmp_path):
    """The keyword store's health card: on a flat batch layout the
    posting totals/bucket stats and corpus constants line up with the
    store's own tables and n_epochs is 0; on a streamed epoch layout
    (two epoch-keyed writes mirroring stream_bm25_ingest's sink) the
    card sums the per-epoch stats rows and reports the compaction debt."""
    from lshrs_spark.functions.text import (
        bm25_index_write,
        bm25_postings,
        bm25_stats_row,
        bm25_store_report,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} tok{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    flat = str(tmp_path / "flat")
    bm25_index_write(docs, flat, num_buckets=8)
    [card] = bm25_store_report(spark, flat).collect()
    n_postings = spark.read.parquet(flat).count()
    assert card.n_rows == n_postings and card.n_partitions <= 8
    assert card.num_buckets == 8 and card.n_epochs == 0
    assert card.bucket_count_drift is False
    assert card.n_docs == 40 and abs(card.avg_doc_len - 5.0) < 1e-9
    assert 0.0 <= card.gini < 1.0

    epoched = str(tmp_path / "epoched")
    for ep, frame in ((0, docs.filter("doc_id < 20")),
                      (1, docs.filter("doc_id >= 20"))):
        postings, dl = bm25_postings(frame, 8)
        postings.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{epoched}/epoch={ep}"
        )
        bm25_stats_row(dl, 8).coalesce(1).write.mode("overwrite").parquet(
            f"{epoched}/_stats/epoch={ep}"
        )
    [ecard] = bm25_store_report(spark, epoched).collect()
    assert ecard.n_epochs == 2 and ecard.n_docs == 40
    assert ecard.num_buckets == 8
    assert ecard.bucket_count_drift is False

    # ADVICE r10: epochs written with DIFFERENT bucket counts (the
    # drift bm25_compact repairs) — the card must report the max (the
    # count compaction rebuckets to), never an arbitrary first() row,
    # and raise the drift flag so a scheduler can alert
    drifted = str(tmp_path / "drifted")
    for ep, nb, frame in ((0, 4, docs.filter("doc_id < 20")),
                          (1, 16, docs.filter("doc_id >= 20"))):
        postings, dl = bm25_postings(frame, nb)
        postings.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{drifted}/epoch={ep}"
        )
        bm25_stats_row(dl, nb).coalesce(1).write.mode("overwrite").parquet(
            f"{drifted}/_stats/epoch={ep}"
        )
    [dcard] = bm25_store_report(spark, drifted).collect()
    assert dcard.num_buckets == 16
    assert dcard.bucket_count_drift is True
