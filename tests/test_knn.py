"""kNN tiers: brute force, IVF partition pruning, recall measurement."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators.knn import (
    brute_force_topk,
    ivf_assign,
    ivf_centroids_by_id,
    ivf_topk,
    recall_at_k,
)


@pytest.fixture()
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture()
def queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_brute_force_self_retrieval(emb, queries):
    out = brute_force_topk(emb, queries, 5)
    top1 = {r.qid: r.id for r in out.filter("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_ivf_assign_covers_all(emb):
    cents = ivf_centroids_by_id(emb, 8)
    assign = ivf_assign(emb, cents)
    assert assign.count() == emb.count()
    assert assign.select("centroid_id").distinct().count() <= 8
    # a centroid vector is assigned to itself
    self_rows = {r.id: r.centroid_id for r in assign.filter("id < 8").collect()}
    assert all(self_rows[i] == i for i in range(8))


def test_ivf_topk_finds_self(emb, queries):
    cents = ivf_centroids_by_id(emb, 8)
    out = ivf_topk(emb, cents, queries, k=5, nprobe=3)
    top1 = {r.qid: r.id for r in out.filter("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_recall_full_and_partial(spark):
    exact = spark.createDataFrame(
        [(0, i, i + 1) for i in range(10)], "qid long, id long, rank long"
    )
    assert recall_at_k(exact, exact, 10).collect()[0].recall == pytest.approx(1.0)
    half = spark.createDataFrame(
        [(0, i, i + 1) for i in range(5)] + [(0, 100 + i, 6 + i) for i in range(5)],
        "qid long, id long, rank long",
    )
    assert recall_at_k(half, exact, 10).collect()[0].recall == pytest.approx(0.5)


def test_kmeans_improves_over_id_sample(spark):
    """Lloyd's iterations must not worsen cosine inertia vs the id-sample
    init, and the centroids plug straight into ivf_topk."""
    from pyspark.sql import functions as F

    from lshrs_spark.functions.vector import cosine_similarity
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def inertia(cents):
        scored = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("cvec")).alias("cs"),
        )
        best = scored.groupBy("vec_id").agg(F.max("cs").alias("best"))
        return best.agg(F.avg("best")).first()[0]

    init = ivf_centroids_by_id(emb, 8)
    km = kmeans_centroids(emb, 8, iterations=2)
    assert km.count() <= 8  # empty centroids may drop
    assert inertia(km) >= inertia(init) - 1e-9
    # same downstream plan as any centroid set
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivf_topk(emb, km, queries, k=5, nprobe=2)
    assert out.count() == 5


def test_kmeans_deterministic(spark):
    from lshrs_spark.operators.knn import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_centroids(emb, 4, iterations=2).orderBy("centroid_id").collect()
    b = kmeans_centroids(emb, 4, iterations=2).orderBy("centroid_id").collect()
    assert [(r.centroid_id, r.cvec) for r in a] == [
        (r.centroid_id, r.cvec) for r in b
    ]


# --------------------------------------------------------------------- #
# Product quantization
# --------------------------------------------------------------------- #

def _cluster_vectors(spark, n_per=20, dim=16):
    """Two well-separated clusters around +1 and -1 poles."""
    import numpy as np

    rng = np.random.default_rng(47)
    a = 1.0 + 0.05 * rng.standard_normal((n_per, dim))
    b = -1.0 + 0.05 * rng.standard_normal((n_per, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(a)]
    rows += [(100 + i, [float(x) for x in v]) for i, v in enumerate(b)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), a


def test_pq_codebooks_shape_and_determinism(spark):
    from lshrs_spark.operators.knn import pq_codebooks

    df, _ = _cluster_vectors(spark)
    cb = pq_codebooks(df, m=4, k=4, dim=16, iterations=1)
    rows = cb.collect()
    assert len(rows) == 16                      # m=4 x k=4 (none empty here)
    assert all(len(r.cvec) == 4 for r in rows)  # dsub = 16/4
    again = {(r.j, r.code): tuple(r.cvec) for r in
             pq_codebooks(df, m=4, k=4, dim=16, iterations=1).collect()}
    assert {(r.j, r.code): tuple(r.cvec) for r in rows} == again


def test_pq_encode_identical_vectors_share_codes(spark):
    from lshrs_spark.operators.knn import pq_codebooks, pq_encode

    # ids 1 and 2 are the k=2 init centroids — one per pole, so the
    # codebook starts separated
    rows = [(1, [1.0] * 16), (2, [-1.0] * 16), (3, [-1.0] * 16), (4, [1.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_codebooks(df, m=4, k=2, dim=16, iterations=1)
    codes = {(r.id, r.j): r.code for r in pq_encode(df, cb, m=4, dim=16).collect()}
    assert len(codes) == 4 * 4                   # every (id, subspace) coded
    for j in range(4):
        assert codes[(1, j)] == codes[(4, j)]    # identical vectors
        assert codes[(2, j)] == codes[(3, j)]
        assert codes[(1, j)] != codes[(3, j)]    # opposite pole differs


def test_pq_adc_topk_finds_query_cluster(spark):
    from lshrs_spark.operators.knn import pq_adc_topk, pq_codebooks, pq_encode

    df, a = _cluster_vectors(spark)
    cb = pq_codebooks(df, m=4, k=4, dim=16, iterations=1)
    codes = pq_encode(df, cb, m=4, dim=16)
    got = pq_adc_topk([float(x) for x in a[0]], cb, codes, 10, m=4, dim=16).collect()
    assert [r.rank for r in got] == list(range(1, 11))
    assert all(r.id < 100 for r in got)          # all from the query's cluster
    assert got[0].dist2 <= got[-1].dist2


def test_refine_topk_matches_brute_force_on_full_shortlist(spark):
    from lshrs_spark.operators.knn import brute_force_topk, refine_topk

    df, a = _cluster_vectors(spark)
    q = [float(x) for x in a[0]]
    qdf = spark.createDataFrame([(0, q)], "qid long, qvec array<float>")
    exact = brute_force_topk(df, qdf, 5)
    # shortlist = ALL ids -> refine must reproduce the exact top-5
    shortlist = df.select(df.vec_id.alias("id"))
    got = refine_topk(shortlist, df, q, 5)
    exact_ids = [r.id for r in exact.orderBy("rank").collect()]
    got_ids = [r.id for r in got.orderBy("rank").collect()]
    assert got_ids == exact_ids
    got_scores = {r.id: r.score for r in got.collect()}
    exact_scores = {r.id: round(r.score, 5) for r in exact.collect()}
    for i in got_ids:
        assert got_scores[i] == pytest.approx(exact_scores[i], abs=1e-5)


def test_refine_topk_orders_by_exact_score_not_adc(spark):
    from lshrs_spark.operators.knn import (
        pq_adc_topk, pq_codebooks, pq_encode, refine_topk,
    )

    df, a = _cluster_vectors(spark)
    q = [float(x) for x in a[0]]
    cb = pq_codebooks(df, m=4, k=4, dim=16, iterations=1)
    codes = pq_encode(df, cb, m=4, dim=16)
    short = pq_adc_topk(q, cb, codes, 15, m=4, dim=16)
    got = refine_topk(short, df, q, 5).orderBy("rank").collect()
    assert len(got) == 5
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(r.id < 100 for r in got)          # query's cluster only


def test_mips_topk_matches_numpy_and_differs_from_cosine(spark):
    """Exact MIPS ranking == numpy argsort of raw dot products on
    vectors whose MAGNITUDES disagree with their directions — and on
    this construction the cosine top-1 is a different id, proving the
    operator really ranks by inner product, not normalized similarity."""
    from lshrs_spark.operators.knn import mips_topk

    rng = np.random.default_rng(7)
    base = rng.normal(size=(50, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = base[0]
    # id 1: nearly parallel to q but SHORT; id 2: 30-degrees off but LONG
    vecs = base.copy()
    vecs[1] = 0.1 * (q + 0.01 * base[3])
    vecs[2] = 5.0 * (np.cos(np.pi / 6) * q + np.sin(np.pi / 6) * base[4])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in q])], "qid long, qvec array<double>"
    )
    got = mips_topk(df, qdf, 10).orderBy("rank").collect()
    dots = vecs @ q
    want = sorted(range(50), key=lambda i: (-dots[i], i))[:10]
    assert [r.id for r in got] == want
    for r in got:
        assert r.score == pytest.approx(dots[r.id], rel=1e-9)
    assert got[0].id == 2                      # long vector wins MIPS
    cos = brute_force_topk(df, qdf, 1).collect()[0]
    assert cos.id != 2                         # ...but not cosine


def test_mips_augment_reduction_is_rank_exact(spark):
    """The norm-augmentation reduction: exact COSINE top-k over
    augmented vectors returns the identical (id, rank) list as exact
    MIPS over the originals — on every query of a random non-unit
    corpus. Also: augmented norms are constant at M, and the query
    augment appends exactly one zero."""
    from lshrs_spark.functions.vector import l2_norm
    from lshrs_spark.operators.knn import (
        mips_augment, mips_augment_query, mips_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 6)) * rng.uniform(0.2, 4.0, size=(60, 1))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(5)],
        "qid long, qvec array<double>",
    )
    aug = mips_augment(df, out_col="avec")
    norms = [
        r.n for r in aug.select(l2_norm(F.col("avec")).alias("n")).collect()
    ]
    m = float(np.abs(np.linalg.norm(vecs, axis=1)).max())
    assert all(n == pytest.approx(m, rel=1e-12) for n in norms)
    qa = mips_augment_query(qdf)
    row = qa.filter("qid = 0").collect()[0]
    assert len(row.qvec) == 7 and row.qvec[-1] == 0.0

    via_cosine = brute_force_topk(
        aug, qa, 10, vector_col="avec"
    ).select("qid", "id", "rank")
    direct = mips_topk(df, qdf, 10).select("qid", "id", "rank")
    assert sorted(map(tuple, via_cosine.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_mips_augment_explicit_cap_and_clamp(spark):
    """Passing max_norm skips the aggregate; a vector AT the cap gets a
    zero pad (clamped, not NaN)."""
    from lshrs_spark.operators.knn import mips_augment

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.3, 0.4])],
        "vec_id long, embedding array<double>",
    )
    aug = {r.vec_id: r.avec for r in mips_augment(
        df, out_col="avec", max_norm=5.0
    ).collect()}
    assert aug[0][-1] == pytest.approx(0.0)
    assert aug[1][-1] == pytest.approx(np.sqrt(25.0 - 0.25), rel=1e-12)


def test_truncated_topk_matches_numpy_two_stage(emb, queries):
    """VERDICT r7 #3: the matryoshka two-stage result equals a numpy
    replay — coarse top-C by cosine over the 16-dim prefix, exact
    full-width cosine rerank of only that shortlist. With coarse_k =
    corpus size the shortlist is everything, so the result collapses
    to brute_force_topk exactly."""
    from lshrs_spark.operators.knn import truncated_topk

    rows = sorted((r.vec_id, r.embedding) for r in emb.collect())
    ids = np.array([i for i, _ in rows])
    mat = np.array([v for _, v in rows], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    tunit = mat[:, :16] / np.linalg.norm(mat[:, :16], axis=1, keepdims=True)

    out = truncated_topk(emb, queries, 5, coarse_dims=16, coarse_k=20)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r.qid, []).append((r.rank, r.id, r.score))

    for qid in (0, 1, 2):
        q = mat[list(ids).index(qid)]
        qs = q[:16] / np.linalg.norm(q[:16])
        qf = q / np.linalg.norm(q)
        coarse_scores = tunit @ qs
        coarse = sorted(zip(ids, coarse_scores),
                        key=lambda t: (-t[1], t[0]))[:20]
        short = {i for i, _ in coarse}
        full = [(i, float(unit[list(ids).index(i)] @ qf)) for i in short]
        want = sorted(full, key=lambda t: (-t[1], t[0]))[:5]
        rows_q = sorted(got[qid])
        assert [i for _, i, _ in rows_q] == [i for i, _ in want], qid
        for (_, _, gs), (_, ws) in zip(rows_q, want):
            assert gs == pytest.approx(ws, abs=1e-6)

    # full-corpus shortlist == plain brute force (rerank is exhaustive)
    n = emb.count()
    all_in = truncated_topk(emb, queries, 5, coarse_dims=16, coarse_k=n)
    brute = brute_force_topk(emb, queries, 5)
    assert sorted((r.qid, r.rank, r.id) for r in all_in.collect()) == \
        sorted((r.qid, r.rank, r.id) for r in brute.collect())


def test_truncated_topk_ivf_coarse_and_validation(emb, queries):
    """The IVF-composed coarse stage returns the same shortlist
    semantics (subset of corpus, full-width scores, rank <= k) and
    hits high recall on this corpus; bad arguments raise."""
    from lshrs_spark.operators.knn import recall_at_k, truncated_topk

    out = truncated_topk(
        emb, queries, 5, coarse_dims=16, coarse_k=20,
        num_centroids=8, nprobe=4,
    )
    rows = out.collect()
    assert {r.qid for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in rows)
    # self-retrieval survives the composed pruning
    top1 = {r.qid: r.id for r in out.filter("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}
    exact = brute_force_topk(emb, queries, 5)
    rec = recall_at_k(out, exact, 5).collect()[0].recall
    # generic (non-MRL) embeddings on the tiny corpus: the 16/64 prefix
    # is genuinely lossy — the gauge exists to measure exactly that.
    # Assert the dials behave: probing ALL centroids removes the
    # partition-pruning loss (recall >= the pruned probe's), and a
    # full-corpus shortlist at full nprobe removes the coarse-cut loss.
    rec_all = recall_at_k(
        truncated_topk(emb, queries, 5, coarse_dims=16, coarse_k=20,
                       num_centroids=8, nprobe=8),
        exact, 5,
    ).collect()[0].recall
    assert rec_all >= rec > 0
    n = emb.count()
    rec_full = recall_at_k(
        truncated_topk(emb, queries, 5, coarse_dims=16, coarse_k=n,
                       num_centroids=8, nprobe=8),
        exact, 5,
    ).collect()[0].recall
    assert rec_full >= rec_all

    with pytest.raises(ValueError, match="coarse_k"):
        truncated_topk(emb, queries, 10, coarse_dims=16, coarse_k=5)
    with pytest.raises(ValueError, match="coarse_dims"):
        truncated_topk(emb, queries, 5, coarse_dims=0)


def test_truncated_topk_query_narrower_than_coarse_dims(emb, queries):
    """r15 single-collect: a query batch NARROWER than ``coarse_dims``
    skips the driver-derived truncated matrix (the numpy prefix slice
    would clamp where the coarse corpus slice does not) and falls back
    to the per-stage path — F.slice clamps BOTH sides to the query
    width, so the coarse stage still scores width-matched pairs and
    the full-width rerank nulls every score (16-wide query vs 64-wide
    corpus zip_with pads with NULL). Rows still come back ranked with
    NULL scores sorted last — the pre-change plan's exact semantics."""
    from pyspark.sql import functions as F

    from lshrs_spark.operators.knn import truncated_topk

    narrow = queries.select(
        "qid", F.slice("qvec", 1, 16).alias("qvec"))
    out = truncated_topk(emb, narrow, 3, coarse_dims=32, coarse_k=10)
    rows = out.collect()
    assert {r.qid for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in rows)
    # full-width rerank of a 16-wide query against the 64-wide corpus:
    # Catalyst's zip_with pads -> NULL scores, kernel must agree
    assert all(r.score is None for r in rows)


def test_ivf_split_centroid_skew_repair(spark, tmp_path):
    from lshrs_spark.operators.knn import (
        ivf_hot_centroids,
        ivf_split_centroid,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(11)
    d = 16
    dirs = np.linalg.qr(rng.standard_normal((d, 4)))[0].T
    vecs = np.empty((200, d), dtype=np.float32)
    for i in range(200):
        if i < 4:
            vecs[i] = dirs[i]          # centroid seeds: 4 distinct dirs
        elif i < 164:
            vecs[i] = dirs[0] + 0.05 * rng.standard_normal(d)  # hot blob
        else:
            vecs[i] = dirs[1 + i % 3] + 0.05 * rng.standard_normal(d)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_centroids_by_id(df, 4)
    path = str(tmp_path / "skewed")
    ivf_write_store(df, cents, path)

    hot = ivf_hot_centroids(spark, path, ratio=2.0)
    assert hot and hot[0][0] == 0 and hot[0][1] >= 160

    srv = IVFServer.from_store(path)
    q = (dirs[0] + 0.03 * rng.standard_normal(d)).astype(np.float32)
    pre = srv.topk(q, 10, nprobe=4)  # all partitions -> exact

    new_ids = ivf_split_centroid(spark, path, 0, n_splits=3)
    assert new_ids == [4, 5, 6]

    # rows preserved exactly, old partition gone, skew reduced
    post_df = spark.read.parquet(path)
    assert post_df.count() == 200
    sizes = {
        r.centroid_id: r.n
        for r in post_df.groupBy("centroid_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert 0 not in sizes and set(new_ids) <= set(sizes)
    assert max(sizes[c] for c in new_ids) < hot[0][1]
    assert sorted(r.vec_id for r in
                  post_df.select(F.col("id").alias("vec_id")).collect()) \
        == list(range(200))

    # exact-probe parity: probing every centroid before == after
    srv2 = IVFServer.from_store(path)
    post = srv2.topk(q, 10, nprobe=6)
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(pre, post))


def test_ivf_split_centroid_errors_and_healing(spark, tmp_path):
    import os

    from lshrs_spark.operators.knn import ivf_split_centroid, ivf_write_store

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "store")
    ivf_write_store(df, ivf_centroids_by_id(df, 2), path)

    with pytest.raises(ValueError, match="not present"):
        ivf_split_centroid(spark, path, 99, n_splits=2)
    with pytest.raises(ValueError, match="n_splits"):
        ivf_split_centroid(spark, path, 0, n_splits=1)

    ivf_split_centroid(spark, path, 0, n_splits=2)
    # simulate a crash that left the swapped-out directory behind:
    # re-running the split deletes it and reports no new centroids
    stale = os.path.join(path, "centroid_id=0")
    os.makedirs(stale, exist_ok=True)
    assert ivf_split_centroid(spark, path, 0, n_splits=2) == []
    assert not os.path.exists(stale)


def test_ivf_server_refresh_picks_up_split(spark, tmp_path):
    """A LIVE server across a split: before refresh it still probes the
    retired centroid id consistently (old sidecar view); after
    refresh() it probes the sub-centroids and full-probe results equal
    the pre-split exact answer — refresh must re-read _centroids, not
    just data files (a stale centroid set would probe a deleted
    directory and silently lose the split partition's rows)."""
    from lshrs_spark.operators.knn import ivf_split_centroid, ivf_write_store
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "live")
    ivf_write_store(df, ivf_centroids_by_id(df, 3), path)
    srv = IVFServer.from_store(path)
    q = vecs[50]
    pre = srv.topk(q, 8, nprobe=3)  # every partition -> exact
    new_ids = ivf_split_centroid(spark, path, 0, n_splits=2)
    assert new_ids == [3, 4]
    srv.refresh()
    assert sorted(srv._cids.tolist()) == [1, 2, 3, 4]
    post = srv.topk(q, 8, nprobe=4)  # every partition -> exact again
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]


def test_ivf_split_composes_with_truncated_store(spark, tmp_path):
    """The matryoshka tree IS an IVF store at coarse width (its tvec is
    aliased to 'embedding'), so hot-centroid splitting composes
    unchanged: split the truncated tree, leave the _full sidecar
    alone, refresh the server (inner IVFServer re-reads _centroids)
    and full-probe rankings are identical."""
    from lshrs_spark.operators.knn import (
        ivf_split_centroid,
        truncated_ivf_write_store,
    )
    from lshrs_spark.serving import TruncatedIVFServer

    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((150, 24)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "tstore")
    truncated_ivf_write_store(df, 3, 8, path)
    srv = TruncatedIVFServer.from_store(path)
    q = vecs[70]
    pre = srv.topk(q, 8, nprobe=3)
    new_ids = ivf_split_centroid(spark, path, 0, n_splits=2)
    assert new_ids == [3, 4]
    srv.refresh()
    assert sorted(srv._inner._cids.tolist()) == [1, 2, 3, 4]
    post = srv.topk(q, 8, nprobe=4)
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(pre, post))


def test_ivf_split_refuses_code_only_layouts(spark, tmp_path):
    """An IVFADC store holds codes, not vectors — splitting would need
    to re-encode from source vectors it doesn't have; the error says
    so instead of failing on a missing column."""
    from lshrs_spark.operators.knn import (
        ivf_split_centroid,
        ivfpq_write_store,
        pq_codebooks,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebooks(df, m=2, k=4, dim=16, iterations=1)
    path = str(tmp_path / "adc")
    ivfpq_write_store(df, ivf_centroids_by_id(df, 2), cb, path, m=2, dim=16)
    with pytest.raises(ValueError, match="code"):
        ivf_split_centroid(spark, path, 0, n_splits=2)


def test_ivf_maintain_balances_two_hot_store(spark, tmp_path):
    """VERDICT r9 missing #3: one ivf_maintain call detects ONCE and
    splits the top-N hot partitions — a planted TWO-hot-centroid store
    comes back balanced, rows exactly preserved, and a live server's
    refresh serves identical full-probe rankings."""
    from lshrs_spark.operators.knn import (
        ivf_hot_centroids,
        ivf_maintain,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(47)
    d = 16
    dirs = np.linalg.qr(rng.standard_normal((d, 6)))[0].T
    rows = [dirs[i] for i in range(6)]                 # centroid seeds
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(100)]
    rows += [dirs[1] + 0.05 * rng.standard_normal(d) for _ in range(80)]
    rows += [dirs[2 + i % 4] + 0.05 * rng.standard_normal(d)
             for i in range(24)]
    vecs = np.asarray(rows, dtype=np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "twohot")
    ivf_write_store(df, ivf_centroids_by_id(df, 6), path)

    srv = IVFServer.from_store(path)
    q = (dirs[0] + 0.03 * rng.standard_normal(d)).astype(np.float32)
    pre = srv.topk(q, 10, nprobe=6)  # all partitions -> exact

    log = ivf_maintain(spark, path, ratio=2.0, max_splits=2, n_splits=2)
    # both hot partitions split, largest first, detection ran ONCE
    assert [a["centroid_id"] for a in log] == [0, 1]
    assert log[0]["rows"] > log[1]["rows"] >= 80
    assert all(len(a["new_ids"]) == 2 for a in log)

    post_df = spark.read.parquet(path)
    assert post_df.count() == len(vecs)
    sizes = {r.centroid_id: r["count"]
             for r in post_df.groupBy("centroid_id").count().collect()}
    assert 0 not in sizes and 1 not in sizes
    # every sub-partition is strictly smaller than the hottest original
    # (each sub-centroid keeps at least its own seed row)
    assert max(sizes.values()) < log[0]["rows"]
    # balanced store: a maintain pass at the post-split dial is a no-op
    assert ivf_maintain(spark, path, ratio=4.0, max_splits=2) == []
    assert ivf_hot_centroids(spark, path, ratio=4.0) == []

    srv.refresh()
    post = srv.topk(q, 10, nprobe=len(sizes))  # all partitions -> exact
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]

    with pytest.raises(ValueError, match="max_splits"):
        ivf_maintain(spark, path, max_splits=0)


def test_ivf_split_sidecar_aside_healing(spark, tmp_path):
    """ADVICE r9: the sidecar swap is two renames with an aside copy —
    a crash between them (no live _centroids, complete aside on disk)
    is healed by the next split call, which restores the aside and
    sweeps dead stage trees before reading; a leftover aside NEXT TO a
    live sidecar (crash after the swap, before the aside delete) is
    swept without touching the live table."""
    import os

    from lshrs_spark.operators.knn import ivf_split_centroid, ivf_write_store

    rng = np.random.default_rng(53)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "heal")
    ivf_write_store(df, ivf_centroids_by_id(df, 3), path)

    # simulate the between-renames crash window: live sidecar moved
    # aside, a dead stage tree left behind
    live = os.path.join(path, "_centroids")
    os.rename(live, os.path.join(path, "_centroids_aside_dead"))
    os.makedirs(os.path.join(path, "_centroids_stage_dead"))
    assert not os.path.exists(live)

    new_ids = ivf_split_centroid(spark, path, 0, n_splits=2)
    assert new_ids == [3, 4]
    assert os.path.exists(live)
    leftovers = [n for n in os.listdir(path)
                 if n.startswith(("_centroids_aside_", "_centroids_stage_"))]
    assert leftovers == []
    assert spark.read.parquet(path).count() == 60

    # crash after the swap: stale aside beside a live sidecar is swept,
    # the live (post-split) table is kept — centroid 3 still splits
    os.makedirs(os.path.join(path, "_centroids_aside_stale"))
    new_ids = ivf_split_centroid(spark, path, 3, n_splits=2)
    assert new_ids == [5, 6]
    assert not os.path.exists(os.path.join(path, "_centroids_aside_stale"))
    assert spark.read.parquet(path).count() == 60


def test_ivf_split_rerun_overwrites_orphan_subpartition(spark, tmp_path):
    """ADVICE r9: a crash after the sub-partition moves but before the
    sidecar swap leaves centroid_id=N dirs the sidecar doesn't list;
    re-running the split must overwrite them (pyarrow's local move
    refuses to rename onto a non-empty directory) — the orphan's stale
    rows must NOT survive into the healed layout."""
    import os
    import shutil

    from lshrs_spark.operators.knn import ivf_split_centroid, ivf_write_store

    rng = np.random.default_rng(59)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "rerun")
    ivf_write_store(df, ivf_centroids_by_id(df, 2), path)

    # orphan: a valid-parquet sub-partition dir at the id the split will
    # allocate (2), not listed in the sidecar — exactly what a crashed
    # earlier split run leaves behind
    shutil.copytree(
        os.path.join(path, "centroid_id=1"),
        os.path.join(path, "centroid_id=2"),
    )
    new_ids = ivf_split_centroid(spark, path, 0, n_splits=2)
    assert new_ids == [2, 3]
    post = spark.read.parquet(path)
    # the orphan's duplicate rows are gone: every id exactly once
    assert post.count() == 50
    assert sorted(r.id for r in post.select("id").collect()) == list(range(50))


def test_retrieval_metrics_hand_case(spark):
    """Hand-computed recall/MRR/nDCG: query 1 returns truth at ranks
    1 and 3 with a miss at 2 (dcg = 1 + 0.5, idcg = 1 + 1/log2(3) +
    0.5); query 2 returns nothing true."""
    from lshrs_spark.operators.knn import retrieval_metrics

    exact = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3),
         (2, 4, 1), (2, 5, 2), (2, 6, 3)],
        "qid long, id long, rank long",
    )
    approx = spark.createDataFrame(
        [(1, 1, 1), (1, 9, 2), (1, 3, 3),
         (2, 7, 1), (2, 8, 2), (2, 9, 3)],
        "qid long, id long, rank long",
    )
    [row] = retrieval_metrics(approx, exact, 3).collect()
    assert abs(row.recall - 0.33333) < 1e-9
    assert abs(row.mrr - 0.5) < 1e-9
    idcg = 1.0 + 1.0 / np.log2(3.0) + 0.5
    want = round(((1.0 + 0.5) / idcg + 0.0) / 2.0, 5)
    assert abs(row.ndcg - want) < 1e-9

    # perfect ranking scores 1.0 on all three
    [p] = retrieval_metrics(exact, exact, 3).collect()
    assert (p.recall, p.mrr, p.ndcg) == (1.0, 1.0, 1.0)


def test_ivf_append_equals_rebuild_and_serves(spark, tmp_path):
    """Plain-IVF append matrix completion: appending against the STORED
    centroid set yields the exact per-partition row sets of a
    from-scratch rebuild at the same centroids, a live server picks the
    batch up at refresh() with full-probe parity, and a schema-mismatch
    append refuses."""
    from lshrs_spark.operators.knn import (
        brute_force_topk,
        ivf_append,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(61)
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    base, batch = df.filter("vec_id < 80"), df.filter("vec_id >= 80")
    path = str(tmp_path / "appendable")
    ivf_write_store(base, ivf_centroids_by_id(base, 3), path)
    srv = IVFServer.from_store(path)
    ivf_append(batch, path)

    rebuilt = str(tmp_path / "rebuilt")
    # same centroid set: ivf_centroids_by_id is lowest-id deterministic
    ivf_write_store(df, ivf_centroids_by_id(df, 3), rebuilt)
    got = sorted(
        (r.id, r.centroid_id)
        for r in spark.read.parquet(path).select("id", "centroid_id").collect()
    )
    want = sorted(
        (r.id, r.centroid_id)
        for r in spark.read.parquet(rebuilt).select("id", "centroid_id").collect()
    )
    assert got == want and len(got) == 120

    srv.refresh()
    q = vecs[100]
    post = srv.topk(q, 8, nprobe=3)  # all partitions -> exact
    truth = brute_force_topk(
        df,
        spark.createDataFrame([(0, q.tolist())], "qid long, qvec array<float>"),
        8,
    ).collect()
    assert [i for i, _, _ in post] == [r.id for r in truth]

    with pytest.raises(ValueError, match="extra_cols mismatch"):
        ivf_append(
            batch.withColumn("lang", F.lit("en")), path, extra_cols=("lang",)
        )


def test_ivf_compact_folds_appended_files(spark, tmp_path):
    """LSM fold for the plain-IVF append path: three appends leave
    multiple files per partition; ivf_compact(min_files=1) folds every
    fat partition back to one file with rankings unchanged, while the
    default (tombstone-only) call stays a no-op on an append-only
    store."""
    import os

    from lshrs_spark.operators.knn import (
        ivf_append,
        ivf_compact,
        ivf_write_store,
    )
    from lshrs_spark.serving import IVFServer

    rng = np.random.default_rng(67)
    vecs = rng.standard_normal((160, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "lsm")
    ivf_write_store(df.filter("vec_id < 40"), ivf_centroids_by_id(df, 3), path)
    for lo, hi in ((40, 80), (80, 120), (120, 160)):
        ivf_append(df.filter(f"vec_id >= {lo} and vec_id < {hi}"), path)

    def files_per_part():
        return {
            d: len([f for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")])
            for d in os.listdir(path) if d.startswith("centroid_id=")
        }

    before = files_per_part()
    assert max(before.values()) > 1  # appends accumulated files

    # tombstone-only default: no-op on an append-only store
    ivf_compact(spark, path)
    assert files_per_part() == before

    srv = IVFServer.from_store(path)
    q = vecs[10]
    pre = srv.topk(q, 8, nprobe=3)
    ivf_compact(spark, path, min_files=1)
    after = files_per_part()
    assert set(after) == set(before) and max(after.values()) == 1
    assert spark.read.parquet(path).count() == 160
    srv.refresh()
    post = srv.topk(q, 8, nprobe=3)
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(pre, post))


def test_ivf_balance_report_reads_health(spark, tmp_path):
    """The health card: a planted hot store reports n_hot >= 1 and a
    clearly higher Gini than a balanced store built from the same rows;
    tombstoning raises n_tombstones without touching physical counts."""
    from lshrs_spark.operators.knn import (
        ivf_balance_report,
        ivf_delete,
        ivf_write_store,
    )

    rng = np.random.default_rng(73)
    d = 12
    dirs = np.linalg.qr(rng.standard_normal((d, 4)))[0].T
    rows = [dirs[i] for i in range(4)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(90)]
    rows += [dirs[1 + i % 3] + 0.05 * rng.standard_normal(d)
             for i in range(18)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    hot_store = str(tmp_path / "hot")
    ivf_write_store(df, ivf_centroids_by_id(df, 4), hot_store)
    [card] = ivf_balance_report(spark, hot_store, ratio=2.0).collect()
    assert card.n_rows == 112 and card.n_partitions == 4
    assert card.max_rows >= 90 and card.max_mean_ratio > 3.0
    assert card.n_hot >= 1 and card.gini > 0.4
    assert card.n_tombstones == 0 and card.n_heal_pending == 0

    ivf_delete(hot_store, [5, 6])
    [card2] = ivf_balance_report(spark, hot_store, ratio=2.0).collect()
    assert card2.n_tombstones == 2
    assert card2.n_rows == 112  # physical rows until compaction

    flat_store = str(tmp_path / "flat")
    flat = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(rng.standard_normal((112, d)).astype(np.float32))],
        "vec_id long, embedding array<float>",
    )
    ivf_write_store(flat, ivf_centroids_by_id(flat, 4), flat_store)
    [fcard] = ivf_balance_report(spark, flat_store, ratio=2.0).collect()
    assert fcard.gini < card.gini


def test_ivf_balance_report_on_truncated_store(spark, tmp_path):
    """The matryoshka tree is an IVF store at coarse width (its `_full`
    sidecar is invisible to dataset discovery), so the health card
    applies unchanged — partition stats come from the truncated tree
    only."""
    from lshrs_spark.operators.knn import (
        ivf_balance_report,
        truncated_ivf_write_store,
    )

    rng = np.random.default_rng(79)
    vecs = rng.standard_normal((100, 24)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "tcard")
    truncated_ivf_write_store(df, 4, 8, path)
    [card] = ivf_balance_report(spark, path).collect()
    # truncated rows only — the 100-row _full sidecar must NOT double in
    assert card.n_rows == 100 and card.n_partitions == 4
    assert card.n_tombstones == 0


def test_ivf_balance_report_on_code_store(spark, tmp_path):
    """The health card needs only the partition column, so it applies
    unchanged to an IVFADC code-table store (codes, no vectors)."""
    from lshrs_spark.operators.knn import (
        ivf_balance_report,
        ivfpq_write_store,
        pq_codebooks,
    )

    rng = np.random.default_rng(97)
    vecs = rng.standard_normal((80, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebooks(df, m=2, k=4, dim=16, iterations=1)
    path = str(tmp_path / "adccard")
    ivfpq_write_store(df, ivf_centroids_by_id(df, 4), cb, path, m=2, dim=16)
    [card] = ivf_balance_report(spark, path).collect()
    assert card.n_rows == 80 and card.n_partitions == 4
    assert card.n_tombstones == 0 and 0.0 <= card.gini < 1.0


def test_truncated_ivf_maintain_splits_then_folds(spark, tmp_path):
    """The matryoshka nightly unit: one call splits the planted hot
    coarse partition AND folds the append-accumulated _full segments,
    with served rankings identical before and after (compaction copies
    centroids verbatim, so the split survives the fold)."""
    import os

    from lshrs_spark.operators.knn import (
        truncated_ivf_append,
        truncated_ivf_maintain,
        truncated_ivf_write_store,
    )
    from lshrs_spark.serving import TruncatedIVFServer

    rng = np.random.default_rng(101)
    d = 24
    dirs = np.linalg.qr(rng.standard_normal((d, 3)))[0].T
    rows = [dirs[i] for i in range(3)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(87)]
    rows += [dirs[1 + i % 2] + 0.05 * rng.standard_normal(d)
             for i in range(30)]
    vecs = np.asarray(rows, np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "tmaint")
    truncated_ivf_write_store(df.filter("vec_id < 60"), 3, 8, path)
    truncated_ivf_append(df.filter("vec_id >= 60 and vec_id < 90"), path)
    truncated_ivf_append(df.filter("vec_id >= 90"), path)

    def full_files():
        return len([f for f in os.listdir(os.path.join(path, "_full"))
                    if f.endswith(".parquet")])

    assert full_files() > 8  # two appended segments on top of the base

    srv = TruncatedIVFServer.from_store(path)
    q = (dirs[0] + 0.03 * rng.standard_normal(d)).astype(np.float32)
    pre = srv.topk(q, 10, nprobe=3)  # every partition -> exact

    log = truncated_ivf_maintain(
        spark, path, ratio=2.0, max_splits=1, n_splits=2,
        compact_min_full_files=8,
    )
    assert [a["centroid_id"] for a in log["splits"]] == [0]
    assert log["full_files"] > 8 and log["compacted_rows"] == 120
    assert full_files() <= 8  # folded back to one canonical segment

    srv.refresh()
    sizes = {r.centroid_id: r["count"] for r in
             spark.read.parquet(path).groupBy("centroid_id").count().collect()}
    assert 0 not in sizes and len(sizes) == 4  # split survived the fold
    post = srv.topk(q, 10, nprobe=4)  # every partition -> exact
    assert [(i, r) for i, _, r in pre] == [(i, r) for i, _, r in post]

    # healthy store: second pass is a no-op on every axis
    log2 = truncated_ivf_maintain(
        spark, path, ratio=4.0, max_splits=1, compact_min_full_files=8,
    )
    assert log2["splits"] == [] and log2["compacted_rows"] is None
    assert log2["full_files"] <= 8


def test_ivf_compact_aside_healing(spark, tmp_path):
    """The compact swap is now a per-partition aside rename: a crash
    between the renames (live dir missing, complete aside on disk) is
    healed at the start of the next compact, dead _compact_tmp trees
    are swept, and a stale aside next to a live dir is dropped without
    touching it — a partition can no longer be lost outright."""
    import os

    from lshrs_spark.operators.knn import ivf_compact, ivf_write_store

    rng = np.random.default_rng(103)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "chealing")
    ivf_write_store(df, ivf_centroids_by_id(df, 3), path)

    # crash window: partition 0 moved aside, a dead tmp tree left
    os.rename(os.path.join(path, "centroid_id=0"),
              os.path.join(path, "_compact_aside_dead_0"))
    os.makedirs(os.path.join(path, "_compact_tmp_dead"))
    ivf_compact(spark, path)  # healing runs even with nothing to fold
    assert os.path.isdir(os.path.join(path, "centroid_id=0"))
    assert not any(n.startswith(("_compact_aside_", "_compact_tmp_"))
                   for n in os.listdir(path))
    assert spark.read.parquet(path).count() == 60

    # stale aside beside a LIVE partition: swept, live kept
    os.makedirs(os.path.join(path, "_compact_aside_stale_1"))
    ivf_compact(spark, path, min_files=1000)  # no-op fold
    assert not os.path.exists(os.path.join(path, "_compact_aside_stale_1"))
    assert spark.read.parquet(path).count() == 60


def test_ivf_maintain_heals_orphans_before_detection(spark, tmp_path):
    """A split that crashed around its sidecar swap leaves duplicated
    partition dirs the sidecar doesn't list; maintain must sweep them
    BEFORE detecting, or it ranks phantom ids and burns its split
    budget on no-op splits."""
    import os
    import shutil

    from lshrs_spark.operators.knn import ivf_maintain, ivf_write_store

    rng = np.random.default_rng(107)
    d = 8
    dirs = np.linalg.qr(rng.standard_normal((d, 3)))[0].T
    rows = [dirs[i] for i in range(3)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(60)]
    rows += [dirs[1 + i % 2] + 0.05 * rng.standard_normal(d)
             for i in range(12)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "orphaned")
    ivf_write_store(df, ivf_centroids_by_id(df, 3), path)
    # orphan = a full copy of the HOTTEST partition at an unlisted id —
    # naive detection would rank it first and no-op on it
    shutil.copytree(os.path.join(path, "centroid_id=0"),
                    os.path.join(path, "centroid_id=99"))

    log = ivf_maintain(spark, path, ratio=0.0, max_splits=1, n_splits=2)
    assert not os.path.exists(os.path.join(path, "centroid_id=99"))
    assert len(log) == 1 and log[0]["centroid_id"] == 0
    assert log[0]["new_ids"] == [3, 4]
    assert spark.read.parquet(path).count() == 75  # orphan rows gone


def test_ivf_maintain_heals_compact_residue_first(spark, tmp_path):
    """ADVICE r10: a COMPACT crash between its aside renames leaves a
    sidecar-listed partition with no live dir (rows invisible to every
    read); before this fix, the nightly maintain healed only SPLIT
    residue and proceeded to detect over the incomplete store — the
    partition stayed lost until ivf_compact itself was next called.
    Maintain must restore the aside before detection, so the hottest
    (aside-hidden) partition is both visible and split."""
    import os

    from lshrs_spark.operators.knn import (
        ivf_balance_report,
        ivf_maintain,
        ivf_write_store,
    )

    rng = np.random.default_rng(109)
    d = 8
    dirs = np.linalg.qr(rng.standard_normal((d, 3)))[0].T
    rows = [dirs[i] for i in range(3)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(60)]
    rows += [dirs[1 + i % 2] + 0.05 * rng.standard_normal(d)
             for i in range(12)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "compact_residue")
    ivf_write_store(df, ivf_centroids_by_id(df, 3), path)
    # crash window: the HOT partition moved aside by a dying compact
    os.rename(os.path.join(path, "centroid_id=0"),
              os.path.join(path, "_compact_aside_dead_0"))
    assert spark.read.parquet(path).count() == 14  # rows invisible

    # the balance card stays READ-ONLY (healing from a report could
    # race a live compact into its partition-delete branch) but must
    # FLAG the residue so the under-counting 14-row card is not
    # silently trusted
    [card] = ivf_balance_report(spark, path).collect()
    assert card.n_rows == 14 and card.n_heal_pending == 1
    assert os.path.isdir(os.path.join(path, "_compact_aside_dead_0"))

    log = ivf_maintain(spark, path, ratio=2.0, max_splits=1, n_splits=2)
    assert not any(n.startswith("_compact_aside_")
                   for n in os.listdir(path))
    assert len(log) == 1 and log[0]["centroid_id"] == 0
    assert spark.read.parquet(path).count() == 75  # nothing lost


def test_ivf_maintain_batched_swap_crash_before_swap_heals(spark, tmp_path):
    """VERDICT r11 #4: ivf_maintain now splits ALL hot partitions with
    one combined rewrite and ONE sidecar swap. Crash-sim for the new
    widest window — every split's sub-partitions already moved into
    the root, the final swap never ran (state constructed from a real
    completed run's artifacts, the same hand-planting style as the
    compact-residue test: by the swap point the batch has produced
    exactly these directories). Contract: (1) the store keeps serving
    the PRE-SPLIT layout exactly (new dirs are unlisted, old dirs
    live, sidecar untouched); (2) the next maintain heals the orphans
    and completes, landing the SAME final state (action log, sidecar
    ids, partition sizes, row set) as the never-crashed run."""
    import os
    import shutil

    from lshrs_spark.operators.knn import ivf_maintain, ivf_write_store

    rng = np.random.default_rng(211)
    d = 8
    dirs = np.linalg.qr(rng.standard_normal((d, 6)))[0].T
    rows = [dirs[i] for i in range(6)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(50)]
    rows += [dirs[1] + 0.05 * rng.standard_normal(d) for _ in range(40)]
    rows += [dirs[2 + i % 4] + 0.05 * rng.standard_normal(d)
             for i in range(24)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "crash")
    ref = str(tmp_path / "ref")
    ivf_write_store(df, ivf_centroids_by_id(df, 6), path)
    shutil.copytree(path, ref)

    def sidecar_ids(p):
        import pyarrow.dataset as pads

        return sorted(
            pads.dataset(os.path.join(p, "_centroids"), format="parquet")
            .to_table(columns=["centroid_id"])
            .column("centroid_id").to_pylist()
        )

    pre_ids = sidecar_ids(path)

    # the never-crashed reference run (also the source of the crash
    # state's already-moved-in sub-partition directories)
    ref_log = ivf_maintain(spark, ref, ratio=2.0, max_splits=2, n_splits=2)
    assert [a["centroid_id"] for a in ref_log] == [0, 1]
    new_ids = sorted(i for a in ref_log for i in a["new_ids"])
    assert new_ids == [6, 7, 8, 9]

    # plant the crash state: sub-partitions in the root (unlisted),
    # old hot dirs live, sidecar untouched — exactly what the batch
    # leaves if it dies between the tmp-dir moves and the ONE swap
    for c in new_ids:
        shutil.copytree(os.path.join(ref, f"centroid_id={c}"),
                        os.path.join(path, f"centroid_id={c}"))

    # (1) pre-split layout still serves: sidecar untouched, both hot
    # dirs live; a sidecar-driven read (what servers/probes do) sees
    # every row exactly once
    assert sidecar_ids(path) == pre_ids
    assert os.path.isdir(os.path.join(path, "centroid_id=0"))
    assert os.path.isdir(os.path.join(path, "centroid_id=1"))
    listed = spark.read.parquet(
        *[os.path.join(path, f"centroid_id={c}") for c in pre_ids])
    assert listed.count() == len(rows)
    # ... while a RAW full-store scan would double-count — the reason
    # _heal_unlisted_partitions must run before detection
    assert spark.read.parquet(path).count() > len(rows)

    # (2) the next nightly heals the orphans and completes; final
    # state matches the never-crashed run
    log = ivf_maintain(spark, path, ratio=2.0, max_splits=2, n_splits=2)
    assert log == ref_log
    assert sidecar_ids(path) == sidecar_ids(ref)
    sizes = lambda p: sorted(  # noqa: E731
        (r.centroid_id, r["count"]) for r in
        spark.read.parquet(p).groupBy("centroid_id").count().collect())
    assert sizes(path) == sizes(ref)
    assert sorted(
        r.id for r in spark.read.parquet(path).select("id").collect()
    ) == sorted(range(len(rows)))


def test_batched_maintain_equals_sequential_splits(spark, tmp_path):
    """The batched one-swap path's equivalence CONTRACT, pinned against
    the public sequential API as the oracle: ivf_maintain (one combined
    rewrite + one swap) on store A must land exactly the state that a
    hand-driven detect-once + ivf_split_centroid loop (one rewrite +
    one swap PER split) lands on copy B — same sidecar ids and
    centroid vectors, same per-partition row assignment, same id
    allocation. ratio is set LOW so the hot list includes a partition
    SMALLER than n_splits (one seed row): the id counter must advance
    by the ACTUAL sub-centroid count (1), exactly as the sequential
    form's re-read of the swapped sidecar does — the subtle allocation
    path a fixed +n_splits stride would silently break."""
    import os
    import shutil

    import pyarrow.dataset as pads

    from lshrs_spark.operators.knn import (
        ivf_hot_centroids,
        ivf_maintain,
        ivf_split_centroid,
        ivf_write_store,
    )

    rng = np.random.default_rng(227)
    d = 8
    dirs = np.linalg.qr(rng.standard_normal((d, 4)))[0].T
    rows = [dirs[i] for i in range(4)]
    rows += [dirs[0] + 0.05 * rng.standard_normal(d) for _ in range(30)]
    rows += [dirs[1] + 0.05 * rng.standard_normal(d) for _ in range(12)]
    rows += [dirs[2] + 0.05 * rng.standard_normal(d) for _ in range(4)]
    # centroid 3 keeps ONLY its seed row -> 1-row partition
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    a = str(tmp_path / "batched")
    b = str(tmp_path / "sequential")
    ivf_write_store(df, ivf_centroids_by_id(df, 4), a)
    shutil.copytree(a, b)

    # ratio 0.05: EVERY partition is "hot", including the 1-row one
    hot = ivf_hot_centroids(spark, a, ratio=0.05)
    assert len(hot) == 4 and any(n == 1 for _, n in hot)

    log = ivf_maintain(spark, a, ratio=0.05, max_splits=4, n_splits=2)
    # the sequential oracle: same detection order, one split at a time
    seq = []
    for cid, n in hot:
        seq.append({"centroid_id": cid, "rows": n,
                    "new_ids": ivf_split_centroid(spark, b, cid,
                                                  n_splits=2)})
    assert log == seq
    # the 1-row partition yielded ONE sub-centroid and the counter
    # advanced by 1, not n_splits
    one_row = next(x for x in log if x["rows"] == 1)
    assert len(one_row["new_ids"]) == 1

    def sidecar(p):
        t = pads.dataset(os.path.join(p, "_centroids"),
                         format="parquet").to_table()
        return sorted(zip(t.column("centroid_id").to_pylist(),
                          map(tuple, t.column("cvec").to_pylist())))

    assert sidecar(a) == sidecar(b)
    assign = lambda p: sorted(  # noqa: E731
        (r.id, r.centroid_id)
        for r in spark.read.parquet(p).select("id", "centroid_id").collect())
    assert assign(a) == assign(b)


def test_maintain_improves_balance_card(spark, tmp_path):
    """The nightly unit's effect expressed through the drift card
    (VERDICT r11 #7 meets #4): diff the IVF store's balance card
    across one ivf_maintain call — rows conserved (growth exactly
    1.0), both planted hot partitions retired (d_n_hot == -2), and
    the Gini strictly improves (d_gini < 0). This is the exact alert
    shape a scheduler watches after each maintenance window."""
    from lshrs_spark.operators.knn import (
        ivf_balance_report,
        ivf_maintain,
        ivf_write_store,
    )
    from lshrs_spark.operators.skew import balance_delta

    rng = np.random.default_rng(229)
    d = 8
    basis = np.linalg.qr(rng.standard_normal((d, 8)))[0].T
    dirs, e0, e1 = basis[:6], basis[6], basis[7]

    def sub(base, side, n):
        # a genuine sub-cluster INSIDE one centroid's cone: still
        # nearest to `base` among the seeds, but separable once the
        # split picks sub-centroids from both sides (a hot partition
        # of near-identical points has nothing to split INTO — the
        # realistic hot case is merged substructure)
        v = base + 0.3 * side
        v = v / np.linalg.norm(v)
        return [v + 0.02 * rng.standard_normal(d) for _ in range(n)]

    rows = [dirs[i] for i in range(6)]
    rows += sub(dirs[0], e0, 30) + sub(dirs[0], -e0, 30)
    rows += sub(dirs[1], e1, 20) + sub(dirs[1], -e1, 20)
    rows += [dirs[2 + i % 4] + 0.05 * rng.standard_normal(d)
             for i in range(16)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(np.asarray(rows, np.float32))],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "card")
    ivf_write_store(df, ivf_centroids_by_id(df, 6), path)

    before = ivf_balance_report(spark, path, ratio=2.0)
    log = ivf_maintain(spark, path, ratio=2.0, max_splits=2, n_splits=2)
    assert [x["centroid_id"] for x in log] == [0, 1]
    after = ivf_balance_report(spark, path, ratio=2.0)

    [drift] = balance_delta(before, after).collect()
    assert drift.growth == 1.0 and drift.d_n_rows == 0  # rows conserved
    # splitting also LOWERS the mean (two extra partitions), so a
    # sub-partition can sit marginally above ratio x the new mean —
    # the guaranteed direction is never-worse, and the max and Gini
    # strictly improve
    assert drift.d_n_hot <= 0
    assert drift.d_gini < 0             # strictly more balanced
    assert drift.d_max_rows < 0 and drift.d_n_partitions == 2
