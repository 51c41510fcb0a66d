"""k-NN retrieval strategies over an embedding column.

Three tiers, trading accuracy for scan cost (SURVEY.md §7.2 M5):

* :func:`brute_force_topk` — exact all-pairs cosine + TakeOrdered; the
  O(n·q) correctness baseline.
* SRP-LSH probe (``operators.probe``) — sublinear candidate retrieval via
  the bucket index; recall tunable by (bands, rows).
* :func:`ivf_assign` / :func:`ivf_topk` — IVF-style partition pruning:
  vectors are assigned to their nearest centroid, queries probe only the
  ``nprobe`` nearest centroid partitions. At 100 TB the assignment is the
  partitioning key of the stored table, so a query touches ``nprobe/K``
  of the data; centroids are either a deterministic id-sample
  (:func:`ivf_centroids_by_id`) or DataFrame-native Lloyd's k-means
  (:func:`kmeans_centroids`) — same downstream plan either way.

:func:`recall_at_k` measures an ANN result list against the exact one —
the metric that decides whether an index config is usable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot_product, unit_or_null

__all__ = [
    "brute_force_topk",
    "mips_topk",
    "mips_augment",
    "mips_augment_query",
    "ivf_assign",
    "ivf_topk",
    "ivf_write_store",
    "ivf_topk_stored",
    "truncated_topk",
    "truncated_ivf_write_store",
    "truncated_ivf_append",
    "truncated_ivf_compact",
    "truncated_ivf_maintain",
    "truncated_topk_stored",
    "kmeans_centroids",
    "recall_at_k",
    "retrieval_metrics",
    "ivf_append",
    "ivf_delete",
    "ivf_compact",
    "ivf_balance_report",
    "ivf_hot_centroids",
    "ivf_maintain",
    "ivf_split_centroid",
    "pq_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "pq_write_store",
    "pq_append",
    "ivfpq_write_store",
    "ivfpq_append",
    "ivfpq_topk_stored",
    "refine_topk",
    "ivfpq_refined_topk",
]


_unit = unit_or_null  # shared normalize-or-null policy (functions.vector)


def _collect_queries(queries: DataFrame, qid_col: str, qvec_col: str,
                     *, normalize: bool):
    """Driver-side query matrix for the Arrow scoring kernels
    (``functions.batchscore``): ``(qids, Q, q_nulls)`` with ``Q``
    unit-normalized (cosine tiers) or raw (MIPS). Returns ``None``
    above the kernel's collect bound — callers then keep the
    pure-Catalyst plan, so a corpus-sized query side is never pulled
    to the driver (same bound class as the broadcast it replaces)."""
    from ..functions import batchscore as B

    got = B.collect_vectors(queries.select(
        F.col(qid_col).cast("long"), F.col(qvec_col)))
    if got is None:
        return None
    qids, Q, q_nulls = got
    if normalize:
        Q, q_nulls = B.seq_unit(Q, q_nulls)
    return qids, Q, q_nulls


def _topk_arrow(vectors: DataFrame, qm, k: int, id_col: str,
                vector_col: str, *, normalize_vectors: bool) -> DataFrame:
    """Shared Arrow top-k plan: one corpus scan -> partition-local
    scored top-k per query (``batchscore.make_topk_map_fn``) -> final
    per-query window over the bounded survivor set. Bit-exact scores
    and ordering vs the crossJoin + window plan it replaces; the rows
    entering the one shuffle drop from O(candidates) to
    O(partitions x queries x k)."""
    from ..functions import batchscore as B

    qids, Q, q_nulls = qm
    fn, schema = B.make_topk_map_fn(
        qids, Q, q_nulls, k, normalize_vectors=normalize_vectors)
    part = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vector_col)
    ).mapInArrow(fn, schema)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query: ``(qid, id, score, rank)``. The
    query batch ships to every task once (driver matrix -> Arrow
    kernel closure — the broadcast's cost class) and the corpus is
    scanned once whatever the query-batch size; scoring runs as ONE
    NumPy pass per Arrow batch with partition-local top-k, bit-exact
    to the previous crossJoin + interpreted-fold plan (guide §4.2;
    see ``functions.batchscore``). A query side too large to collect
    falls back to the crossJoin plan unchanged."""
    qm = _collect_queries(queries, qid_col, qvec_col, normalize=True)
    if qm is not None:
        return _topk_arrow(vectors, qm, k, id_col, vector_col,
                           normalize_vectors=True)
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), _unit(F.col(vector_col)).alias("_v")
    )
    q = F.broadcast(queries.select(
        F.col(qid_col).cast("long").alias("qid"), _unit(F.col(qvec_col)).alias("_q")
    ))
    scored = v.crossJoin(q).select(
        "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def mips_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact maximum-inner-product top-k per query:
    ``(qid, id, score, rank)`` with ``score`` the RAW dot product — NO
    normalization on either side. This is the retrieval objective when
    vector MAGNITUDE carries signal (recommendation item popularity,
    learned relevance scales, un-normalized two-tower outputs), where
    cosine's normalization would throw the signal away. Same exact
    baseline shape as :func:`brute_force_topk`: the query batch is
    broadcast and the corpus is scanned once whatever the batch size.
    For the sublinear path, :func:`mips_augment` turns ANY cosine tier
    in this package into a MIPS index. Same Arrow scoring kernel as
    :func:`brute_force_topk` (raw vectors on both sides — no
    normalization anywhere); oversized query batches fall back to the
    crossJoin plan."""
    qm = _collect_queries(queries, qid_col, qvec_col, normalize=False)
    if qm is not None:
        return _topk_arrow(vectors, qm, k, id_col, vector_col,
                           normalize_vectors=False)
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vector_col).alias("_v")
    )
    q = F.broadcast(queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("_q")
    ))
    scored = v.crossJoin(q).select(
        "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def mips_augment(
    vectors: DataFrame,
    *,
    vector_col: str = "embedding",
    out_col: Optional[str] = None,
    max_norm: Optional[float] = None,
) -> DataFrame:
    """Norm-augmentation reduction from MIPS to cosine NN (public
    technique: Bachrach et al., RecSys 2014 "Speeding up the Xbox
    recommender"; Shrivastava & Li, NIPS 2014 ALSH): each data vector
    ``x`` with ``|x| <= M`` gains one trailing component
    ``sqrt(M^2 - |x|^2)``, making every augmented vector's norm exactly
    ``M``; queries gain a literal ``0`` (:func:`mips_augment_query`).
    Then ``cos(q_hat, x_hat) = (q . x) / (|q| * M)`` — strictly monotone
    in the inner product — so EVERY cosine tier in this package
    (SRP-LSH buckets, IVF partition pruning, PQ/IVFADC codes, the
    serving tier) becomes a MIPS index with no operator changes.

    ``max_norm=None`` computes ``M`` with one max aggregate (a single
    driver-side scalar — bounded, not a data collect); pass a known
    upper bound to keep the plan aggregate-free, e.g. when the corpus
    publishes a norm cap or the caller batches repeated builds. The
    augmented component is clamped at 0 for vectors at (or, through
    float rounding, marginally above) the cap."""
    from ..functions.vector import l2_norm

    out_col = out_col or vector_col
    if max_norm is None:
        row = vectors.agg(
            F.max(l2_norm(F.col(vector_col))).alias("m")
        ).collect()[0]
        max_norm = float(row["m"] or 0.0)
    m2 = F.lit(float(max_norm) * float(max_norm))
    pad = F.sqrt(F.greatest(
        m2 - F.aggregate(
            F.transform(F.col(vector_col), lambda x: x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x * x,
        ),
        F.lit(0.0),
    ))
    return vectors.withColumn(
        out_col,
        F.concat(
            F.transform(F.col(vector_col), lambda x: x.cast("double")),
            F.array(pad),
        ),
    )


def mips_augment_query(
    queries: DataFrame, *, qvec_col: str = "qvec"
) -> DataFrame:
    """Query-side twin of :func:`mips_augment`: append a literal ``0``
    so augmented-space cosine ranks by raw inner product."""
    return queries.withColumn(
        qvec_col,
        F.concat(
            F.transform(F.col(qvec_col), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ),
    )


def _nearest_centroids(
    points: DataFrame,
    centroids: DataFrame,
    n: int,
    point_id: str,
    point_vec: str,
) -> DataFrame:
    """Top-n centroids per point by (cosine desc, centroid_id asc).
    ``points[point_vec]`` must already be unit-normalized; centroids are
    normalized here (they're broadcast-small)."""
    cents = centroids.select("centroid_id", _unit(F.col("cvec")).alias("cvec"))
    scored = points.crossJoin(F.broadcast(cents)).select(
        F.col(point_id),
        F.col("centroid_id"),
        dot_product(F.col(point_vec), F.col("cvec")).alias("_cs"),
    )
    w = Window.partitionBy(point_id).orderBy(F.desc("_cs"), F.asc("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_cs", "_r")
    )


def ivf_centroids_by_id(
    vectors: DataFrame,
    num_centroids: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid set: the ``num_centroids`` lowest-id
    vectors (stand-in for k-means means; same downstream plan)."""
    return (
        vectors.orderBy(F.col(id_col))
        .limit(num_centroids)
        .select(
            F.col(id_col).cast("long").alias("centroid_id"),
            F.col(vector_col).alias("cvec"),
        )
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    _cm=None,
) -> DataFrame:
    """``(id, centroid_id)``: each vector's nearest centroid — the IVF
    partitioning key (store the corpus partitioned/bucketed by it).

    The assignment is a PER-ROW argmax over the broadcast-small
    centroid set, so it needs no exchange at all: a vectorized
    pandas_udf scores each Arrow batch against the collected centroid
    matrix (bit-exact window semantics — ``functions.batchscore``).
    The previous plan cross-joined n x K rows and ran a
    ``row_number`` window over them: one full shuffle + sort of the
    candidate space per build/maintenance pass, pure overhead at any
    scale (guide §2.4). Falls back to that plan only if the centroid
    set exceeds the driver-collect bound (not a real IVF regime).
    ``_cm`` shares a caller's already-collected centroid matrix."""
    acol = nearest_centroid_col(centroids, F.col(vector_col), cgot=_cm)
    if acol is not None:
        return vectors.select(
            F.col(id_col).cast("long").alias("id"),
            acol.alias("centroid_id"),
        )
    pts = vectors.select(
        F.col(id_col).cast("long").alias("id"), _unit(F.col(vector_col)).alias("_v")
    )
    return _nearest_centroids(pts, centroids, 1, "id", "_v").select(
        "id", "centroid_id"
    )


def nearest_centroid_col(centroids: DataFrame, vector_col, *, cgot=None):
    """Column computing each row's nearest-centroid id (the
    ``_nearest_centroids(n=1)`` winner under ``(cosine desc,
    centroid_id asc)``, NULLs last) as a vectorized pandas_udf over the
    collected centroid set — no join, no shuffle. ``None`` when the
    centroid table is too large to collect (callers fall back).
    ``cgot`` lets a caller that has ALREADY collected the centroid
    matrix share it — one collect job (one evaluation of the centroid
    plan) per query instead of one per consumer (guide §1.2)."""
    from pyspark.sql import types as T

    from ..functions import batchscore as B

    got = cgot if cgot is not None else B.collect_vectors(
        centroids.select(F.col("centroid_id").cast("long"), F.col("cvec")))
    if got is None or len(got[0]) == 0:
        return None
    cids, C, c_nulls = got
    Cu, c_nulls = B.seq_unit(C, c_nulls)
    body = B.make_nearest_centroid_udf_body(cids, Cu, c_nulls)
    udf = F.pandas_udf(body, T.LongType())
    return udf(vector_col)


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    _qm=None,
) -> DataFrame:
    """IVF query: probe the ``nprobe`` nearest centroid partitions, exact
    rerank inside them. ``(qid, id, score, rank)``.

    ``_qm`` (internal): a pre-collected ``(qids, Q_unit, q_nulls)``
    query matrix at the width of ``qvec_col`` — callers that already
    collected the batch (``truncated_topk`` derives its truncated
    matrix from ONE full-width collect) pass it so this function adds
    no second query-side collect job.

    Fast path (bounded query batch + centroid set): ONE corpus scan
    carrying the per-row centroid assignment as a vectorized pandas_udf
    column (no assignment shuffle, no join back on id — the previous
    plan shuffled the corpus twice: once for the assignment window,
    once for the ``join(v, "id")``), probes computed driver-side from
    the same collected matrices (no probe-ranking job), candidate
    scoring in the shared Arrow kernel. Result-identical; the only
    remaining exchange is the bounded final per-query window.

    r15 (VERDICT r14 #1): the centroid table is collected ONCE and the
    matrix shared between the assignment udf and the probe ranking —
    the r14 shape collected it twice, and when ``centroids`` is a
    DERIVED plan (``ivf_centroids_by_id`` over an augmented corpus, as
    in the MIPS tier) each collect re-ran that corpus-scale derivation
    as its own Spark job."""
    from ..functions import batchscore as B

    cgot = B.collect_vectors(
        centroids.select(F.col("centroid_id").cast("long"), F.col("cvec")))
    qm = (_qm if _qm is not None
          else _collect_queries(queries, qid_col, qvec_col, normalize=True))
    acol = nearest_centroid_col(centroids, F.col(vector_col), cgot=cgot)
    probe_rows = (_probe_rows_local(qm, centroids, nprobe, cgot=cgot)
                  if qm is not None and acol is not None else None)
    if probe_rows is not None:
        from ..functions import batchscore as B

        spark = vectors.sparkSession
        probes = F.broadcast(spark.createDataFrame(
            probe_rows, "qid long, centroid_id long"))
        withvec = vectors.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).alias("_vraw"),
            acol.alias("centroid_id"),
        )
        cand = withvec.join(probes, "centroid_id").select(
            "qid", "id", "_vraw")
        fn, schema = B.make_pair_score_fn(*qm, normalize_vectors=True)
        scored = cand.mapInArrow(fn, schema)
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "id", "score", "rank")
        )
    assign = ivf_assign(vectors, centroids, id_col=id_col,
                        vector_col=vector_col, _cm=cgot)
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"), _unit(F.col(qvec_col)).alias("_q")
    )
    probes = _nearest_centroids(q, centroids, nprobe, "qid", "_q")  # (qid, centroid_id)
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), _unit(F.col(vector_col)).alias("_v")
    )
    cands = (
        probes.join(assign, "centroid_id")
        .select("qid", "id")
        .join(v, "id")
        .join(F.broadcast(q), "qid")
    )
    scored = cands.select(
        "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def _probe_rows_local(qm, centroids: DataFrame, nprobe: int, cgot=None
                      ) -> list[tuple[int, int]]:
    """Driver-side twin of ``_nearest_centroids(q, centroids, nprobe)``
    + collect: the ``nprobe`` best centroid ids per query under
    ``(cosine desc, centroid_id asc)`` with NULLs last and NaN first —
    the exact window order, computed from the already-collected query
    matrix with the bit-exact sequential folds. Saves one full Spark
    job (cross-join + window + collect) per stored/pruned query."""
    import numpy as np

    from ..functions import batchscore as B

    qids, Qu, q_nulls = qm
    got = cgot if cgot is not None else B.collect_vectors(
        centroids.select(F.col("centroid_id").cast("long"), F.col("cvec")))
    if got is None:
        return None  # caller falls back to the Catalyst plan
    cids, C, c_nulls = got
    Cu, c_nulls = B.seq_unit(C, c_nulls)
    if Qu.shape[0] == 0 or len(cids) == 0:
        return []
    if Qu.shape[1] == Cu.shape[1]:
        S = B.seq_dots(Qu, Cu)  # (nq, K)
    else:
        # zip_with width mismatch -> NULL score for every pair
        S = np.zeros((Qu.shape[0], len(cids)), dtype=np.float64)
        c_nulls = np.ones(len(cids), dtype=bool)
    rows: list[tuple[int, int]] = []
    npb = min(int(nprobe), len(cids))
    for qi in range(len(qids)):
        sq = S[qi]
        nulls = c_nulls | bool(q_nulls[qi])
        key2 = np.where(np.isnan(sq), -np.inf, -sq)
        sel = np.lexsort((cids, key2, nulls.astype(np.int8)))[:npb]
        rows.extend((int(qids[qi]), int(cids[j])) for j in sel)
    return rows


def truncated_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    coarse_dims: int,
    coarse_k: Optional[int] = None,
    num_centroids: Optional[int] = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Matryoshka two-stage retrieval (VERDICT r7 #3): coarse
    top-``coarse_k`` per query over the FIRST ``coarse_dims`` embedding
    dimensions, then exact FULL-width cosine rerank of only that
    shortlist — ``(qid, id, score, rank)`` with ``score`` the full-dim
    cosine. MRL-trained embeddings concentrate signal in the prefix, so
    the coarse stage sees ``coarse_dims/dim`` of the bytes and
    multiply-adds (the practical matryoshka payoff at 100 TB: a 4×
    smaller index and 4× cheaper probe for a 16-of-64 prefix) while the
    rerank restores full-width ordering over ``coarse_k`` rows per
    query; ``emb_dim_truncation_recall``-style gauges grade what the
    prefix costs in recall on a given corpus.

    Coarse stage: a truncated-width brute scan by default; with
    ``num_centroids`` set it routes through the existing IVF pruned
    probe (:func:`ivf_topk`) over a truncated-width index — centroids
    live at ``coarse_dims`` too, so centroid scoring, assignment and
    the probe all run at the reduced width and the two prunings
    (centroid partitions × prefix width) compose. Scale shape: the
    rerank is an equi-join of the ``coarse_k``-bounded shortlist
    against the full-width table on id (prunes to matching files when
    id is the sort key) with the query batch broadcast — the corpus is
    never rescanned at full width.

    The query batch is collected ONCE (bounded by the kernel collect
    limit) and both stage matrices derive from it driver-side, the
    same contract as :func:`truncated_topk_stored`: a query vector
    carrying an element-level NULL is flagged null for BOTH stages
    (the full-width fold nulls its scores regardless of where the
    element sits). Oversized/mixed-width/duplicate-id batches fall
    back to the per-stage Catalyst plans unchanged."""
    if coarse_dims < 1:
        raise ValueError(f"coarse_dims must be >= 1 (got {coarse_dims})")
    if coarse_k is None:
        coarse_k = max(4 * k, k)
    if coarse_k < k:
        raise ValueError(
            f"coarse_k ({coarse_k}) must be >= k ({k}) — the rerank can "
            f"only reorder the shortlist, not extend it"
        )
    tv = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.slice(F.col(vector_col), 1, coarse_dims).alias("tvec"),
    )
    tq = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.slice(F.col(qvec_col), 1, coarse_dims).alias("qvec"),
    )
    # r15 (same recipe as truncated_topk_stored r14): collect the query
    # batch ONCE and derive BOTH stage matrices driver-side — the
    # previous shape ran two collect jobs over the same query table
    # (the coarse stage's truncated slice inside brute_force_topk, then
    # the full-width rerank), and when ``queries`` is a derived plan
    # each collect re-evaluated it end to end. The truncated matrix is
    # the numpy prefix slice of the raw batch, unit-normalized after
    # slicing — exactly what collecting ``F.slice(qvec, 1, coarse_dims)``
    # produced (numpy clamps like slice when the batch is narrower).
    from ..functions import batchscore as B

    got = B.collect_vectors(queries.select(
        F.col(qid_col).cast("long"), F.col(qvec_col)))
    qm = None
    qm_t = None
    if got is not None:
        qids, Qraw, q_nulls = got
        if Qraw.shape[1] >= coarse_dims:
            qm_t = (qids,) + B.seq_unit(
                Qraw[:, :coarse_dims].copy(), q_nulls)
        qm = (qids,) + B.seq_unit(Qraw, q_nulls)
    if num_centroids:
        cents = ivf_centroids_by_id(
            tv, num_centroids, id_col="id", vector_col="tvec"
        )
        coarse = ivf_topk(
            tv, cents, tq, coarse_k, nprobe,
            id_col="id", vector_col="tvec", _qm=qm_t,
        )
    elif qm_t is not None:
        coarse = _topk_arrow(tv, qm_t, coarse_k, "id", "tvec",
                             normalize_vectors=True)
    else:
        coarse = brute_force_topk(
            tv, tq, coarse_k, id_col="id", vector_col="tvec"
        )
    if qm is not None:
        v = vectors.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).alias("_vraw"),
        )
        fn, schema = B.make_pair_score_fn(*qm, normalize_vectors=True)
        scored = (
            coarse.select("qid", "id").join(v, "id")
            .select("qid", "id", "_vraw")
            .mapInArrow(fn, schema)
        )
    else:
        v = vectors.select(
            F.col(id_col).cast("long").alias("id"),
            _unit(F.col(vector_col)).alias("_v"),
        )
        q = F.broadcast(queries.select(
            F.col(qid_col).cast("long").alias("qid"),
            _unit(F.col(qvec_col)).alias("_q"),
        ))
        scored = (
            coarse.select("qid", "id")
            .join(v, "id")
            .join(q, "qid")
            .select(
                "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score")
            )
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Mean recall@k of an approximate result against the exact one.
    Both inputs: ``(qid, id, rank)`` with rank <= k. Returns one row
    ``(recall double)``."""
    a = approx.filter(F.col("rank") <= k).select("qid", "id")
    e = exact.filter(F.col("rank") <= k).select("qid", "id")
    hits = a.join(e, ["qid", "id"]).groupBy("qid").agg(F.count(F.lit(1)).alias("h"))
    per_q = e.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).join(hits, "qid", "left")
    return per_q.agg(
        F.round(
            F.avg(F.coalesce(F.col("h"), F.lit(0)) / F.col("n")), 5
        ).alias("recall")
    )


def retrieval_metrics(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """The full ANN-evaluation card in one row ``(recall, mrr, ndcg)``:
    recall@k, mean reciprocal rank@k and nDCG@k of an approximate
    ranking against the exact one, with BINARY relevance (a returned id
    is relevant iff it sits in the exact top-k) — recall says how much
    truth came back, MRR says how early the first true hit lands, nDCG
    says how well the whole returned ORDER concentrates truth at the
    top; a tier can hold recall while degrading the other two, which is
    exactly what this card catches. Both inputs ``(qid, id, rank)``
    with rank <= k.

    Determinism: ideal DCG is the closed per-query sum over ranks
    ``1..n`` in ascending order (n = that query's exact row count) and
    DCG sums ``1/log2(rank+1)`` over hits; final averages round to 5
    decimals — all replayable in SQL. One join + two hash
    aggregations; queries are the distribution axis."""
    a = approx.filter(F.col("rank") <= k).select("qid", "id", "rank")
    e = exact.filter(F.col("rank") <= k).select("qid", "id")
    hit = a.join(e, ["qid", "id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("h"),
        F.min("rank").alias("first_rank"),
        F.sum(1.0 / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"),
    )
    per_q = (
        e.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
        .join(hit, "qid", "left")
        .select(
            (F.coalesce(F.col("h"), F.lit(0)) / F.col("n")).alias("_r"),
            F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)).alias("_m"),
            (
                F.coalesce(F.col("dcg"), F.lit(0.0))
                / F.aggregate(
                    F.sequence(F.lit(1), F.col("n")),
                    F.lit(0.0),
                    lambda acc, i: acc
                    + 1.0 / F.log2(i.cast("double") + F.lit(1.0)),
                )
            ).alias("_g"),
        )
    )
    return per_q.agg(
        F.round(F.avg("_r"), 5).alias("recall"),
        F.round(F.avg("_m"), 5).alias("mrr"),
        F.round(F.avg("_g"), 5).alias("ndcg"),
    )


def ivf_write_store(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    mode: str = "overwrite",
    store_centroids: bool = True,
    extra_cols: Sequence[str] = (),
    max_records_per_file: int = 1 << 22,
) -> None:
    """Materialize the IVF layout: the corpus written to parquet
    **partitioned by nearest-centroid assignment** — at 100 TB the
    assignment IS the directory structure, so a query's ``nprobe``
    centroid filter becomes partition pruning (only ``~nprobe/K`` of the
    bytes are ever scanned).

    ``store_centroids=True`` also writes the (tiny) centroid table to
    ``{path}/_centroids`` — the ``_`` prefix is invisible to both Spark
    and pyarrow dataset discovery, and it is what lets
    :class:`~lshrs_spark.serving.IVFServer` answer single queries with
    no Spark job at all."""
    assign = ivf_assign(vectors, centroids, id_col=id_col, vector_col=vector_col)
    (
        vectors.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).alias("embedding"),
            # metadata columns ride along in the same layout so a
            # filtered query (ivf_topk_stored extra_filter) can push
            # its predicate into the scan beside the partition pruning
            *[F.col(c) for c in extra_cols],
        )
        .join(assign, "id")
        # co-locate each centroid's rows before the partitioned write:
        # without this every write task emits a file into every
        # centroid directory it touches (tasks x centroids tiny files
        # — measured tens of ms of per-file open cost on a 640-centroid
        # serve-side probe), with it each directory holds one
        # right-sized file. The co-location funnels a centroid's rows
        # into ONE task, so a skewed hot centroid needs the split
        # safety valve below or it writes a single giant file.
        .repartition(F.col("centroid_id"))
        .write.mode(mode)
        .option("maxRecordsPerFile", int(max_records_per_file))
        .partitionBy("centroid_id")
        .parquet(path)
    )
    if store_centroids:
        (
            centroids.select(
                F.col("centroid_id").cast("long"),
                F.col("cvec").cast("array<double>"),
            )
            .coalesce(1)
            # always overwrite: the centroid table is a full snapshot —
            # carrying the caller's mode="append" would duplicate every
            # centroid and double-probe the same partitions at serve time
            .write.mode("overwrite")
            .parquet(f"{path}/_centroids")
        )


def ivf_append(
    vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    extra_cols: Sequence[str] = (),
    max_records_per_file: int = 1 << 22,
) -> None:
    """Incrementally append a batch to a plain :func:`ivf_write_store`
    layout — completing the append matrix every other stored tier
    already has (truncated/matryoshka and PQ/IVFADC, r9): the new rows
    are assigned against the EXISTING ``{path}/_centroids`` set (read,
    never retrained — the invariant that keeps old and new assignments
    compatible in one layout) and land as additional files inside the
    existing ``centroid_id=N`` directories. A live
    :class:`~lshrs_spark.serving.IVFServer` picks the rows up at its
    next ``refresh()``; rankings afterwards equal a from-scratch
    rebuild over the union at the same centroid set.

    Same contracts as :func:`truncated_ivf_append`: single writer (no
    concurrent compaction/split of the same store), ids NOT
    deduplicated against the store (dedupe upstream), extra_cols must
    match the stored schema. At 100 TB the append touches only the new
    batch — one assignment map + one bounded partitioned write;
    nothing existing is read or rewritten. Repeated appends accumulate
    one file per touched partition per batch;
    ``ivf_compact(min_files=...)`` folds them (and any tombstones)
    back to one co-located set per partition on the usual LSM cadence."""
    spark = vectors.sparkSession
    cents = spark.read.parquet(f"{path}/_centroids")
    existing = set(spark.read.parquet(path).columns)
    incoming = {"id", "embedding", "centroid_id"} | set(extra_cols)
    if incoming != existing:
        raise ValueError(
            "ivf_append: extra_cols mismatch with the stored layout — "
            f"store holds {sorted(existing)}, append would write "
            f"{sorted(incoming)}; pass the same extra_cols the store "
            "was built with"
        )
    ivf_write_store(
        vectors, cents, path, id_col=id_col, vector_col=vector_col,
        mode="append", store_centroids=False, extra_cols=extra_cols,
        max_records_per_file=max_records_per_file,
    )


def truncated_ivf_write_store(
    vectors: DataFrame,
    num_centroids: int,
    coarse_dims: int,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    mode: str = "overwrite",
    full_files: int = 8,
    full_row_group_bytes: int = 1 << 16,
    extra_cols: Sequence[str] = (),
) -> None:
    """Materialize the matryoshka serving layout
    (:class:`~lshrs_spark.serving.TruncatedIVFServer`): an ordinary IVF
    store (:func:`ivf_write_store`) built over the FIRST
    ``coarse_dims`` dimensions — centroids, assignment and the
    partitioned vector files all live at the reduced width, so the
    stored index is ``coarse_dims/dim`` of the full-width bytes and a
    probe reads proportionally less — plus a ``{path}/_full`` sidecar
    holding the full-width vectors RANGE-SORTED BY ID across
    ``full_files`` files, so the serve-time refine fetch of a
    ``coarse_k``-row shortlist prunes to the files whose id min/max
    envelopes cover it instead of scanning the corpus.

    ``full_row_group_bytes`` caps the sidecar's parquet row-group size
    (default 64 KiB ≈ ~120 rows at 64 float64 dims): the serve-time
    fetch reads WHOLE row groups that intersect the shortlist, so a
    ~40-id fetch costs at most ~40 tiny groups (a couple of MB) instead
    of most of the table — with writer-default ~128 MB groups every
    envelope covers some shortlist id and the fetch degraded to a full
    sidecar scan (measured 61 ms p95 vs ~6 ms). Small groups cost
    footer size, parsed once at open.

    ``extra_cols`` ride along in the TRUNCATED layout (the probed
    side), so a served ``where=(col, value)`` predicate filters
    candidates inside the pruned coarse read — before ranking, like
    every other filtered serving tier.

    ``mode`` is restricted to ``"overwrite"``: an append THROUGH THIS
    WRITER would train a fresh centroid set from the NEW batch alone
    (mixing incompatible assignments into one layout) and clobber the
    ``_full`` sidecar. Incremental maintenance goes through
    :func:`truncated_ivf_append` — assignment against the EXISTING
    stored centroids, segment-appended sidecar — with
    :func:`truncated_ivf_compact` folding the accumulated segments
    back into the canonical layout (VERDICT r8 #2)."""
    if mode != "overwrite":
        raise ValueError(
            "truncated_ivf_write_store supports mode='overwrite' only — "
            "appending here would mix per-batch centroid sets and desync "
            "the _full sidecar; use truncated_ivf_append for incremental "
            "batches"
        )
    if coarse_dims < 1:
        raise ValueError(f"coarse_dims must be >= 1 (got {coarse_dims})")
    tv = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.slice(F.col(vector_col), 1, coarse_dims).alias("tvec"),
        *[F.col(c) for c in extra_cols],
    )
    cents = ivf_centroids_by_id(tv, num_centroids, id_col="id",
                                vector_col="tvec")
    ivf_write_store(tv, cents, path, id_col="id", vector_col="tvec",
                    mode=mode, extra_cols=extra_cols)
    full = (
        vectors.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).cast("array<double>").alias("embedding"),
        )
        .repartitionByRange(int(full_files), "id")
        .sortWithinPartitions("id")
    )
    # parquet.block.size as a per-write .option(): Spark merges write
    # options into the job's Hadoop configuration
    # (newHadoopConfWithOptions), so the cap applies to THIS write only
    # — no session-global conf mutation, so a concurrent writer in the
    # same SparkSession keeps its own row-group size (ADVICE r8; the
    # earlier global set/restore had a race window).
    (
        full.write.mode("overwrite")
        .option("parquet.block.size", int(full_row_group_bytes))
        .parquet(f"{path}/_full")
    )


def truncated_ivf_append(
    vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    full_files: int = 8,
    full_row_group_bytes: int = 1 << 16,
    extra_cols: Sequence[str] = (),
    max_records_per_file: int = 1 << 22,
) -> None:
    """Incrementally append a batch to a
    :func:`truncated_ivf_write_store` layout WITHOUT re-clustering the
    world (VERDICT r8 #2 — the matryoshka tier's maintenance story,
    matching the reference's realtime ``ingest()`` path,
    lshrs/core/main.py:386-411, the way every other serving tier
    already has a streaming twin):

    - the new rows are assigned against the EXISTING stored centroid
      set (``{path}/_centroids`` is read, never retrained — the one
      thing that keeps old and new assignments compatible in a single
      layout), and their truncated prefixes land as additional files
      inside the existing ``centroid_id=N`` directories;
    - the full-width rows land as an additional id-SORTED SEGMENT of
      ``full_files`` files in the ``_full`` sidecar (small row groups,
      same per-write cap as the base writer). The serve-time refine
      fetch needs only per-row-group min/max id envelopes, which hold
      per file — segments may overlap in id range, costing the
      envelope intersection a few extra groups until
      :func:`truncated_ivf_compact` folds them back into one globally
      range-sorted set.

    A live :class:`~lshrs_spark.serving.TruncatedIVFServer` picks up
    both trees at its next ``refresh()`` (dataset re-discovery +
    envelope rebuild); rankings afterwards are identical to a
    from-scratch rebuild over the union at the same centroid set.

    Crash ordering: the ``_full`` segment is committed FIRST. A crash
    between the two writes leaves orphan full-width rows — harmless,
    they are never coarse candidates — whereas the reverse order would
    leave truncated rows whose refine fetch finds nothing and silently
    drops results. Single-writer contract (like ``bm25_compact``):
    don't append concurrently with a compaction of the same store.
    Ids are NOT deduplicated against the store — appending an id that
    already exists duplicates it in both trees (the coarse stage would
    emit it twice); dedupe upstream, or go through
    :func:`~lshrs_spark.streaming.ingest.truncated_ivf_absorb_staging`,
    whose anti-join enforces exactly that.

    At 100 TB: the append touches only the new batch (one assignment
    map + two bounded writes); nothing existing is read or rewritten.
    Periodic compaction cost is deferred and amortized, exactly the
    ``stream_bm25_ingest`` + ``bm25_compact`` pattern."""
    spark = vectors.sparkSession
    cents = spark.read.parquet(f"{path}/_centroids")
    coarse_dims = int(
        cents.select(F.size("cvec").alias("d")).limit(1).collect()[0]["d"]
    )
    existing = set(spark.read.parquet(path).columns)
    incoming = {"id", "embedding", "centroid_id"} | set(extra_cols)
    if incoming != existing:
        raise ValueError(
            "truncated_ivf_append: extra_cols mismatch with the stored "
            f"truncated layout — store holds {sorted(existing)}, append "
            f"would write {sorted(incoming)}; pass the same extra_cols "
            "the store was built with"
        )
    # _full segment FIRST (see crash ordering above)
    (
        vectors.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).cast("array<double>").alias("embedding"),
        )
        .repartitionByRange(int(full_files), "id")
        .sortWithinPartitions("id")
        .write.mode("append")
        .option("parquet.block.size", int(full_row_group_bytes))
        .parquet(f"{path}/_full")
    )
    tv = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.slice(F.col(vector_col), 1, coarse_dims).alias("tvec"),
        *[F.col(c) for c in extra_cols],
    )
    ivf_write_store(
        tv, cents, path, id_col="id", vector_col="tvec", mode="append",
        store_centroids=False, extra_cols=extra_cols,
        max_records_per_file=max_records_per_file,
    )


def truncated_ivf_compact(
    spark,
    path: str,
    *,
    full_files: int = 8,
    full_row_group_bytes: int = 1 << 16,
    max_records_per_file: int = 1 << 22,
) -> int:
    """Fold a truncated-IVF store's accumulated append segments (and
    any ``_deleted`` tombstones) back into the canonical
    :func:`truncated_ivf_write_store` layout: one co-located file set
    per centroid directory, one globally id-range-sorted ``_full``
    sidecar, no tombstone sidecar. Returns the surviving row count.

    The swap is the ``bm25_compact`` contract via
    :mod:`~lshrs_spark.fswap`: rewrite to a temp sibling, validate,
    rename the live tree aside, rename the temp into place, delete the
    old — a crash at any point leaves a servable layout at ``path`` or
    ``path.old-*``; object-store schemes (non-atomic rename) are
    refused up front. Centroids are copied verbatim (compaction never
    retrains — rankings before and after are identical modulo deleted
    rows). Live servers pick the folded layout up at ``refresh()``.
    Single-writer: stop appends while compacting."""
    import uuid as _uuid

    from ..fswap import resolve_rename_fs, swap_via_rename

    fs, dst = resolve_rename_fs(spark, path, label="truncated_ivf_compact")
    jvm = spark._jvm
    trunc = spark.read.parquet(path).withColumn(
        # hive partition discovery may narrow the partition column;
        # pin the canonical type so compaction is schema-stable
        "centroid_id", F.col("centroid_id").cast("long")
    )
    cents = spark.read.parquet(f"{path}/_centroids")
    # dropDuplicates: physically remove the duplicate sidecar rows a
    # crash-replayed absorb can leave (same id -> same vector; one
    # hash agg inside a full rewrite is in the noise)
    full = spark.read.parquet(f"{path}/_full").dropDuplicates(["id"])
    tomb = _tombstone_df(spark, path)
    if tomb is not None:
        trunc = trunc.join(F.broadcast(tomb), "id", "left_anti")
        full = full.join(F.broadcast(tomb), "id", "left_anti")
    tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
    (
        trunc.repartition(F.col("centroid_id"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", int(max_records_per_file))
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/_centroids")
    (
        full.repartitionByRange(int(full_files), "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .option("parquet.block.size", int(full_row_group_bytes))
        .parquet(f"{tmp}/_full")
    )
    # validation read before the swap, like bm25_compact: a failed
    # rewrite must never replace a servable layout
    n = spark.read.parquet(tmp).count()
    tmp_p = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(tmp))
    old = fs.makeQualified(
        jvm.org.apache.hadoop.fs.Path(f"{path}.old-{_uuid.uuid4().hex}")
    )
    swap_via_rename(fs, dst, tmp_p, old, label="truncated_ivf_compact")
    return n


def truncated_ivf_maintain(
    spark,
    store_path: str,
    *,
    ratio: float = 4.0,
    max_splits: int = 2,
    n_splits: int = 2,
    compact_min_full_files: Optional[int] = None,
    full_files: int = 8,
    full_row_group_bytes: int = 1 << 16,
) -> dict:
    """The matryoshka store's nightly unit — :func:`ivf_maintain` for
    the truncated tree (the tree IS an IVF store at coarse width, so
    hot-centroid detection and the split compose unchanged) plus the
    tier's OTHER maintenance debt: :func:`truncated_ivf_append` leaves
    one ``full_files``-file segment in the ``_full`` sidecar per batch,
    and once the data-file count passes ``compact_min_full_files`` the
    whole layout is folded by :func:`truncated_ivf_compact` (which
    copies centroids verbatim — a split executed moments earlier
    survives the fold; splits therefore run FIRST so the fold
    co-locates their rewritten partitions too). Returns the action log
    ``{"splits": [...], "full_files": n | None, "compacted_rows":
    n | None}`` — all ``[]``/``None`` on a healthy store, so a
    scheduler runs it unconditionally and alerts on activity.
    ``compact_min_full_files=None`` (default) never auto-compacts.
    Single-writer contract, same as every piece it composes."""
    actions: dict = {
        "splits": ivf_maintain(
            spark, store_path, ratio=ratio, max_splits=max_splits,
            n_splits=n_splits,
        ),
        "full_files": None,
        "compacted_rows": None,
    }
    if compact_min_full_files is not None:
        from ..serving import _fs_and_path

        filesystem, root = _fs_and_path(store_path)
        n_files = _data_file_count(filesystem, f"{root}/_full")
        actions["full_files"] = n_files
        if n_files > int(compact_min_full_files):
            actions["compacted_rows"] = truncated_ivf_compact(
                spark, store_path, full_files=full_files,
                full_row_group_bytes=full_row_group_bytes,
            )
    return actions


def _sidecar_vectors_local(store_path: str):
    """Driver-side pyarrow read of a store's ``_centroids`` sidecar as
    the ``(ids int64[n], M float64[n, d], null_mask bool[n])`` triple
    :func:`~lshrs_spark.functions.batchscore.collect_vectors` returns —
    the no-Spark-job twin of collecting the sidecar DataFrame, with the
    same fallback contract: ``None`` on any read error or mixed vector
    widths (the caller's Catalyst path handles those)."""
    import numpy as _np

    try:
        import pyarrow.dataset as pads

        from ..serving import _fs_and_path

        filesystem, root = _fs_and_path(store_path)
        tbl = pads.dataset(
            f"{root}/_centroids", format="parquet", filesystem=filesystem
        ).to_table(columns=["centroid_id", "cvec"])
    except Exception:
        return None
    from ..functions import batchscore as B

    if tbl.num_rows > B.MAX_COLLECT_ROWS:
        # same driver-residency bound as collect_vectors: a centroid
        # table past it falls back to the Catalyst plan either way
        return None
    ids = _np.asarray(
        tbl.column("centroid_id").to_numpy(zero_copy_only=False),
        dtype=_np.int64,
    )
    if len(_np.unique(ids)) != len(ids):
        return None  # duplicate ids: same contract as collect_vectors
    vecs = tbl.column("cvec").to_pylist()
    dim = 0
    for v in vecs:
        if v is not None:
            dim = len(v)
            break
    M = _np.zeros((len(vecs), dim), dtype=_np.float64)
    null_mask = _np.zeros(len(vecs), dtype=bool)
    for i, v in enumerate(vecs):
        if v is None:
            null_mask[i] = True
        elif len(v) != dim:
            return None  # mixed widths: Catalyst plan handles per-row
        elif None in v:
            null_mask[i] = True  # element NULL nulls the Catalyst fold
        else:
            M[i, :] = _np.asarray(v, dtype=_np.float64)
    return ids, M, null_mask


def truncated_topk_stored(
    spark,
    store_path: str,
    queries: DataFrame,
    k: int,
    *,
    coarse_k: Optional[int] = None,
    nprobe: int = 4,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    extra_filter=None,
    refine: str = "auto",
    refine_pushdown_limit: int = 20_000,
) -> DataFrame:
    """Spark-side matryoshka batch query against a STORED truncated
    layout (:func:`truncated_ivf_write_store`, incrementally maintained
    by :func:`truncated_ivf_append`): coarse IVF probe over the
    truncated tree — the stored centroid table is read, the probed
    centroid ids become partition pruning, and every scanned byte is
    ``coarse_dims/dim`` wide, so the two prunings compose — then exact
    full-width cosine rerank of the bounded shortlist from the
    ``_full`` sidecar. ``(qid, id, score, rank)``, same contract as
    :func:`truncated_topk`; the no-Spark-job twin is
    :class:`~lshrs_spark.serving.TruncatedIVFServer`.

    Scale shape of the refine (``refine=``):

    - ``"pushdown"``: the coarse shortlist is collected (bounded by
      ``len(queries) × coarse_k`` — a CALLER-sized quantity, unlike a
      corpus-growing tombstone list, so the bounded ``isin`` literal
      is safe) and pushed into the sidecar scan as a native parquet
      ``In`` filter; row-group min/max stats on the id-SORTED sidecar
      prune the read to intersecting groups, so the refine costs
      O(shortlist), not O(corpus) — at 100 TB this is the only refine
      that stays affordable for a small query batch.
    - ``"scan"``: ONE shared columnar pass over the sidecar joined
      against the broadcast shortlist — amortizes across a LARGE
      batch, where the shortlist approaches the corpus anyway and a
      driver round-trip per query batch is wasted work.
    - ``"auto"`` (default): ``"pushdown"`` when the shortlist is small
      (``len(queries) × coarse_k <= refine_pushdown_limit`` — the cap
      also bounds the collected rows and the plan-literal size; the
      multi-MB-plan trap is documented in the repo) AND the sidecar is
      big enough that a full pass dominates the pushdown's extra
      driver round-trip (>= 256 MB on disk — measured: at a 20 MB
      sidecar the shared scan is ~1.7× faster, the pushdown's two
      sequential jobs pure overhead), else ``"scan"``.

    Tombstones are honored via the coarse stage
    (:func:`ivf_topk_stored` anti-joins ``_deleted``); the inner
    shortlist join keeps the sidecar's dead rows out by construction.

    r14: the query batch is collected ONCE (bounded, the quantity the
    previous plan broadcast) and every derived need — the truncated
    probe matrix, the refine='auto' batch-size test, the coarse
    probes, the full-width refine scores — is served from the driver
    matrices instead of its own Spark job (the line was
    dispatch-bound: cents-dims collect, queries.count, probe-ranking
    collect were three extra driver-synchronous jobs per batch)."""
    from ..functions import batchscore as B

    cents = spark.read.parquet(f"{store_path}/_centroids")
    if refine not in ("auto", "scan", "pushdown"):
        raise ValueError(
            f"refine must be 'auto', 'scan' or 'pushdown' (got {refine!r})"
        )
    got = B.collect_vectors(queries.select(
        F.col(qid_col).cast("long"), F.col(qvec_col)))
    # r14 (dispatch): the centroid sidecar is a tiny store-owned table —
    # read it driver-side through pyarrow (the serving tier's path)
    # instead of a Spark collect job. Same (ids, M, nulls) contract as
    # collect_vectors; downstream probe ranking tie-breaks on centroid
    # id, never array position, so row order is immaterial. Falls back
    # to the Spark collect on any read/shape surprise.
    cgot = _sidecar_vectors_local(store_path)
    if cgot is None:
        cgot = B.collect_vectors(cents.select(
            F.col("centroid_id").cast("long"), F.col("cvec")))
    if cgot is not None and len(cgot[0]):
        coarse_dims = int(cgot[1].shape[1])
    else:
        coarse_dims = int(
            cents.select(F.size("cvec").alias("d")).limit(1).collect()[0]["d"]
        )
    if coarse_k is None:
        coarse_k = max(4 * k, k)
    if coarse_k < k:
        raise ValueError(
            f"coarse_k ({coarse_k}) must be >= k ({k}) — the rerank can "
            f"only reorder the shortlist, not extend it"
        )
    tq = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.slice(F.col(qvec_col), 1, coarse_dims).alias("qvec"),
    )
    qm_t = None
    qm_full = None
    n_queries = None
    if got is not None:
        qids, Qraw, q_nulls = got
        n_queries = len(qids)
        if Qraw.shape[1] >= coarse_dims:
            qm_t = (qids,) + B.seq_unit(
                Qraw[:, :coarse_dims].copy(), q_nulls)
        qm_full = (qids,) + B.seq_unit(Qraw, q_nulls)
    coarse = ivf_topk_stored(
        spark, store_path, cents, tq, coarse_k, nprobe,
        extra_filter=extra_filter, _qm=qm_t, _cm=cgot,
    )
    if refine == "auto":
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{store_path}/_full")
        side_bytes = (
            p.getFileSystem(spark._jsc.hadoopConfiguration())
            .getContentSummary(p).getLength()
        )
        if n_queries is None:
            n_queries = queries.count()
        refine = (
            "pushdown"
            if (n_queries * coarse_k <= refine_pushdown_limit
                and side_bytes >= (1 << 28))
            else "scan"
        )
    full_raw = spark.read.parquet(f"{store_path}/_full")
    shortlist = coarse.select("qid", "id")
    if refine == "pushdown":
        rows = shortlist.collect()  # bounded: len(queries) * coarse_k
        if rows:
            shortlist = spark.createDataFrame(
                [(int(r.qid), int(r.id)) for r in rows], "qid long, id long"
            )
            full_raw = full_raw.filter(
                F.col("id").isin(sorted({int(r.id) for r in rows}))
            )
    if qm_full is not None:
        fn, schema = B.make_pair_score_fn(*qm_full, normalize_vectors=True)
        scored = (
            shortlist.join(
                full_raw.select(
                    F.col("id").cast("long").alias("id"),
                    F.col("embedding").alias("_vraw"),
                ),
                "id",
            )
            .select("qid", "id", "_vraw")
            .mapInArrow(fn, schema)
            # a crash-replayed truncated_ivf_absorb_staging leaves
            # duplicate sidecar rows (same id -> same vector -> same
            # score) until the next compaction; dedupe on the bounded
            # post-join shortlist, never the sidecar scan
            .dropDuplicates(["qid", "id"])
        )
    else:
        full = full_raw.select(
            F.col("id").cast("long").alias("id"),
            _unit(F.col("embedding")).alias("_v"),
        )
        q = F.broadcast(queries.select(
            F.col(qid_col).cast("long").alias("qid"),
            _unit(F.col(qvec_col)).alias("_q"),
        ))
        scored = (
            shortlist
            .join(full, "id")
            .join(q, "qid")
            .select(
                "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score")
            )
            .dropDuplicates(["qid", "id"])
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def ivf_topk_stored(
    spark,
    store_path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    *,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    extra_filter=None,
    _qm=None,
    _cm=None,
) -> DataFrame:
    """IVF query against a stored layout (``ivf_write_store``): probed
    centroid ids become a partition-pruning ``isin`` filter on the scan —
    identical results to :func:`ivf_topk`, a fraction of the I/O.

    ``extra_filter`` (optional Column) is the FILTERED-ANN hook — a
    metadata predicate over columns stored in the layout
    (``ivf_write_store(extra_cols=...)``). It is applied to the scan
    itself, so Catalyst pushes it into the parquet reader
    (``PushedFilters`` + row-group stats skipping) where it COMPOSES
    with the centroid partition pruning: two independent prunings on
    one scan, and because the predicate cuts candidates BEFORE
    ranking, the query never underfills ``k`` the way post-filtering a
    top-k does."""
    qm = _qm if _qm is not None else _collect_queries(
        queries, qid_col, qvec_col, normalize=True)
    if qm is not None:
        # Probe ranking runs ENTIRELY driver-side from the collected
        # query/centroid matrices (bit-exact window order) — the
        # previous shape paid one cross-join + window + collect Spark
        # job just to rank nqueries x K tiny rows before the scan
        # (dispatch-bound cost on every stored query; guide §1.2).
        probe_rows = _probe_rows_local(qm, centroids, nprobe, cgot=_cm)
        if probe_rows is None:
            qm = None  # uncollectable centroid table: Catalyst path
    if qm is None:
        q = queries.select(
            F.col(qid_col).cast("long").alias("qid"),
            _unit(F.col(qvec_col)).alias("_q"),
        )
        probe_rows = [
            (int(r.qid), int(r.centroid_id))
            for r in _nearest_centroids(
                q, centroids, nprobe, "qid", "_q").collect()
        ]
    probe_cids = sorted({cid for _, cid in probe_rows})
    probes = spark.createDataFrame(probe_rows, "qid long, centroid_id long")
    store = spark.read.parquet(store_path).filter(
        F.col("centroid_id").isin(probe_cids)  # -> PartitionFilters on the scan
    )
    if extra_filter is not None:
        store = store.filter(extra_filter)     # -> PushedFilters on the scan
    store = _apply_ivf_tombstones(spark, store, store_path)
    if qm is not None:
        from ..functions import batchscore as B

        fn, schema = B.make_pair_score_fn(*qm, normalize_vectors=True)
        scored = (
            F.broadcast(probes).join(
                store.select(
                    F.col("centroid_id").cast("long").alias("centroid_id"),
                    "id", F.col("embedding").alias("_vraw"),
                ),
                "centroid_id",
            )
            .select("qid", "id", "_vraw")
            .mapInArrow(fn, schema)
        )
    else:
        v = store.select(
            F.col("centroid_id").cast("long").alias("centroid_id"),
            "id",
            _unit(F.col("embedding")).alias("_v"),
        )
        scored = (
            probes.join(v, "centroid_id")
            .join(F.broadcast(q), "qid")
            .select("qid", "id",
                    dot_product(F.col("_q"), F.col("_v")).alias("score"))
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int,
    iterations: int = 2,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_decimals: int = 5,
) -> DataFrame:
    """DataFrame-native Lloyd's k-means by cosine: ``(centroid_id, cvec)``
    — the quality upgrade over :func:`ivf_centroids_by_id` for the IVF
    tier, same downstream plan. Deterministic end to end: init = the k
    lowest-id vectors, ties broken by centroid id, and centroids are
    QUANTIZED (rounded) at every iteration boundary so a SQL oracle can
    unroll the exact same rounds without float drift compounding.
    Empty centroids are dropped (inner-join semantics, same as the
    oracle). Each iteration is one broadcast cross join (n·k scores) +
    one explode/avg shuffle — no driver-side loops over data."""
    quant = F.transform(
        F.col(vector_col), lambda x: F.round(x.cast("double"), round_decimals)
    )
    cents = (
        vectors.orderBy(F.col(id_col))
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("centroid_id"),
            quant.alias("cvec"),
        )
    )
    pts = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vector_col).alias("_v")
    )
    w = Window.partitionBy("id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    for _ in range(iterations):
        # cosine in the dot/(norm*norm) form — bit-identical to the
        # oracle's formula, so assignments can't drift cross-engine
        scored = pts.crossJoin(F.broadcast(cents)).select(
            "id",
            "_v",
            "centroid_id",
            cosine_similarity(F.col("_v"), F.col("cvec")).alias("_cs"),
        )
        assign = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("centroid_id", "_v")
        )
        means = (
            assign.select(
                "centroid_id",
                F.posexplode(
                    F.transform(F.col("_v"), lambda x: x.cast("double"))
                ).alias("pos", "val"),
            )
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("val"), round_decimals).alias("v"))
        )
        cents = means.groupBy("centroid_id").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("cvec")
        )
    return cents


def ivf_delete(store_path: str, ids) -> None:
    """Tombstone ids in a stored IVF layout without rewriting any
    partition: appends one small parquet file to
    ``{store_path}/_deleted``; a live
    :class:`~lshrs_spark.serving.IVFServer` drops those ids at its next
    ``refresh()``. Rewrite the store (``ivf_write_store``) to compact
    tombstones away. Written driver-side via pyarrow.fs — works for
    object-store URIs, no Spark job for a handful of ids."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..serving import _fs_and_path

    filesystem, root = _fs_and_path(store_path)
    filesystem.create_dir(f"{root}/_deleted", recursive=True)
    tbl = pa.table({"id": pa.array([int(i) for i in ids], pa.int64())})
    with filesystem.open_output_stream(
        f"{root}/_deleted/del_{uuid.uuid4().hex}.parquet"
    ) as sink:
        pq.write_table(tbl, sink)


def _tombstone_files(store_path: str) -> list[str]:
    """Parquet file paths inside the ``_deleted`` sidecar (empty when the
    sidecar is absent) — listed driver-side via pyarrow.fs so object-store
    URIs work, but never *read* driver-side: the sidecar is unbounded (a
    GDPR-scale deletion workload accumulates millions of ids between
    compactions), so consumers join it as a DataFrame relation."""
    from pyarrow.fs import FileSelector, FileType

    from ..serving import _fs_and_path

    filesystem, root = _fs_and_path(store_path)
    deleted = f"{root}/_deleted"
    if filesystem.get_file_info(deleted).type == FileType.NotFound:
        return []
    return [
        f.path
        for f in filesystem.get_file_info(FileSelector(deleted))
        if f.path.endswith(".parquet")
    ]


def _tombstone_df(spark, store_path: str) -> Optional[DataFrame]:
    """The ``_deleted`` sidecar as a distinct-``id`` DataFrame, or None
    when absent/empty. Stays a relation end-to-end — tombstone count
    never enters a driver list or a plan literal."""
    if not _tombstone_files(store_path):
        return None
    return spark.read.parquet(f"{store_path}/_deleted").select(
        F.col("id").cast("long").alias("id")
    ).distinct()


def _apply_ivf_tombstones(spark, store: DataFrame, store_path: str) -> DataFrame:
    """Filter tombstoned ids out of a stored-IVF scan so the Spark query
    path agrees with a tombstone-aware :class:`~lshrs_spark.serving.
    IVFServer` over the same directory.

    Scale shape: a broadcast ``left_anti`` join against the sidecar
    *relation* (matching the LSH index path, ``core.py``'s load) — never
    an ``isin`` literal, whose plan size grows with the tombstone count
    and OOMs the driver under a real deletion workload. Broadcast is safe
    by contract: the sidecar is bounded by compaction cadence and is
    ≪ the index it filters."""
    tomb = _tombstone_df(spark, store_path)
    if tomb is None:
        return store
    return store.join(F.broadcast(tomb), "id", "left_anti")


def ivf_compact(spark, store_path: str, *, min_files: int | None = None) -> None:
    """Merge the ``_deleted`` tombstone sidecar into the stored IVF
    partitions and clear it — the periodic maintenance step that keeps
    delete cost O(tombstones) at write time and restores scan purity.
    With ``min_files`` set, ALSO folds any ``centroid_id=N`` directory
    holding more than that many files back to one co-located file set
    (the LSM fold for :func:`ivf_append`'s accumulation — each
    co-located append adds one file per touched partition, so nightly
    appends grow the per-probe open cost until a fold; file counts are
    listed driver-side, bounded by the partition count).

    Scale shape: only partitions that actually CONTAIN a tombstoned id
    (or exceed ``min_files``) are rewritten (tombstone discovery via an
    id-pushed scan — parquet row-group stats skip clean partitions);
    each affected ``centroid_id=N`` directory is swapped via a
    per-partition ASIDE rename (live dir moved aside, rewritten copy
    moved in, aside deleted — either the live directory or its
    complete pre-compact copy exists at every instant, and
    ``_heal_compact_aside`` restores a crashed swap at the start of
    the next call), so an untimely failure leaves either the old
    tombstone-consistent state or the new compacted state, never a
    lost or half-rewritten partition. File ops go through pyarrow.fs —
    works for object-store URIs. No-op (beyond healing) when the
    sidecar is absent/empty and no partition is over the file
    bound."""
    from ..serving import _fs_and_path

    filesystem, root = _fs_and_path(store_path)
    _heal_compact_aside(filesystem, root)

    def _rm_dir(path: str) -> None:
        try:
            filesystem.delete_dir(path)
        except (FileNotFoundError, OSError):
            pass

    tomb = _tombstone_df(spark, store_path)
    fat = (
        _fat_partitions(filesystem, root, int(min_files))
        if min_files is not None else []
    )
    if tomb is None and not fat:
        _rm_dir(f"{root}/_deleted")
        return
    if tomb is not None:
        tomb = tomb.persist()
    try:
        _ivf_compact_body(spark, store_path, tomb, filesystem, root,
                          _rm_dir, extra_affected=fat)
    finally:
        if tomb is not None:
            tomb.unpersist()
    _rm_dir(f"{root}/_deleted")


def _heal_compact_aside(filesystem, root: str) -> None:
    """Crash healing for :func:`ivf_compact`'s per-partition aside
    swap: a run that died between moving ``centroid_id=N`` aside and
    moving its rewritten copy in leaves a complete
    ``_compact_aside_<uuid>_N`` directory — restore it if the live
    directory is missing, drop it otherwise; dead ``_compact_tmp_*``
    trees from crashed runs are swept too (single-writer contract, so
    any such tree belongs to a dead run). Idempotent; runs at the top
    of every compact."""
    from pyarrow.fs import FileSelector, FileType

    for info in filesystem.get_file_info(
        FileSelector(root, allow_not_found=True)
    ):
        name = info.path.rsplit("/", 1)[-1]
        if name.startswith("_compact_aside_"):
            cid = name.rsplit("_", 1)[-1]
            final = f"{root}/centroid_id={cid}"
            if filesystem.get_file_info(final).type == FileType.NotFound:
                filesystem.move(info.path, final)
            else:
                filesystem.delete_dir(info.path)
        elif name.startswith("_compact_tmp_"):
            filesystem.delete_dir(info.path)


def _data_file_count(filesystem, path: str) -> int:
    """Data files directly under ``path`` — hidden names excluded:
    Hadoop's local-fs committer leaves ``.<name>.crc`` checksum
    siblings next to every parquet file (and ``_``-prefixed markers),
    which would double the apparent count and make freshly folded
    directories look over their file bound again."""
    from pyarrow.fs import FileSelector, FileType

    return sum(
        1
        for f in filesystem.get_file_info(
            FileSelector(path, allow_not_found=True)
        )
        if f.type == FileType.File
        and not f.path.rsplit("/", 1)[-1].startswith((".", "_"))
    )


def _fat_partitions(filesystem, root: str, min_files: int) -> list[int]:
    """Centroid ids of partitions holding more than ``min_files``
    data files — a driver-side directory listing, bounded by the
    partition count (never the corpus)."""
    from pyarrow.fs import FileSelector, FileType

    out = []
    for info in filesystem.get_file_info(
        FileSelector(root, allow_not_found=True)
    ):
        name = info.path.rsplit("/", 1)[-1]
        if info.type == FileType.Directory and name.startswith("centroid_id="):
            if _data_file_count(filesystem, info.path) > min_files:
                out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _ivf_compact_body(spark, store_path, tomb, filesystem, root, _rm_dir,
                      extra_affected=()):
    import uuid as _uuid

    store = spark.read.parquet(store_path)
    # Affected-partition discovery is a semi-join against the tombstone
    # RELATION (never an isin literal over the id list — unbounded).
    # The collected result is centroid ids only: bounded by nlist, small
    # by construction, and it must reach the driver anyway to drive the
    # per-partition swap below.
    affected = sorted(
        set(
            r.centroid_id
            for r in store.join(F.broadcast(tomb), "id", "left_semi")
            .select("centroid_id")
            .distinct()
            .collect()
        ) | set(extra_affected)
    ) if tomb is not None else sorted(set(extra_affected))
    if affected:
        rewritten_rows = store.filter(F.col("centroid_id").isin(affected))
        if tomb is not None:
            rewritten_rows = rewritten_rows.join(
                F.broadcast(tomb), "id", "left_anti"
            )
        tmp = f"{store_path}/_compact_tmp_{_uuid.uuid4().hex}"
        (
            rewritten_rows
            # co-locate the rewritten partitions (same trap
            # ivf_write_store fixed in r8: unco-located partitionBy
            # emits tasks x centroids tiny files)
            .repartition(F.col("centroid_id"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 1 << 22)
            .partitionBy("centroid_id")
            .parquet(tmp)
        )
        tmp_root = f"{root}/{tmp.rsplit('/', 1)[-1]}"
        from pyarrow.fs import FileType

        for cid in affected:
            final = f"{root}/centroid_id={cid}"
            rewritten = f"{tmp_root}/centroid_id={cid}"
            if filesystem.get_file_info(rewritten).type == FileType.NotFound:
                # every row in the partition was tombstoned — it is gone
                filesystem.delete_dir(final)
                continue
            # aside swap, never delete-then-move: a crash between a
            # delete and the move would lose the partition outright
            # (the min_files fold routes HEALTHY partitions through
            # here on a routine cadence); with the aside, either the
            # live dir or its complete pre-compact copy exists at every
            # instant and _heal_compact_aside restores it on the next
            # call. The restored copy predates tombstone application,
            # which stays correct because the _deleted sidecar is only
            # cleared after every swap completed.
            aside = f"{root}/_compact_aside_{_uuid.uuid4().hex}_{cid}"
            if filesystem.get_file_info(final).type != FileType.NotFound:
                filesystem.move(final, aside)
            filesystem.move(rewritten, final)
            if filesystem.get_file_info(aside).type != FileType.NotFound:
                filesystem.delete_dir(aside)
        _rm_dir(tmp_root)


def _heal_centroids_aside(filesystem, root: str) -> None:
    """Crash healing for :func:`ivf_split_centroid`'s sidecar swap: if
    a previous run died between moving the live ``_centroids`` aside
    and moving its staged replacement in, restore the (complete,
    pre-swap) aside copy; if the swap completed but the aside delete
    did not, drop the leftover. Dead ``_centroids_stage_*`` trees from
    crashed runs are swept too. Idempotent; called before every split
    so the store self-repairs on the next maintenance pass."""
    from pyarrow.fs import FileSelector, FileType

    live = f"{root}/_centroids"
    have_live = filesystem.get_file_info(live).type != FileType.NotFound
    for info in filesystem.get_file_info(
        FileSelector(root, allow_not_found=True)
    ):
        name = info.path.rsplit("/", 1)[-1]
        if name.startswith("_centroids_aside_"):
            if have_live:
                filesystem.delete_dir(info.path)
            else:
                filesystem.move(info.path, live)
                have_live = True
        elif name.startswith("_centroids_stage_"):
            # staged tables are moved in before their aside is deleted,
            # so any stage still named this way belongs to a dead run
            filesystem.delete_dir(info.path)


def _heal_unlisted_partitions(filesystem, root: str) -> None:
    """Delete ``centroid_id=N`` directories absent from the
    ``_centroids`` sidecar — the residue of a split that crashed
    around its sidecar swap. Safe under the single-writer contract:
    an unlisted directory is never probed, and its rows either still
    live in the pre-crash partition (crash before the swap) or are
    the retired pre-split copy (crash after). Without this sweep,
    :func:`ivf_maintain`'s hot detection double-counts the duplicated
    rows and can spend its split budget on phantom ids. No-op when the
    sidecar itself is missing (a layout written with
    ``store_centroids=False`` has nothing to reconcile against)."""
    import pyarrow.dataset as pads
    from pyarrow.fs import FileSelector, FileType

    side = f"{root}/_centroids"
    if filesystem.get_file_info(side).type == FileType.NotFound:
        return
    listed = set(
        int(c)
        for c in pads.dataset(side, format="parquet", filesystem=filesystem)
        .to_table(columns=["centroid_id"])
        .column("centroid_id")
        .to_pylist()
    )
    for info in filesystem.get_file_info(
        FileSelector(root, allow_not_found=True)
    ):
        name = info.path.rsplit("/", 1)[-1]
        if (
            info.type == FileType.Directory
            and name.startswith("centroid_id=")
            and int(name.split("=", 1)[1]) not in listed
        ):
            filesystem.delete_dir(info.path)


def ivf_hot_centroids(
    spark, store_path: str, *, ratio: float = 4.0, store_df=None
) -> list[tuple[int, int]]:
    """``[(centroid_id, rows)]`` for stored-IVF partitions holding more
    than ``ratio`` x the mean partition size, largest first — the
    maintenance loop's split-target list for
    :func:`ivf_split_centroid`. One grouped count over the store
    (partition-column only: no vector bytes read); the collect is
    bounded by the centroid count, never the corpus. ``store_df``
    (optional) reuses a caller's already-resolved read of
    ``store_path`` — partition discovery over a wide store is itself a
    Spark job, and :func:`ivf_maintain` lists the tree once for the
    whole cycle."""
    counts = (
        (store_df if store_df is not None
         else spark.read.parquet(store_path))
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not counts:
        return []
    mean = sum(r.n for r in counts) / len(counts)
    return sorted(
        ((int(r.centroid_id), int(r.n)) for r in counts
         if r.n > ratio * mean),
        key=lambda t: (-t[1], t[0]),
    )


def ivf_split_centroid(
    spark, store_path: str, centroid_id: int, n_splits: int = 2
) -> list[int]:
    """Skew repair for a stored IVF layout: rewrite ONE hot centroid
    partition as ``n_splits`` sub-partitions, leaving every other
    partition untouched. The classic IVF failure at 100 TB is a hot
    centroid — a partition holding a large corpus fraction makes every
    probe that lands on it scan that fraction, and the co-located
    writer funnels it through one straggler task; splitting restores
    the ``~1/K`` per-probe read without re-clustering the world.

    Determinism contract (SQL-replayable, same recipe as
    :func:`ivf_centroids_by_id`): sub-centroids are the ``n_splits``
    lowest-id rows OF THE SPLIT PARTITION, new centroid ids allocated
    ``max(existing) + 1 ..`` in that same row-id order, reassignment
    among the sub-centroids only by (cosine desc, centroid id asc).
    Metadata ``extra_cols`` ride through unchanged.

    Sequencing (each step idempotent to re-run after a crash): new
    sub-partitions land under an ``_``-prefixed tmp (invisible to
    dataset discovery), move into the root (not yet probed — the
    ``_centroids`` sidecar doesn't list them; a destination directory
    left by a crashed earlier run is deleted first, so the re-run's
    move never hits the local filesystem's refusal to rename onto a
    non-empty directory — ADVICE r9), sidecar swapped by moving the
    live table ASIDE and the staged table in (two renames — at every
    instant either ``_centroids`` or its complete ``_centroids_aside``
    copy exists, never the no-sidecar window a delete-then-move had —
    ADVICE r9; a crash between the renames is healed at the next call,
    which restores the aside copy before reading), THEN the old
    directory deleted. A server refresh anywhere in the window serves
    a consistent view (probes come from the sidecar, and the old id
    vanishes from it in the same step the new ids appear); a raw
    full-store Spark scan inside the final window can see the split
    rows twice — re-running the split heals it (a split id absent from
    the sidecar whose directory still exists is deleted and the call
    returns ``[]``).

    Returns the new centroid ids."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from pyarrow.fs import FileType

    from ..serving import _fs_and_path

    if n_splits < 2:
        raise ValueError(f"n_splits must be >= 2 (got {n_splits})")
    filesystem, root = _fs_and_path(store_path)
    _heal_centroids_aside(filesystem, root)
    cent_tbl = pads.dataset(
        f"{store_path}/_centroids", format="parquet"
    ).to_table()
    cids = cent_tbl.column("centroid_id").to_numpy(zero_copy_only=False)
    old_dir = f"{root}/centroid_id={int(centroid_id)}"
    if int(centroid_id) not in set(int(c) for c in cids):
        # crash-healing fast path: a previous split already swapped the
        # sidecar but died before removing the stale directory
        if filesystem.get_file_info(old_dir).type != FileType.NotFound:
            filesystem.delete_dir(old_dir)
            return []
        raise ValueError(
            f"centroid {centroid_id} not present in {store_path}/_centroids"
        )
    part = spark.read.parquet(store_path).filter(
        F.col("centroid_id") == int(centroid_id)
    )
    if "embedding" not in part.columns:
        raise ValueError(
            "store has no raw 'embedding' column (a PQ/IVFADC code "
            "layout) — splitting needs to re-derive sub-centroids and "
            "reassign, which code-only layouts cannot support without "
            "the source vectors; rebuild the store with more centroids "
            "instead"
        )
    data_cols = [c for c in part.columns if c != "centroid_id"]
    subs = (
        part.orderBy("id")
        .limit(int(n_splits))
        .select("id", F.col("embedding").cast("array<double>").alias("cvec"))
    )
    new_first = int(max(int(c) for c in cids)) + 1
    w = Window.orderBy("id")
    sub_cents = subs.select(
        (F.row_number().over(w) + F.lit(new_first - 1))
        .cast("long")
        .alias("centroid_id"),
        "cvec",
    )
    assign = ivf_assign(part, sub_cents, id_col="id", vector_col="embedding")
    tmp = f"{store_path}/_split_tmp_{_uuid.uuid4().hex}"
    (
        part.select(*data_cols)
        .join(assign, "id")
        .repartition(F.col("centroid_id"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1 << 22)
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    # new sidecar staged driver-side (the table is tiny by contract);
    # a partition smaller than n_splits yields fewer sub-centroids
    keep = [i for i, c in enumerate(cids) if int(c) != int(centroid_id)]
    sub_rows = {
        int(r.centroid_id): [float(x) for x in r.cvec]
        for r in sub_cents.collect()
    }
    new_ids = sorted(sub_rows)
    new_sidecar = pa.table({
        "centroid_id": pa.array(
            [int(cids[i]) for i in keep] + sorted(sub_rows), pa.int64()
        ),
        "cvec": pa.array(
            [cent_tbl.column("cvec")[i].as_py() for i in keep]
            + [sub_rows[c] for c in sorted(sub_rows)],
            pa.list_(pa.float64()),
        ),
    })
    stage = f"{root}/_centroids_stage_{_uuid.uuid4().hex}"
    filesystem.create_dir(stage, recursive=True)
    with filesystem.open_output_stream(f"{stage}/part-0.parquet") as sink:
        pq.write_table(new_sidecar, sink)
    tmp_root = f"{root}/{tmp.rsplit('/', 1)[-1]}"
    for cid in sorted(sub_rows):
        src = f"{tmp_root}/centroid_id={cid}"
        if filesystem.get_file_info(src).type != FileType.NotFound:
            dest = f"{root}/centroid_id={cid}"
            if filesystem.get_file_info(dest).type != FileType.NotFound:
                # a crashed earlier run already moved this sub-partition
                # in (its id is not yet in the sidecar, so it was never
                # probed) — drop it first: the local filesystem's move
                # refuses to rename onto a non-empty directory, which
                # would break the re-run-to-heal contract (ADVICE r9)
                filesystem.delete_dir(dest)
            filesystem.move(src, dest)
        # else: no row landed on this sub-centroid (possible when the
        # partition is smaller than n_splits) — the sidecar still lists
        # it; an empty probe is correct
    try:
        filesystem.delete_dir(tmp_root)
    except (FileNotFoundError, OSError):
        pass
    # sidecar swap via two renames (ADVICE r9: delete-then-move had a
    # window with NO readable centroid table; now either the live table
    # or its complete aside copy exists at every instant, and
    # _heal_centroids_aside restores the aside if a crash lands between
    # the renames)
    aside = f"{root}/_centroids_aside_{_uuid.uuid4().hex}"
    filesystem.move(f"{root}/_centroids", aside)
    filesystem.move(stage, f"{root}/_centroids")
    filesystem.delete_dir(aside)
    filesystem.delete_dir(old_dir)
    return new_ids


def _split_centroids_one_swap(
    spark, store_path: str, hot: list[tuple[int, int]], n_splits: int,
    store_df=None,
) -> list[dict]:
    """Batched skew repair for :func:`ivf_maintain` (VERDICT r11 #4):
    split EVERY hot partition in ``hot`` (detection order, largest
    first) against the pre-split centroid list, with ONE combined
    rewrite job and ONE sidecar swap at the end — at small stores the
    sequential form's wall time is dominated by driver-synchronous
    fixed overhead (one Spark write + one swap per split), which this
    halves; at scale the cost stays partition-row-bounded either way.

    Result-identical to running :func:`ivf_split_centroid` over
    ``hot`` sequentially: sub-centroids are each partition's
    ``n_splits`` lowest-id rows, new ids are allocated
    ``max(existing) + 1 ..`` advancing by each split's ACTUAL
    sub-centroid count in detection order (exactly the running
    maximum the sequential form re-reads from the swapped sidecar),
    and reassignment stays within each split partition's own
    sub-centroids by (cosine desc, centroid id asc) — so the
    ``ann_ivf_maintain`` oracle's sequential SQL replay still matches.

    Crash-safety sequencing (same windows as the single split, healed
    by the same writers): the combined rewrite lands under an
    ``_``-prefixed tmp (invisible); new sub-partitions move into the
    root UNLISTED (the live sidecar doesn't name them, so they are
    never probed — a crash anywhere before the swap leaves the old
    partitions intact and live, and :func:`_heal_unlisted_partitions`
    sweeps the orphans on the next maintenance pass); the sidecar
    swaps ONCE via two renames through an aside (a crash between them
    is restored by :func:`_heal_centroids_aside`); only then are the
    retired partition directories deleted (a crash before that sweep
    leaves them unlisted — same heal). The batch form never creates a
    window the sequential form didn't have: it simply keeps ALL old
    partitions live until the single swap instead of retiring them
    one swap at a time.

    Returns the action log ``[{"centroid_id", "rows", "new_ids"}]``.
    Reference parity: the reference has no maintenance loop at all
    (its Redis SETs just grow — ``README.md:216`` in /root/reference);
    this is the Spark-native hot-bucket answer."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from pyarrow.fs import FileType

    from ..serving import _fs_and_path

    if n_splits < 2:
        raise ValueError(f"n_splits must be >= 2 (got {n_splits})")
    if not hot:
        return []
    filesystem, root = _fs_and_path(store_path)
    cent_tbl = pads.dataset(
        f"{store_path}/_centroids", format="parquet"
    ).to_table()
    cids = cent_tbl.column("centroid_id").to_numpy(zero_copy_only=False)
    live = set(int(c) for c in cids)
    missing = [int(cid) for cid, _ in hot if int(cid) not in live]
    if missing:
        raise ValueError(
            f"centroids {missing} not present in {store_path}/_centroids"
        )
    if store_df is None:
        store_df = spark.read.parquet(store_path)
    if "embedding" not in store_df.columns:
        raise ValueError(
            "store has no raw 'embedding' column (a PQ/IVFADC code "
            "layout) — splitting needs to re-derive sub-centroids and "
            "reassign, which code-only layouts cannot support without "
            "the source vectors; rebuild the store with more centroids "
            "instead"
        )
    data_cols = [c for c in store_df.columns if c != "centroid_id"]
    split_id_list = [int(cid) for cid, _ in hot]
    # ONE bounded collect for every split partition's sub-centroid
    # candidates (each partition's n_splits lowest-id rows). The
    # previous shape ran one sort-limit collect per hot partition AND
    # re-computed that sort inside each partition's broadcast at write
    # time — at small stores those driver-synchronous dispatches were
    # most of the cycle's wall (DISPATCH_r14.json: 16 jobs against a
    # 169 ms one-task dispatch floor). At most max_splits * n_splits
    # rows come back.
    w = Window.partitionBy("_parent").orderBy("id")
    cand_rows = (
        store_df.filter(F.col("centroid_id").isin(split_id_list))
        .select(F.col("centroid_id").cast("long").alias("_parent"),
                "id",
                F.col("embedding").cast("array<double>").alias("cvec"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(n_splits))
        .collect()
    )
    by_parent: dict[int, list] = {}
    for r in cand_rows:
        by_parent.setdefault(int(r._parent), []).append(r)
    next_id = int(max(live)) + 1
    actions: list[dict] = []
    sub_rows_all: dict[int, list[float]] = {}
    sub_cent_local: list[tuple] = []
    for cid, rows in hot:
        # a partition smaller than n_splits yields fewer sub-centroids;
        # the id counter advances by the ACTUAL count (sequential parity)
        cands = sorted(by_parent.get(int(cid), []), key=lambda r: int(r.id))
        sub_rows: dict[int, list[float]] = {}
        for i, r in enumerate(cands):
            vec = [float(x) for x in r.cvec]
            sub_rows[next_id + i] = vec
            sub_cent_local.append((int(cid), next_id + i, vec))
        next_id += len(sub_rows)
        sub_rows_all.update(sub_rows)
        actions.append(
            {"centroid_id": int(cid), "rows": int(rows),
             "new_ids": sorted(sub_rows)}
        )
    # ONE shuffle-free assignment plan over all split partitions at
    # once: at most max_splits * n_splits sub-centroids exist and the
    # driver already holds them, so each point's winner is a flat
    # per-candidate cosine column (literal unit centroid, one fused
    # zip_with+fold each — the same dot count the join form paid) plus
    # a per-parent when-chain argmax. No broadcast, no join, and
    # (unlike a window over point id) no shuffle of the rewritten rows
    # before the write's own partitioning shuffle — at 100 TB the
    # split partitions are ~10 % of the corpus, so this halves the
    # bytes shuffled per cycle. Result-identical to the sequential
    # per-partition ivf_assign loop: same candidate set per point; the
    # centroid normalize runs driver-side replicating unit_or_null's
    # exact fold order (acc + x*x left to right, then sqrt, then x/n —
    # bit-identical IEEE-754 doubles); the chain takes a later
    # candidate only on a STRICTLY higher cosine with null scores
    # never displacing non-null, reproducing the window's
    # (cosine desc, centroid_id asc, nulls last) winner.
    import math as _math

    def _unit_py(vec: list[float]):
        s = 0.0
        for x in vec:
            s = s + x * x
        n = _math.sqrt(s)
        # null ONLY for an exact zero norm: Spark's `F.when(n > 0, ...)`
        # treats a NaN norm as TRUE (Spark orders NaN above every
        # numeric), so a NaN-bearing vector normalizes to NaNs there —
        # Python's `n > 0` is False for NaN and would diverge
        if n == 0.0:
            return None
        return [x / n for x in vec]

    cs_cols: dict[int, object] = {}
    by_parent_ids: dict[int, list[int]] = {}
    for p, ncid, vec in sub_cent_local:
        u = _unit_py(vec)
        cs_cols[ncid] = (
            dot_product(F.col("_uv"), F.array(*[F.lit(x) for x in u]))
            if u is not None else F.lit(None).cast("double")
        )
        by_parent_ids.setdefault(p, []).append(ncid)
    winner = None
    for cid in split_id_list:
        ncids = sorted(by_parent_ids[int(cid)])
        best_id = F.lit(ncids[0]).cast("long")
        best_cs = cs_cols[ncids[0]]
        for ncid in ncids[1:]:
            c = cs_cols[ncid]
            take = c.isNotNull() & (best_cs.isNull() | (c > best_cs))
            best_id = F.when(take, F.lit(ncid).cast("long")).otherwise(best_id)
            best_cs = F.when(take, c).otherwise(best_cs)
        winner = (
            F.when(F.col("_parent") == int(cid), best_id)
            if winner is None
            else winner.when(F.col("_parent") == int(cid), best_id)
        )
    rewrites = (
        store_df.filter(F.col("centroid_id").isin(split_id_list))
        .select(
            *data_cols,
            F.col("centroid_id").cast("long").alias("_parent"),
            _unit(F.col("embedding")).alias("_uv"),
        )
        .select(*data_cols, winner.alias("centroid_id"))
    )
    # ONE combined rewrite job for every split partition (each point
    # only ever competes among ITS partition's sub-centroids — the
    # per-parent literal candidate arrays keep the per-partition scopes)
    tmp = f"{store_path}/_split_tmp_{_uuid.uuid4().hex}"
    (
        rewrites.repartition(F.col("centroid_id"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1 << 22)
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    # ONE staged sidecar: every split id dropped, every sub id appended
    split_ids = {int(cid) for cid, _ in hot}
    keep = [i for i, c in enumerate(cids) if int(c) not in split_ids]
    new_sidecar = pa.table({
        "centroid_id": pa.array(
            [int(cids[i]) for i in keep] + sorted(sub_rows_all), pa.int64()
        ),
        "cvec": pa.array(
            [cent_tbl.column("cvec")[i].as_py() for i in keep]
            + [sub_rows_all[c] for c in sorted(sub_rows_all)],
            pa.list_(pa.float64()),
        ),
    })
    stage = f"{root}/_centroids_stage_{_uuid.uuid4().hex}"
    filesystem.create_dir(stage, recursive=True)
    with filesystem.open_output_stream(f"{stage}/part-0.parquet") as sink:
        pq.write_table(new_sidecar, sink)
    tmp_root = f"{root}/{tmp.rsplit('/', 1)[-1]}"
    for ncid in sorted(sub_rows_all):
        src = f"{tmp_root}/centroid_id={ncid}"
        if filesystem.get_file_info(src).type != FileType.NotFound:
            dest = f"{root}/centroid_id={ncid}"
            if filesystem.get_file_info(dest).type != FileType.NotFound:
                # a crashed earlier run already moved this sub-partition
                # in (unlisted, never probed) — drop it first: the local
                # filesystem's move refuses to rename onto a non-empty
                # directory (ADVICE r9)
                filesystem.delete_dir(dest)
            filesystem.move(src, dest)
        # else: no row landed on this sub-centroid — the sidecar still
        # lists it; an empty probe is correct
    try:
        filesystem.delete_dir(tmp_root)
    except (FileNotFoundError, OSError):
        pass
    # the batch's ONE sidecar swap (two renames through an aside — at
    # every instant either the live table or its complete aside copy
    # exists; _heal_centroids_aside restores a crash between them)
    aside = f"{root}/_centroids_aside_{_uuid.uuid4().hex}"
    filesystem.move(f"{root}/_centroids", aside)
    filesystem.move(stage, f"{root}/_centroids")
    filesystem.delete_dir(aside)
    for cid in sorted(split_ids):
        old_dir = f"{root}/centroid_id={cid}"
        if filesystem.get_file_info(old_dir).type != FileType.NotFound:
            filesystem.delete_dir(old_dir)
    return actions


def ivf_balance_report(spark, store_path: str, *, ratio: float = 4.0):
    """One-row health card for a stored IVF layout — the observability
    complement of the maintenance loop (:func:`ivf_hot_centroids` says
    WHAT to split, this says whether anything needs attention at all):
    ``(n_rows, n_partitions, mean_rows, max_rows, max_mean_ratio,
    gini, n_hot, n_tombstones, n_heal_pending)``. ``gini`` is the
    standard inequality
    coefficient over partition sizes (0 = perfectly balanced, → 1 =
    one partition holds everything) computed by the closed rank form
    ``Σ(2r − P − 1)·nᵣ / (P·Σn)`` over sizes ranked ascending with
    centroid-id tie-breaks — exact integer numerators, so a SQL oracle
    replays it; ``n_hot`` counts partitions above ``ratio``× the mean
    (the same rule :func:`ivf_maintain` splits on); ``n_tombstones``
    is the ``_deleted`` sidecar backlog (0 when absent), the
    compaction-debt signal. Row counts are PHYSICAL store rows —
    tombstoned ids still occupy files until :func:`ivf_compact`, which
    is exactly the debt ``n_tombstones`` measures.

    Scale shape: one grouped count over the partition column (no
    vector bytes), one bounded aggregation over P partition rows, one
    count of the (small-by-cadence) tombstone sidecar, one directory
    listing — a scheduler can run it every night and alert on
    thresholds without ever scanning vectors.

    The report is strictly READ-ONLY — it does NOT heal crash residue
    (ADVICE r10 asked to consider it; healing from here would make the
    card a store WRITER, and a scheduler racing it against a live
    ``ivf_compact`` could delete the compact's staging tree or restore
    a mid-swap aside, driving the compact's missing-rewrite check into
    its partition-delete branch — data loss from an "observability"
    call). Instead ``n_heal_pending`` counts leftover aside/tmp trees:
    nonzero means a maintenance writer crashed, the other counts on
    this card may EXCLUDE rows hidden in aside copies, and the next
    :func:`ivf_maintain` / :func:`ivf_compact` run (the writers, which
    heal first under the single-writer contract) will repair it."""
    from pyarrow.fs import FileSelector, FileType

    from ..serving import _fs_and_path
    from .skew import balance_stats

    filesystem, root = _fs_and_path(store_path)
    _residue = ("_compact_aside_", "_compact_tmp_", "_centroids_aside_",
                "_centroids_stage_", "_split_tmp_")
    n_heal = sum(
        1
        for info in filesystem.get_file_info(
            FileSelector(root, allow_not_found=True)
        )
        if info.type == FileType.Directory
        and info.path.rsplit("/", 1)[-1].startswith(_residue)
    )
    counts = (
        spark.read.parquet(store_path)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tomb = _tombstone_df(spark, store_path)
    n_tomb = int(tomb.count()) if tomb is not None else 0
    # the rank/stats machinery is the shared one-row balance card
    # (operators.skew.balance_stats) — bounded by the centroid count
    return balance_stats(counts, key_col="centroid_id", ratio=ratio) \
        .withColumn("n_tombstones", F.lit(n_tomb).cast("long")) \
        .withColumn("n_heal_pending", F.lit(n_heal).cast("long"))


def ivf_maintain(
    spark,
    store_path: str,
    *,
    ratio: float = 4.0,
    max_splits: int = 4,
    n_splits: int = 2,
) -> list[dict]:
    """The nightly IVF-maintenance unit (VERDICT r9 missing #3): ONE
    call that detects hot partitions once (:func:`ivf_hot_centroids` —
    a single grouped count over the store, no vector bytes read) and
    splits the top ``max_splits`` of them largest first, returning the
    action log ``[{"centroid_id", "rows", "new_ids"}]`` — empty when
    the store is already balanced, so a scheduler can run it
    unconditionally and alert on a non-empty log.

    Detection runs ONCE against the pre-split layout (splitting lowers
    the mean, so re-detecting between splits would chase a moving
    threshold) and only AFTER healing: a sidecar aside left by a
    crashed swap is restored, a compact crash's ``_compact_aside_*``
    partition copy is moved back live, and unlisted duplicate
    partition dirs are swept first, so detection never double-counts
    crash residue, ranks phantom ids, or scans a store with a
    partition silently missing. The splits themselves are BATCHED
    (VERDICT r11 #4, :func:`_split_centroids_one_swap`): one combined
    rewrite job over every hot partition against the pre-split
    centroid list, then ONE sidecar swap — result-identical to the
    sequential :func:`ivf_split_centroid` loop (same id allocation
    order, same per-partition reassignment) with half the
    driver-synchronous fixed overhead at small stores, and the same
    crash windows (a crash between the rewrites and the final swap
    leaves only UNLISTED directories, healed exactly as before).
    A live server keeps serving throughout and picks the new layout up
    at its next ``refresh()``."""
    if max_splits < 1:
        raise ValueError(f"max_splits must be >= 1 (got {max_splits})")
    from ..serving import _fs_and_path

    # heal BEFORE detecting: a split that crashed around its sidecar
    # swap leaves the sidecar aside and/or duplicated unlisted
    # partition dirs, and detection over the double-counted rows would
    # rank phantom ids and spend the split budget on no-op splits
    filesystem, root = _fs_and_path(store_path)
    # compact residue first (ADVICE r10): a compact crash between the
    # aside renames leaves a LISTED partition with no live dir — its
    # rows are invisible to detection (and to every probe) until the
    # aside is restored, and before this heal ran here, maintain would
    # detect and split over the incomplete store while the partition
    # stayed lost until the next ivf_compact call.
    _heal_compact_aside(filesystem, root)
    _heal_centroids_aside(filesystem, root)
    _heal_unlisted_partitions(filesystem, root)
    # ONE partition-discovery pass for the whole cycle: listing a wide
    # store's partition tree is itself a Spark job past the parallel-
    # discovery threshold, and detection + split read the same
    # pre-split layout (the read happens AFTER the heals so the file
    # index never sees crash residue; the split's tmp/unlisted writes
    # land after this index is resolved and are invisible to it).
    store_df = spark.read.parquet(store_path)
    hot = ivf_hot_centroids(spark, store_path, ratio=ratio,
                            store_df=store_df)[: int(max_splits)]
    return _split_centroids_one_swap(spark, store_path, hot,
                                     n_splits=n_splits, store_df=store_df)


# --------------------------------------------------------------------- #
# Product quantization (PQ): the memory-compression ANN tier
# --------------------------------------------------------------------- #
# IVF prunes WHICH vectors a query scans; PQ compresses HOW MUCH is read
# per vector: each embedding becomes m one-byte codes (here m subspace
# codebooks of k centroids each), and query scoring reads only the code
# table plus a per-query m x k distance table — at 100 TB this is the
# difference between scanning float arrays and scanning bytes. All three
# steps are pure Catalyst plans; the subspace index j is an ordinary key
# column, so ONE plan trains/encodes all m codebooks at once (no
# per-subspace driver loop in the hot path).
#
# Determinism contract (same recipe as kmeans_centroids, L2 instead of
# cosine): init = the k lowest-id vectors' subvectors, assignment by
# squared L2 with code-id tie-break, centroids rounded to
# `round_decimals` every round — so a SQL oracle can unroll the exact
# same rounds without float drift compounding.


def _l2sq(a, b):
    """Squared L2 distance between two double arrays — sequential fold,
    matching the oracle's index-ordered list_sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(vectors, m: int, dim: int, id_col: str, vector_col: str):
    """``(id, j, subv)``: the m per-subspace slices as double arrays."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    slices = F.array(
        *[
            F.transform(
                F.slice(F.col(vector_col), j * dsub + 1, dsub),
                lambda x: x.cast("double"),
            )
            for j in range(m)
        ]
    )
    return vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(slices).alias("j", "subv"),
    )


def _pq_assign(pts, cents):
    """Nearest code per (vector, subspace) by squared L2, ties to the
    smallest code id; ``cents`` is broadcast (m x k rows)."""
    w = Window.partitionBy("id", "j").orderBy(F.asc("_d"), F.asc("code"))
    return (
        pts.join(F.broadcast(cents), "j")
        .withColumn("_d", _l2sq(F.col("subv"), F.col("cvec")))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    iterations: int = 1,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_decimals: int = 5,
) -> DataFrame:
    """Train the m per-subspace codebooks: ``(j, code, cvec)`` with
    ``j`` the subspace, ``code`` in [0, k) the centroid id. One
    DataFrame program trains all subspaces together (j is a key
    column); per round: one broadcast join + one explode/avg shuffle."""
    sub = _pq_subvectors(vectors, m, dim, id_col, vector_col)
    quant = F.transform(F.col("subv"), lambda x: F.round(x, round_decimals))
    init_ids = (
        vectors.select(F.col(id_col).cast("long").alias("id"))
        .orderBy("id")
        .limit(k)
        .withColumn("code", F.row_number().over(Window.orderBy("id")) - 1)
    )
    cents = (
        sub.join(F.broadcast(init_ids), "id")
        .select("j", F.col("code").cast("long").alias("code"), quant.alias("cvec"))
    )
    for _ in range(iterations):
        assign = _pq_assign(sub, cents).select("j", "code", "subv")
        means = (
            assign.select(
                "j", "code", F.posexplode(F.col("subv")).alias("pos", "val")
            )
            .groupBy("j", "code", "pos")
            .agg(F.round(F.avg("val"), round_decimals).alias("v"))
        )
        cents = means.groupBy("j", "code").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("cvec")
        )
    return cents


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """``(id, j, code)``: each vector compressed to m codebook codes —
    the narrow table a 100 TB deployment stores instead of the float
    embeddings (plus the tiny codebooks)."""
    sub = _pq_subvectors(vectors, m, dim, id_col, vector_col)
    return _pq_assign(sub, codebooks).select("id", "j", "code")


def pq_adc_topk(
    query_vec,
    codebooks: DataFrame,
    codes: DataFrame,
    k: int,
    m: int = 4,
    dim: int = 64,
    *,
    round_decimals: int = 5,
) -> DataFrame:
    """Asymmetric distance computation: ``(id, dist2, rank)`` top-k by
    approximate squared L2. The query builds an m x k distance table
    against the codebooks (broadcast both ways — it never grows with
    the corpus), joins it onto the code table and sums per vector; the
    corpus-side scan touches only ``(id, j, code)``. Scores are rounded
    before ranking (id tie-break) so the selected SET is reproducible
    cross-engine."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    qsub = [
        F.array(*[F.lit(round(float(x), 7)) for x in query_vec[j * dsub : (j + 1) * dsub]])
        for j in range(m)
    ]
    spark = codebooks.sparkSession
    qrows = spark.range(m).select(
        F.col("id").cast("int").alias("j"),
        F.element_at(F.array(*qsub), F.col("id").cast("int") + 1).alias("qv"),
    )
    dtab = (
        codebooks.join(F.broadcast(qrows), "j")
        .select("j", "code", _l2sq(F.col("qv"), F.col("cvec")).alias("_d"))
    )
    scored = (
        codes.join(F.broadcast(dtab), ["j", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("_d"), round_decimals).alias("dist2"))
    )
    # TakeOrderedAndProject gets the k rows (no corpus-wide window);
    # the rank window then runs over k rows only
    topk = scored.orderBy(F.asc("dist2"), F.asc("id")).limit(k)
    w = Window.orderBy(F.asc("dist2"), F.asc("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "id", "dist2", F.col("rank").cast("long").alias("rank")
    )


def pq_write_store(
    vectors: DataFrame,
    codebooks: DataFrame,
    path: str,
    m: int = 4,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    mode: str = "overwrite",
    extra_cols: Sequence[str] = (),
    store_sidecars: bool = True,
) -> None:
    """Materialize the PQ layout: the code table ``(id, codes)`` with
    ``codes[j]`` the subspace-j codebook code, written id-sorted so
    row-group stats prune id lookups; the (tiny) codebooks go to
    ``{path}/_codebooks`` (invisible to dataset discovery, same
    convention as the IVF ``_centroids`` sidecar). At 100 TB this table
    is m bytes per document — the scan a
    :class:`~lshrs_spark.serving.PQServer` or Spark ADC query reads
    instead of the float embeddings."""
    enc = pq_encode(vectors, codebooks, m, dim, id_col=id_col,
                    vector_col=vector_col)
    wide = _pq_codes_wide(enc)
    if extra_cols:
        wide = wide.join(
            vectors.select(
                F.col(id_col).cast("long").alias("id"),
                *[F.col(c) for c in extra_cols],
            ),
            "id",
        )
    n = int(vectors.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        wide.repartitionByRange(n, "id")
        .sortWithinPartitions("id")
        .write.mode(mode)
        .parquet(path)
    )
    if not store_sidecars:
        return
    (
        codebooks.select(
            F.col("j").cast("long"),
            F.col("code").cast("long"),
            F.col("cvec").cast("array<double>"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_codebooks")
    )


def pq_append(
    vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    extra_cols: Sequence[str] = (),
) -> None:
    """Incrementally append a batch to a stored flat-PQ layout
    (:func:`pq_write_store`): codes from the STORED ``_codebooks``
    (``m``/``dim`` inferred from the sidecar), appended as an
    additional id-sorted segment — appended rows are identical to a
    from-scratch rebuild at the same codebooks, so a live
    :class:`~lshrs_spark.serving.PQServer` serves the union bit-equal
    after ``refresh()``. Same contracts as :func:`ivfpq_append`
    (single-writer, no id dedup, codebook staleness is a model
    problem); same caveats about the flat tier: the serve-time scan is
    the WHOLE m-bytes/doc table, so at real scale prefer the IVFADC
    layout, whose append twin this mirrors."""
    spark = vectors.sparkSession
    cbs = spark.read.parquet(f"{path}/_codebooks")
    row = cbs.agg(
        F.count_distinct("j").alias("m"),
        F.max(F.size("cvec")).alias("sub"),
    ).collect()[0]
    m, dim = int(row["m"]), int(row["m"]) * int(row["sub"])
    existing = set(spark.read.parquet(path).columns)
    incoming = {"id", "codes"} | set(extra_cols)
    if incoming != existing:
        raise ValueError(
            "pq_append: extra_cols mismatch with the stored layout — "
            f"store holds {sorted(existing)}, append would write "
            f"{sorted(incoming)}; pass the same extra_cols the store "
            "was built with"
        )
    pq_write_store(
        vectors, cbs, path, m, dim, id_col=id_col,
        vector_col=vector_col, mode="append", extra_cols=extra_cols,
        store_sidecars=False,
    )


def _pq_codes_wide(enc: DataFrame) -> DataFrame:
    """``(id, j, code)`` rows -> ``(id, codes)`` with codes[j] ordered
    by subspace."""
    return enc.groupBy("id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("j", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def ivfpq_write_store(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    m: int = 4,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    mode: str = "overwrite",
    extra_cols: Sequence[str] = (),
    store_sidecars: bool = True,
) -> None:
    """IVFADC layout — the two prunings composed: the code table
    ``(id, codes)`` parquet-partitioned by nearest-centroid assignment.
    A query prunes to ``nprobe/K`` of the PARTITIONS (IVF) and reads m
    bytes per surviving document (PQ) — at 100 TB this is the layout
    where a top-k query touches megabytes. Sidecars: ``_centroids`` +
    ``_codebooks`` (both tiny, both invisible to dataset discovery).
    ``extra_cols`` metadata columns ride along for filtered serving
    (:meth:`~lshrs_spark.serving.IVFPQServer.topk` ``where=``).
    ``store_sidecars=False`` skips the sidecar snapshot writes — the
    :func:`ivfpq_append` path, whose centroid/codebook frames are READ
    FROM the store itself (overwriting a path being read from is both
    illegal in Spark and pointless: append never changes them)."""
    assign = ivf_assign(vectors, centroids, id_col=id_col, vector_col=vector_col)
    enc = pq_encode(vectors, codebooks, m, dim, id_col=id_col,
                    vector_col=vector_col)
    meta = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        *[F.col(c) for c in extra_cols],
    )
    wide = _pq_codes_wide(enc)
    if extra_cols:
        wide = wide.join(meta, "id")
    (
        wide
        .join(assign, "id")
        # co-locate before the partitioned write (same trap
        # ivf_write_store fixed in r8: unco-located partitionBy emits
        # tasks x centroids tiny files); the cap splits hot centroids
        .repartition(F.col("centroid_id"))
        .write.mode(mode)
        .option("maxRecordsPerFile", 1 << 22)
        .partitionBy("centroid_id")
        .parquet(path)
    )
    if not store_sidecars:
        return
    (
        centroids.select(
            F.col("centroid_id").cast("long"),
            F.col("cvec").cast("array<double>"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_centroids")
    )
    (
        codebooks.select(
            F.col("j").cast("long"),
            F.col("code").cast("long"),
            F.col("cvec").cast("array<double>"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_codebooks")
    )


def ivfpq_append(
    vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    extra_cols: Sequence[str] = (),
) -> None:
    """Incrementally append a batch to a stored IVFADC layout
    (:func:`ivfpq_write_store`) WITHOUT retraining — closing the
    tier-maintenance story for the last rebuild-only serving tier
    (every other tier: LSH streaming ingest, BM25 epochs + compact,
    IVF stage + absorb, matryoshka append/absorb/compact): codes come
    from the STORED ``_codebooks`` and assignment from the STORED
    ``_centroids`` (both read back, never retrained; ``m``/``dim`` are
    inferred from the codebook table, so the store is self-describing),
    which makes appended rows byte-identical to what a from-scratch
    rebuild at the same centroid/codebook set would hold. A live
    :class:`~lshrs_spark.serving.IVFPQServer` sees the batch at its
    next ``refresh()``.

    Quantization error of the new batch is whatever the EXISTING
    codebooks give it — codebook staleness under corpus drift is a
    model problem no layout trick fixes; monitor with the
    ``quant_error`` / PQ recall gauges and retrain + rebuild when they
    degrade. Same contracts as :func:`truncated_ivf_append`:
    single-writer, ids are NOT deduplicated against the store (dedupe
    upstream or route through a staging absorb)."""
    spark = vectors.sparkSession
    cents = spark.read.parquet(f"{path}/_centroids")
    cbs = spark.read.parquet(f"{path}/_codebooks")
    row = cbs.agg(
        F.count_distinct("j").alias("m"),
        F.max(F.size("cvec")).alias("sub"),
    ).collect()[0]
    m, dim = int(row["m"]), int(row["m"]) * int(row["sub"])
    existing = set(spark.read.parquet(path).columns)
    incoming = {"id", "codes", "centroid_id"} | set(extra_cols)
    if incoming != existing:
        raise ValueError(
            "ivfpq_append: extra_cols mismatch with the stored layout — "
            f"store holds {sorted(existing)}, append would write "
            f"{sorted(incoming)}; pass the same extra_cols the store "
            "was built with"
        )
    ivfpq_write_store(
        vectors, cents, cbs, path, m, dim, id_col=id_col,
        vector_col=vector_col, mode="append", extra_cols=extra_cols,
        store_sidecars=False,
    )


def ivfpq_topk_stored(
    spark,
    store_path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    query_vec,
    k: int,
    nprobe: int,
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVFADC query against a stored layout: probed centroid ids become
    a partition-pruning filter on the code-table scan, then ADC scores
    the surviving codes — :func:`pq_adc_topk` restricted to the probed
    cells. ``(id, dist2, rank)``."""
    import numpy as np

    from ..functions import batchscore as B

    cgot = B.collect_vectors(centroids.select(
        F.col("centroid_id").cast("long"), F.col("cvec")))
    if cgot is not None and len(cgot[0]):
        # driver-side probe ranking (no Spark job): replicate the old
        # plan's float path exactly — the literal query round-tripped
        # through array<float> before the double-cast normalize
        qv = np.asarray([float(x) for x in query_vec],
                        dtype=np.float32).astype(np.float64)
        Qu, q_nulls = B.seq_unit(qv[None, :])
        rows = _probe_rows_local(
            (np.zeros(1, dtype=np.int64), Qu, q_nulls),
            centroids, nprobe, cgot=cgot)
        probe_cids = sorted(cid for _, cid in rows or [])
    else:
        q = spark.createDataFrame(
            [(0, [float(x) for x in query_vec])], "qid long, qvec array<float>"
        ).select(F.col("qid"), _unit(F.col("qvec")).alias("_q"))
        probe_cids = sorted(
            int(r.centroid_id)
            for r in _nearest_centroids(
                q, centroids, nprobe, "qid", "_q").collect()
        )
    store = spark.read.parquet(store_path).filter(
        F.col("centroid_id").isin(probe_cids)  # -> PartitionFilters
    )
    store = _apply_ivf_tombstones(spark, store, store_path)
    enc = store.select("id", F.posexplode(F.col("codes")).alias("j", "code"))
    return pq_adc_topk(query_vec, codebooks, enc, k, m, dim)


def refine_topk(
    shortlist: DataFrame,
    vectors: DataFrame,
    query_vec,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_decimals: int = 5,
) -> DataFrame:
    """Exact re-rank of an ANN shortlist (the FAISS ``IndexRefine``
    stage): fetch the shortlist ids' full vectors, score exact cosine
    against the query, return ``(id, score, rank)`` top-k.

    The shortlist is bounded by the ANN k' (tens to hundreds of rows),
    so it is explicitly broadcast — the vector fetch is a broadcast
    semi-join against the corpus table (no shuffle of the corpus, and
    with the id as the table's sort/partition key the scan prunes to
    the matching files). Quantization error then only affects WHICH k'
    candidates are seen, not their final ordering."""
    ids = shortlist.select(F.col("id").cast("long").alias("id"))
    q = F.array(*[F.lit(round(float(x), 7)) for x in query_vec])
    fetched = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vector_col).alias("_v"),
    ).join(F.broadcast(ids), "id")
    scored = fetched.select(
        "id",
        F.round(
            cosine_similarity(F.col("_v"), q), round_decimals
        ).alias("score"),
    )
    topk = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "id", "score", F.col("rank").cast("long").alias("rank")
    )


def ivfpq_refined_topk(
    spark,
    store_path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    vectors: DataFrame,
    query_vec,
    k: int,
    *,
    shortlist_size: int = 30,
    nprobe: int = 4,
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVFADC + refine: the stored IVFADC tier produces a
    ``shortlist_size`` candidate list from compressed codes (nprobe/K
    of the partitions read, m bytes per candidate), then
    :func:`refine_topk` re-ranks those candidates with exact cosine
    over their full vectors. The standard accuracy/cost split: the
    code table answers "which few dozen", the vector table answers
    "in what order" — only shortlist_size full vectors are ever
    touched."""
    short = ivfpq_topk_stored(
        spark, store_path, centroids, codebooks, query_vec,
        shortlist_size, nprobe, m=m, dim=dim,
    )
    return refine_topk(short, vectors, query_vec, k)
