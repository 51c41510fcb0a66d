"""Query-side operator semantics: exact cosine values, top-k ordering,
top-p proportional cutoff (reference `tests/test_lshrs.py:115-149` and
`core/main.py:645-658`)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark.functions.vector import cosine_similarity, l2_norm, l2_normalize
from lshrs_spark.operators.probe import top_k, top_p_cutoff


def test_exact_cosine_values(spark):
    """query [1,0,0] vs known candidates -> [1, 0, -1, 0.70710677]."""
    cands = [
        ([1.0, 0.0, 0.0], 1.0),
        ([0.0, 1.0, 0.0], 0.0),
        ([-1.0, 0.0, 0.0], -1.0),
        ([1.0, 1.0, 0.0], 0.70710678),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(cands)], "id long, v array<float>"
    ).withColumn("q", F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)))
    rows = df.select("id", cosine_similarity("v", F.col("q")).alias("s")).collect()
    for row in rows:
        assert row.s == pytest.approx(cands[row.id][1], abs=1e-6)


def test_l2_norm_and_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], "id long, v array<float>")
    row = df.select(
        l2_norm(F.col("v")).alias("n"),
        l2_normalize(F.col("v")).alias("u"),
    ).collect()[0]
    assert row.n == pytest.approx(5.0)
    assert row.u == pytest.approx([0.6, 0.8])


def test_l2_normalize_zero_vector_raises(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "id long, v array<float>")
    with pytest.raises(Exception, match="zero vector"):
        df.select(l2_normalize(F.col("v"))).collect()


def test_top_k_ordering_and_tiebreak(spark):
    cands = spark.createDataFrame(
        [(0, 10, 3), (0, 2, 5), (0, 7, 5), (0, 1, 1)],
        "qid long, id long, collisions long",
    )
    rows = top_k(cands, 3).orderBy("rank").collect()
    assert [r.id for r in rows] == [2, 7, 10]  # desc collisions, asc id tiebreak


def test_top_k_rejects_nonpositive():
    with pytest.raises(ValueError):
        top_k(None, 0)


@pytest.mark.parametrize(
    "n,p,expected",
    [(10, 0.5, 5), (10, 0.05, 1), (3, 0.5, 2), (1, 0.01, 1), (10, 1.0, 10)],
)
def test_top_p_proportional_prefix(spark, n, p, expected):
    """cutoff = max(1, ceil(n_candidates * p)) — a prefix, not a threshold."""
    scored = spark.createDataFrame(
        [(0, i, 1.0 - i * 0.01) for i in range(n)], "qid long, id long, score double"
    )
    assert top_p_cutoff(scored, p).count() == expected


def test_top_p_capped_by_top_k(spark):
    scored = spark.createDataFrame(
        [(0, i, 1.0 - i * 0.01) for i in range(10)], "qid long, id long, score double"
    )
    assert top_p_cutoff(scored, 1.0, top_k=4).count() == 4


def test_top_p_validation(spark):
    scored = spark.createDataFrame([(0, 1, 0.5)], "qid long, id long, score double")
    with pytest.raises(ValueError):
        top_p_cutoff(scored, 0.0)
    with pytest.raises(ValueError):
        top_p_cutoff(scored, 1.01)


def test_candidates_from_path_matches_in_memory(spark, tmp_path, rng):
    """Stored-index pruned probe returns exactly the in-memory probe's
    candidate set."""
    import numpy as np

    from lshrs_spark import LSHConfig
    from lshrs_spark.operators.index import build_index, write_index
    from lshrs_spark.operators.probe import (
        candidates,
        candidates_from_path,
        query_signatures_df,
    )

    cfg = LSHConfig(dim=16, num_perm=16, num_bands=4, rows_per_band=4, seed=42)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    idx = build_index(df, cfg, "vec_id", "embedding")
    path = str(tmp_path / "stored_index")
    write_index(idx, path, bucket_partitions=4)

    q = vecs[5]
    mem = {(r.qid, r.id): r.collisions for r in
           candidates(idx, query_signatures_df(spark, q, cfg, qids=[0])).collect()}
    stored = {(r.qid, r.id): r.collisions for r in
              candidates_from_path(spark, path, q, cfg, qids=[0]).collect()}
    assert stored == mem and stored
    # multiprobe: stored pushed-down path == in-memory path, superset
    mem2 = {(r.qid, r.id): r.collisions for r in
            candidates(idx, query_signatures_df(
                spark, q, cfg, qids=[0], multiprobe=2)).collect()}
    stored2 = {(r.qid, r.id): r.collisions for r in
               candidates_from_path(
                   spark, path, q, cfg, qids=[0], multiprobe=2).collect()}
    assert stored2 == mem2 and set(mem) <= set(mem2)
