"""MMR diversified rerank: greedy semantics, duplicate suppression,
determinism, short groups."""

from __future__ import annotations

import numpy as np

from lshrs_spark.operators.mmr import mmr_rerank


def _shortlist_df(spark, rows):
    """rows: (qid, id, vec, rel)."""
    return spark.createDataFrame(
        [(int(q), int(i), [float(x) for x in v], float(r))
         for q, i, v, r in rows],
        "qid long, id long, vec array<double>, rel double",
    )


def test_mmr_suppresses_near_duplicates(spark):
    # ids 1 and 2 are the same direction (sim 1.0) with top relevance;
    # id 3 is orthogonal with lower relevance. Pure top-2 = {1, 2};
    # MMR at lambda=0.5 must pick the orthogonal 3 second.
    rows = [
        (0, 1, [1.0, 0.0], 0.99),
        (0, 2, [1.0, 0.0], 0.98),
        (0, 3, [0.0, 1.0], 0.50),
    ]
    out = mmr_rerank(_shortlist_df(spark, rows), k=2, lam=0.5)
    got = {r.mmr_rank: r.id for r in out.collect()}
    assert got == {1: 1, 2: 3}
    # duplicate id 2's objective would be 0.5*0.98 - 0.5*1.0 < 0;
    # id 3's is 0.5*0.5 - 0.5*0.0 = 0.25


def test_mmr_pick1_is_pure_relevance_with_id_tiebreak(spark):
    rows = [
        (0, 7, [1.0, 0.0], 0.9),
        (0, 4, [0.0, 1.0], 0.9),  # tie on rel: lower id wins
    ]
    out = mmr_rerank(_shortlist_df(spark, rows), k=1, lam=0.5)
    [r] = out.collect()
    assert (r.id, r.mmr_rank) == (4, 1)
    assert abs(r.mmr_score - 0.45) < 1e-9


def test_mmr_negative_sim_rewards_anti_correlation(spark):
    # id 2 points OPPOSITE the first pick: max-sim is -1, so its
    # objective 0.5*0.4 + 0.5*1.0 beats id 3's 0.5*0.8 - 0.5*0.0 —
    # the true-max semantics (not floored at zero) the oracle replays
    rows = [
        (0, 1, [1.0, 0.0], 0.99),
        (0, 2, [-1.0, 0.0], 0.40),
        (0, 3, [0.0, 1.0], 0.80),
    ]
    out = mmr_rerank(_shortlist_df(spark, rows), k=2, lam=0.5)
    got = {r.mmr_rank: r.id for r in out.collect()}
    assert got[2] == 2


def test_mmr_short_group_and_multi_query(spark):
    rows = [
        (0, 1, [1.0, 0.0], 0.9),  # qid 0 has only 1 candidate
        (1, 1, [1.0, 0.0], 0.9),
        (1, 2, [0.0, 1.0], 0.8),
        (1, 3, [1.0, 1.0], 0.7),
    ]
    out = mmr_rerank(_shortlist_df(spark, rows), k=5, lam=0.5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q[0]) == 1 and by_q[0][0].mmr_rank == 1
    assert sorted(r.mmr_rank for r in by_q[1]) == [1, 2, 3]


def test_mmr_deterministic_across_runs(spark, rng):
    vecs = rng.standard_normal((40, 16))
    rows = [
        (q, i, vecs[(q * 20 + i) % 40], float(0.5 + 0.01 * i))
        for q in range(2)
        for i in range(20)
    ]
    df = _shortlist_df(spark, rows)
    a = sorted(
        (r.qid, r.mmr_rank, r.id, r.mmr_score)
        for r in mmr_rerank(df, k=6, lam=0.5).collect()
    )
    b = sorted(
        (r.qid, r.mmr_rank, r.id, r.mmr_score)
        for r in mmr_rerank(df.repartition(7), k=6, lam=0.5).collect()
    )
    assert a == b
    assert len(a) == 12


def test_mmr_lambda_one_is_pure_relevance(spark):
    rows = [
        (0, 1, [1.0, 0.0], 0.99),
        (0, 2, [1.0, 0.0], 0.98),
        (0, 3, [0.0, 1.0], 0.50),
    ]
    out = mmr_rerank(_shortlist_df(spark, rows), k=3, lam=1.0)
    got = {r.mmr_rank: r.id for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3}
