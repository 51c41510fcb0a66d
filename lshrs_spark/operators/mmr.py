"""Maximal-marginal-relevance (MMR) diversified top-k — the standard
redundancy-suppressing rerank (Carbonell & Goldstein, SIGIR 1998) a
retrieval stack runs AFTER the ANN shortlist: from a candidate list
scored by query relevance, greedily pick the item maximizing
``lambda * rel(c) - (1 - lambda) * max_{s in selected} sim(c, s)`` so
near-duplicate hits don't crowd out the result page. Beyond-reference
surface (the reference stops at relevance-ordered top-k/top-p rerank,
``lshrs/utils/similarity.py:93`` + ``lshrs/core/main.py:524-658``);
composes with every shortlist producer in
this repo (brute, LSH, IVF, truncated/matryoshka, MIPS).

Scale shape (100 TB): MMR is inherently sequential in ``k`` but only
ever touches the SHORTLIST, never the corpus — the right distribution
axis is queries, not candidates. ``mmr_rerank`` shuffles once on the
query id and runs one Arrow-batched ``applyInPandas`` group per query
(a few hundred rows x dim floats each, O(k*C) multiply-adds after one
C x C gram matrix), so a million queries fan out embarrassingly while
each greedy loop stays a local numpy job. The corpus-sized work
(scoring the shortlist) already happened in whatever ANN tier produced
the input.

Cross-engine determinism (the oracle replays the greedy loop in SQL):
relevance and pairwise similarities are rounded to ``round_dp``
decimals BEFORE each argmax, the objective re-rounded after the
lambda blend, and ties broken by ascending id — the repo's established
round-before-cut pattern, with half-away-from-zero rounding matching
DuckDB/Spark ``round`` (numpy's default would bank to even).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["mmr_rerank"]


def mmr_rerank(
    shortlist: DataFrame,
    *,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
    rel_col: str = "rel",
    round_dp: int = 5,
) -> DataFrame:
    """Diversified top-``k`` per query from a scored shortlist.

    ``shortlist`` carries one row per (query, candidate):
    ``query_col`` (integral), ``id_col`` (integral), ``vec_col``
    (array<float/double> — the CANDIDATE's embedding, used for the
    candidate-candidate similarity penalty), ``rel_col`` (double —
    query relevance, e.g. cosine from the ANN stage; rounded to
    ``round_dp`` before selection).

    Returns ``(query_col, id_col, mmr_rank, mmr_score)`` with
    ``mmr_rank`` 1..k in greedy pick order and ``mmr_score`` the
    (rounded) objective value at pick time: pick 1 scores
    ``lam * rel`` (empty-set penalty is 0), later picks
    ``lam * rel - (1 - lam) * max sim to the already-picked set``.
    Groups smaller than ``k`` return all their rows.
    """
    k_ = int(k)
    lam_ = float(lam)
    dp = int(round_dp)
    qc, ic, vc, rc = query_col, id_col, vec_col, rel_col

    def _mmr(pdf):
        # self-contained (worker cannot import lshrs_spark): captures
        # only ints/floats/strs
        import numpy as np
        import pandas as pd

        def rnd(x):
            # half away from zero at dp decimals (DuckDB/Spark round;
            # np.round would bank halves to even)
            s = 10.0 ** dp
            return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s

        pdf = pdf.sort_values(ic, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        qid = pdf[qc].iloc[0]
        V = np.stack(pdf[vc].to_numpy()).astype(np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = 1.0  # zero vectors: sim 0 to everything
        S = rnd((V @ V.T) / np.outer(norms, norms))
        np.fill_diagonal(S, 0.0)
        rel = rnd(pdf[rc].to_numpy(dtype=np.float64))
        ids = pdf[ic].to_numpy()

        avail = np.ones(n, dtype=bool)
        # true max over the selected set (negative sims legitimately
        # REWARD anti-correlated picks); only the empty set scores 0,
        # handled by the step-0 branch below
        max_sim = np.full(n, -np.inf, dtype=np.float64)
        picks, scores = [], []
        for step in range(min(k_, n)):
            if step == 0:
                obj = rnd(lam_ * rel)
            else:
                obj = rnd(lam_ * rel - (1.0 - lam_) * max_sim)
            obj_a = np.where(avail, obj, -np.inf)
            best = obj_a.max()
            # lowest id among the argmax set (ids are ascending-sorted)
            j = int(np.flatnonzero(obj_a == best)[0])
            picks.append(j)
            scores.append(obj[j])
            avail[j] = False
            max_sim = np.maximum(max_sim, S[:, j])
        return pd.DataFrame(
            {
                qc: [qid] * len(picks),
                ic: [int(ids[j]) for j in picks],
                "mmr_rank": np.arange(1, len(picks) + 1, dtype=np.int64),
                "mmr_score": np.asarray(scores, dtype=np.float64),
            }
        )

    return shortlist.groupBy(qc).applyInPandas(
        _mmr,
        schema=f"{qc} long, {ic} long, mmr_rank long, mmr_score double",
    )
