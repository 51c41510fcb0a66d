"""Arrow-batched vector-scoring kernels (optimization guide §4.2).

The Catalyst expressions in :mod:`lshrs_spark.functions.vector`
(``zip_with`` + ``aggregate`` folds) are higher-order functions, which
Spark evaluates on the INTERPRETED expression path — per candidate row
they box every array element and allocate intermediate arrays.
Measured on the bench corpus (sf0.1, 2000 vectors x 100 queries): the
brute-force top-k line spends ~2.1 s of its 2.5 s inside the scoring
expressions alone (constant-score control of the same plan: 0.42 s).

These kernels move the same arithmetic into NumPy over whole Arrow
record batches — Spark keeps distribution/shuffles/scan pruning, the
per-batch loop is native (guide §4.2 "do the heavy lifting in native
code"), and per-partition top-k truncation cuts the rows entering the
final per-query shuffle from O(candidates) to O(partitions x queries x
k) (guide §2.3 "aggregate before you shuffle"). The centroid-argmax
kernel additionally removes a whole shuffle: the previous
``_nearest_centroids(n=1)`` assignment cross-joined n x K rows and
ran a ``row_number`` window over them (one full exchange + sort of the
candidate space); per-row argmax over the broadcast-small centroid set
needs no exchange at all (guide §2.4 "remove shuffles outright").

BIT-EXACTNESS CONTRACT (the reason this module looks pedantic): every
declared query is hash-checked against a DuckDB oracle, so scores
produced here must be IEEE-754-identical to the Catalyst folds they
replace. Catalyst evaluates

- ``l2_norm(v)``          as ``sqrt(((0 + x0*x0) + x1*x1) + ...)``,
- ``l2_normalize(v)``     as ``x_i / norm`` per element,
- ``dot_product(a, b)``   as ``((0 + a0*b0) + a1*b1) + ...``,

i.e. strictly LEFT-TO-RIGHT folds in float64. NumPy ``sum``/``@`` use
pairwise summation (different rounding), so the kernels instead run
one vectorized add per dimension — ``acc += X[:, j] * Y[j]`` — the
same scalar operations in the same order for every row at native
speed. Null/NaN/width semantics are replicated too:

- a NULL vector or an exactly-zero norm scores NULL (Spark's
  ``F.when(n > 0, ...)``), never NaN;
- a NaN-bearing vector has a NaN norm, and Spark's ``NaN > 0`` is TRUE
  (NaN orders above every double), so it normalizes to NaNs and its
  scores are NaN — the kernels keep NaN flowing through;
- a row whose width differs from the query width scores NULL
  (``zip_with`` pads the shorter side with nulls, nulling the fold);
- orderings replicate Spark's ``desc(score), asc(id)``: NaN first
  (greatest double), then numbers descending, then NULLs last, ids
  ascending within ties.

Worker-shipping contract (same as ``hashing.py`` / ``mmr.py``): the
returned closures are SELF-CONTAINED — they capture only numpy arrays,
ints, strings and sibling NESTED closures (all shipped by value by
cloudpickle), import numpy/pyarrow locally, and never reference this
package, so executors need no ``lshrs_spark`` on their ``sys.path``.

Scale contract: query batches / centroid sets handled here are
CALLER-BOUNDED (a query batch, a centroid table) — the same quantities
the previous plans broadcast. ``MAX_COLLECT_ROWS`` guards the collect;
above it (or on a mixed-width side the matrix form cannot represent)
callers fall back to the pure-Catalyst plan, so a corpus-sized side
can never be pulled to the driver.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = [
    "collect_vectors",
    "seq_norm2",
    "seq_unit",
    "seq_dots",
    "make_topk_map_fn",
    "make_pair_score_fn",
    "make_rerank_fn",
    "make_nearest_centroid_udf_body",
    "MAX_COLLECT_ROWS",
]

# Above this many rows the driver-side collect of a "small" side is
# refused and callers fall back to the Catalyst plan — the broadcast
# cost class these kernels replace has the same practical bound.
MAX_COLLECT_ROWS = 200_000


# --------------------------------------------------------------------- #
# Driver-side helpers (safe to keep module-level: only the driver
# imports this module)
# --------------------------------------------------------------------- #

def collect_vectors(df, *, max_rows: Optional[int] = None):
    """Collect a CALLER-BOUNDED 2-column ``(id, vector)`` frame to the
    driver as ``(ids int64[n], M float64[n, d], null_mask bool[n])``.
    Returns ``None`` (fall back to the Catalyst plan) when the frame
    exceeds ``max_rows`` (default: the module's ``MAX_COLLECT_ROWS``,
    read at call time so tests can lower it), holds MIXED vector
    widths (no single matrix width reproduces Catalyst's per-row
    zip_with padding — the fallback plan always does), or holds
    DUPLICATE ids (ADVICE r14: the searchsorted kernels bind each
    candidate row to ONE query row, but the inner joins they replace
    emit one scored row per duplicate id — only the fallback plan
    reproduces that). NULL vectors — and vectors carrying an
    element-level NULL, which nulls Catalyst's fold the same way
    (ADVICE r14: ``None`` must become a NULL score, never NaN — NaN
    sorts FIRST under desc where NULL sorts last) — become zero rows
    with the mask set."""
    if max_rows is None:
        max_rows = MAX_COLLECT_ROWS
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        return None
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    if len(np.unique(ids)) != len(ids):
        return None  # duplicate ids: kernels bind one row per id
    dim = 0
    for r in rows:
        if r[1] is not None:
            dim = len(r[1])
            break
    M = np.zeros((len(rows), dim), dtype=np.float64)
    null_mask = np.zeros(len(rows), dtype=bool)
    for i, r in enumerate(rows):
        if r[1] is None:
            null_mask[i] = True
        elif len(r[1]) != dim:
            return None  # mixed widths: Catalyst plan handles per-row
        elif None in r[1]:
            null_mask[i] = True  # element NULL nulls the Catalyst fold
        else:
            M[i, :] = np.asarray(r[1], dtype=np.float64)
    return ids, M, null_mask


def seq_norm2(M: np.ndarray) -> np.ndarray:
    """``((0 + x0*x0) + x1*x1) + ...`` per row — Catalyst's l2_norm
    fold order, vectorized across rows."""
    acc = np.zeros(M.shape[0], dtype=np.float64)
    for j in range(M.shape[1]):
        c = M[:, j]
        acc += c * c
    return acc


def seq_unit(M: np.ndarray, null_mask: Optional[np.ndarray] = None):
    """Unit-normalize rows exactly as ``unit_or_null``: ``x / sqrt(n2)``
    per element; rows with an EXACTLY zero norm (or NULL input) are
    flagged null. NaN norms pass through (Spark's ``NaN > 0`` is true).
    Returns ``(U, null_rows)``."""
    n = np.sqrt(seq_norm2(M))
    null_rows = n == 0.0
    if null_mask is not None:
        null_rows = null_rows | null_mask
    safe = np.where(n == 0.0, 1.0, n)
    U = M / safe[:, None]
    return U, null_rows


def seq_dots(V: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """``score[i, q] = ((0 + V[i,0]*Q[q,0]) + V[i,1]*Q[q,1]) + ...`` —
    Catalyst's dot_product fold order for every (row, query) pair."""
    S = np.zeros((V.shape[0], Q.shape[0]), dtype=np.float64)
    for j in range(V.shape[1]):
        S += V[:, j][:, None] * Q[:, j][None, :]
    return S


# --------------------------------------------------------------------- #
# Worker-side closure factories. Every helper here is a NESTED def so
# cloudpickle ships it by value inside the kernel closures.
# --------------------------------------------------------------------- #

def _make_to_matrix():
    """Factory for the batch-column extractor: Arrow list column ->
    ``(V float64[n, dim], null_mask)`` at the TARGET width ``dim`` —
    rows that are NULL or of any other width are zero-filled and
    flagged null (Catalyst's zip_with pads width mismatches with nulls,
    nulling the whole fold)."""

    def to_matrix(vcol, n, dim):
        import numpy as np
        import pyarrow as pa

        if vcol.null_count == 0:
            try:
                offs = vcol.offsets.to_numpy(zero_copy_only=False)
                lens = np.diff(offs)
                fixed = len(lens) == n and n > 0 and (lens == dim).all()
            except AttributeError:   # FixedSizeList
                fixed = (isinstance(vcol, pa.FixedSizeListArray)
                         and vcol.type.list_size == dim)
            if fixed:
                flat_arr = vcol.flatten()
                # element-level NULLs null Catalyst's fold (ADVICE
                # r14): to_numpy would turn them into NaN — which
                # sorts FIRST under desc where NULL sorts last — so
                # such batches take the row-wise path below
                if flat_arr.null_count == 0:
                    flat = flat_arr.to_numpy(
                        zero_copy_only=False).astype(np.float64, copy=False)
                    if len(flat) == n * dim:
                        return flat.reshape(n, dim), np.zeros(n, dtype=bool)
        vals = vcol.to_pylist()
        null_mask = np.zeros(n, dtype=bool)
        M = np.zeros((n, dim), dtype=np.float64)
        for i, v in enumerate(vals):
            if v is None or len(v) != dim or None in v:
                null_mask[i] = True
            else:
                M[i, :] = np.asarray(v, dtype=np.float64)
        return M, null_mask

    return to_matrix


def _make_seq_unit_rows():
    """Factory for the worker-side unit normalizer (same fold order as
    :func:`seq_unit`)."""

    def unit_rows(V, v_null):
        import numpy as np

        n = V.shape[0]
        acc = np.zeros(n, dtype=np.float64)
        for j in range(V.shape[1]):
            c = V[:, j]
            acc += c * c
        nr = np.sqrt(acc)
        v_null = v_null | (nr == 0.0)
        return V / np.where(nr == 0.0, 1.0, nr)[:, None], v_null

    return unit_rows


def make_topk_map_fn(qids, Q, q_nulls, k: int, *,
                     normalize_vectors: bool = True):
    """``mapInArrow`` function over ``(id, vector)`` batches: score
    every (row, query) pair with the bit-exact sequential dot product
    and emit each query's partition-local top-``k`` rows
    ``(qid, id, score)``. The global per-query window downstream sees
    at most ``partitions x len(qids) x k`` rows.

    ``Q`` must already be in scoring space (unit-normalized for cosine,
    raw for MIPS); ``normalize_vectors`` controls the corpus side.
    ``q_nulls`` marks queries whose vector was NULL/zero-norm: their
    scores are NULL for every row. Returns ``(fn, out_schema_ddl)``."""
    qids = np.asarray(qids, dtype=np.int64)
    Q = np.asarray(Q, dtype=np.float64)
    q_nulls = np.asarray(q_nulls, dtype=bool)
    k = int(k)
    norm_v = bool(normalize_vectors)
    to_matrix = _make_to_matrix()
    unit_rows = _make_seq_unit_rows()

    def fn(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            n = batch.num_rows
            if n == 0 or len(qids) == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            # rows at any width other than the query width score NULL
            # (zip_with pads the mismatch with nulls) — to_matrix flags
            # them; Catalyst would normalize such a row fine, but its
            # dot is NULL either way, and only the score reaches output
            V, v_null = to_matrix(batch.column(1), n, Q.shape[1])
            if norm_v:
                V, v_null = unit_rows(V, v_null)
            S = np.zeros((n, Q.shape[0]), dtype=np.float64)
            for j in range(Q.shape[1]):
                S += V[:, j][:, None] * Q[:, j][None, :]
            kk = min(k, n)
            nq = len(qids)
            out_q = np.empty(nq * kk, dtype=np.int64)
            out_i = np.empty(nq * kk, dtype=np.int64)
            out_s = np.empty(nq * kk, dtype=np.float64)
            out_m = np.empty(nq * kk, dtype=bool)
            for qi in range(nq):
                if q_nulls[qi]:
                    nulls = np.ones(n, dtype=bool)
                    sq = np.zeros(n, dtype=np.float64)
                else:
                    nulls = v_null
                    sq = S[:, qi]
                # Spark order desc(score), asc(id): NaN first, numbers
                # desc, NULLs last, id asc in ties
                key2 = np.where(np.isnan(sq), -np.inf, -sq)
                sel = np.lexsort((ids, key2, nulls.astype(np.int8)))[:kk]
                lo = qi * kk
                out_q[lo:lo + kk] = qids[qi]
                out_i[lo:lo + kk] = ids[sel]
                out_s[lo:lo + kk] = sq[sel]
                out_m[lo:lo + kk] = nulls[sel]
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q), pa.array(out_i),
                 pa.array(out_s, mask=out_m)],
                names=["qid", "id", "score"],
            )

    return fn, "qid long, id long, score double"


def make_pair_score_fn(qids, Q, q_nulls, *,
                       normalize_vectors: bool = True):
    """``mapInArrow`` function over ``(qid, id, vector)`` batches (a
    joined shortlist): emit ``(qid, id, score)`` with ``score`` the
    bit-exact sequential dot of the row vector against ITS query's
    vector — the vectorized replacement for the per-pair Catalyst
    ``dot_product`` in probe/refine stages. Rows whose qid is not in
    ``qids`` are DROPPED (the inner join the Catalyst form ran)."""
    qids = np.asarray(qids, dtype=np.int64)
    Q = np.asarray(Q, dtype=np.float64)
    q_nulls = np.asarray(q_nulls, dtype=bool)
    norm_v = bool(normalize_vectors)
    order = np.argsort(qids, kind="stable")
    qids_sorted = qids[order]
    to_matrix = _make_to_matrix()
    unit_rows = _make_seq_unit_rows()

    def fn(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            n = batch.num_rows
            if n == 0 or len(qids_sorted) == 0:
                continue
            row_q = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            V, v_null = to_matrix(batch.column(2), n, Q.shape[1])
            pos = np.searchsorted(qids_sorted, row_q)
            pos_c = np.clip(pos, 0, len(qids_sorted) - 1)
            known = qids_sorted[pos_c] == row_q
            if not known.all():
                keep = known
                row_q, ids = row_q[keep], ids[keep]
                V, v_null, pos_c = V[keep], v_null[keep], pos_c[keep]
                n = int(keep.sum())
                if n == 0:
                    continue
            if norm_v:
                V, v_null = unit_rows(V, v_null)
            qrow = order[pos_c]
            Qm = Q[qrow]
            s = np.zeros(n, dtype=np.float64)
            for j in range(Q.shape[1]):
                s += V[:, j] * Qm[:, j]
            nulls = v_null | q_nulls[qrow]
            yield pa.RecordBatch.from_arrays(
                [pa.array(row_q), pa.array(ids), pa.array(s, mask=nulls)],
                names=["qid", "id", "score"],
            )

    return fn, "qid long, id long, score double"


def make_rerank_fn(qids, Q, q_nulls):
    """``mapInArrow`` function over ``(qid, id, collisions, vector)``
    batches: emit ``(qid, id, collisions, score)`` with ``score`` the
    rerank semantics of ``operators.probe.rerank`` — the query side is
    unit-normalized UPSTREAM (``Q`` rows already normalized), the
    candidate side stays RAW and the dot is divided by the candidate
    norm afterwards (``when(denom > 0, dot / denom)``): NULL on an
    exactly-zero denom, NaN flowing through (Spark's ``NaN > 0`` is
    true). Rows whose qid is outside the query set are DROPPED (the
    inner join the Catalyst form ran). Bit-exact."""
    qids = np.asarray(qids, dtype=np.int64)
    Q = np.asarray(Q, dtype=np.float64)
    q_nulls = np.asarray(q_nulls, dtype=bool)
    order = np.argsort(qids, kind="stable")
    qids_sorted = qids[order]
    to_matrix = _make_to_matrix()

    def fn(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            n = batch.num_rows
            if n == 0 or len(qids_sorted) == 0:
                continue
            row_q = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            colls = batch.column(2).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            V, v_null = to_matrix(batch.column(3), n, Q.shape[1])
            pos = np.searchsorted(qids_sorted, row_q)
            pos_c = np.clip(pos, 0, len(qids_sorted) - 1)
            known = qids_sorted[pos_c] == row_q
            if not known.all():
                keep = known
                row_q, ids, colls = row_q[keep], ids[keep], colls[keep]
                V, v_null, pos_c = V[keep], v_null[keep], pos_c[keep]
                n = int(keep.sum())
                if n == 0:
                    continue
            acc = np.zeros(n, dtype=np.float64)
            for j in range(V.shape[1]):
                c = V[:, j]
                acc += c * c
            denom = np.sqrt(acc)
            qrow = order[pos_c]
            Qm = Q[qrow]
            s = np.zeros(n, dtype=np.float64)
            for j in range(Q.shape[1]):
                s += V[:, j] * Qm[:, j]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = s / denom
            nulls = v_null | q_nulls[qrow] | (denom == 0.0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(row_q), pa.array(ids), pa.array(colls),
                 pa.array(s, mask=nulls)],
                names=["qid", "id", "collisions", "score"],
            )

    return fn, "qid long, id long, collisions bigint, score double"


def make_dot_pairs_fn():
    """``mapInArrow`` function over ``(id_a, id_b, va, vb)`` batches
    (a pair table with both vectors attached): emit
    ``(id_a, id_b, score)`` with ``score`` the bit-exact sequential
    dot of the two arrays — the vectorized replacement for the
    per-pair Catalyst ``dot_product`` in similarity joins. NULL when
    either side is NULL, the two sides' widths differ, or an element
    is NULL (``zip_with`` padding / element nulls null the fold).
    Rounding/threshold stay in Catalyst downstream — the kernel never
    re-implements ``F.round``. Needs no driver-side matrix, so it has
    no collect bound and no fallback.

    ADVICE r14 (medium): scoring is PER-PAIR-width, never
    per-batch-width — a batch mixing vector widths scores every pair
    whose two sides agree, exactly as the Catalyst ``dot_product`` it
    replaces, instead of nulling pairs that miss a width inferred
    from batch order (which also made results depend on partitioning).
    Uniform batches (the only shape the similarity tiers produce)
    keep the one-pass vectorized path; mixed batches vectorize per
    width group."""
    to_matrix = _make_to_matrix()

    def fn(it):
        import numpy as np
        import pyarrow as pa

        def uniform_width(vcol, n):
            """Common row width when EVERY row is non-null, that width,
            and no element is null — else None."""
            if vcol.null_count != 0:
                return None
            try:
                offs = vcol.offsets.to_numpy(zero_copy_only=False)
                lens = np.diff(offs)
                if not (len(lens) == n and n > 0 and (lens == lens[0]).all()):
                    return None
                w = int(lens[0])
            except AttributeError:
                if not hasattr(vcol.type, "list_size"):
                    return None
                w = int(vcol.type.list_size)
            if vcol.flatten().null_count != 0:
                return None
            return w

        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            ida = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            idb = batch.column(1).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            va_col, vb_col = batch.column(2), batch.column(3)
            wa = uniform_width(va_col, n)
            wb = uniform_width(vb_col, n)
            if wa is not None and wa == wb:
                # uniform batch: one vectorized pass
                A, a_null = to_matrix(va_col, n, wa)
                B_, b_null = to_matrix(vb_col, n, wa)
                s = np.zeros(n, dtype=np.float64)
                for j in range(wa):
                    s += A[:, j] * B_[:, j]
                nulls = a_null | b_null
            else:
                # mixed widths / nulls: group rows by their PAIR width
                va = va_col.to_pylist()
                vb = vb_col.to_pylist()
                s = np.zeros(n, dtype=np.float64)
                nulls = np.zeros(n, dtype=bool)
                groups = {}
                for i in range(n):
                    a, b = va[i], vb[i]
                    if (a is None or b is None or len(a) != len(b)
                            or None in a or None in b):
                        nulls[i] = True
                    else:
                        groups.setdefault(len(a), []).append(i)
                for w, idx in groups.items():
                    ix = np.asarray(idx, dtype=np.int64)
                    A = np.asarray([va[i] for i in idx], dtype=np.float64)
                    B_ = np.asarray([vb[i] for i in idx], dtype=np.float64)
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for j in range(w):
                        acc += A[:, j] * B_[:, j]
                    s[ix] = acc
            yield pa.RecordBatch.from_arrays(
                [pa.array(ida), pa.array(idb), pa.array(s, mask=nulls)],
                names=["id_a", "id_b", "score"],
            )

    return fn, "id_a long, id_b long, score double"


def make_nearest_centroid_udf_body(cids, C_unit, c_nulls):
    """Body for a ``pandas_udf("long")``: per batch of RAW vectors, the
    winning centroid id under the exact ``_nearest_centroids(n=1)``
    window semantics — point side unit-normalized (null on zero norm /
    NULL input / width mismatch), ``(cosine desc, centroid_id asc)``
    with NULLs last, and an all-NULL score row still picks the
    SMALLEST centroid id. ``C_unit`` rows must already be
    unit-normalized (``seq_unit``)."""
    cids = np.asarray(cids, dtype=np.int64)
    C_unit = np.asarray(C_unit, dtype=np.float64)
    c_nulls = np.asarray(c_nulls, dtype=bool)
    order = np.argsort(cids, kind="stable")
    cids_s = cids[order]
    C_s = C_unit[order]
    cn_s = c_nulls[order]

    def body(series):
        import numpy as np
        import pandas as pd

        n = len(series)
        if n == 0:
            return pd.Series([], dtype="int64")
        vals = series.to_numpy()
        dim = C_s.shape[1]
        null_mask = np.zeros(n, dtype=bool)
        M = np.zeros((n, dim), dtype=np.float64)
        for i, v in enumerate(vals):
            if v is None or len(v) != dim:
                # NULL input or zip_with width mismatch -> NULL dot
                # against every centroid -> the all-NULL row picks the
                # smallest cid; flagging the row null yields exactly
                # that outcome
                null_mask[i] = True
            else:
                M[i, :] = np.asarray(v, dtype=np.float64)
        acc = np.zeros(n, dtype=np.float64)
        for j in range(dim):
            c = M[:, j]
            acc += c * c
        nr = np.sqrt(acc)
        u_null = null_mask | (nr == 0.0)
        U = M / np.where(nr == 0.0, 1.0, nr)[:, None]
        S = np.zeros((n, C_s.shape[0]), dtype=np.float64)
        for j in range(dim):
            S += U[:, j][:, None] * C_s[:, j][None, :]
        # (cosine desc, cid asc), NULLs last; NaN above every double.
        # cids ascending -> argmax's first-tie pick IS the smallest id,
        # and the all-NULL row (every key -inf) picks the smallest id.
        S_key = np.where(np.isnan(S), np.inf, S)
        S_key = np.where(cn_s[None, :], -np.inf, S_key)
        S_key = np.where(u_null[:, None], -np.inf, S_key)
        win = np.argmax(S_key, axis=1)
        return pd.Series(cids_s[win])

    return body
