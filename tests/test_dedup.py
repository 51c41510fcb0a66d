"""Dedup operators: exact, n-gram Jaccard, MinHash, SimHash, components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators import dedup as D


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s0"),
        (1, "alpha beta gamma delta epsilon zeta", "s0"),      # exact dup of 0
        (2, "alpha beta gamma delta epsilon eta", "s0"),       # near dup of 0
        (3, "one two three four five six seven", "s1"),
        (4, "totally different words here now ok", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(docs):
    out = {r.id: (r.canonical_id, r.group_size) for r in D.exact_dedup(docs).collect()}
    assert out[0] == (0, 2) and out[1] == (0, 2)
    assert out[2] == (2, 1)


def test_ngram_jaccard_identical_is_one(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, 0.1, n=3).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and 0.1 <= pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs


def test_containment_catches_quote_inclusion(spark):
    # doc 1 is a verbatim quote of doc 0 inside a much longer document:
    # containment(A in B) ~ 1.0 while Jaccard stays below any threshold
    quote = "alpha beta gamma delta epsilon"
    rows = [
        (0, quote),
        (1, quote + " plus lots of extra framing words surrounding the "
            "quoted passage that dilute the union considerably indeed"),
        (2, "totally different words here now ok fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {(r.id_a, r.id_b): (r.c_ab, r.c_ba) for r in
            D.ngram_containment_pairs(docs, 0.9, n=3).collect()}
    assert (0, 1) in cont
    c_ab, c_ba = cont[(0, 1)]
    assert c_ab == pytest.approx(1.0)      # all of A's shingles are in B
    assert c_ba < 0.5                      # B is mostly not A
    jac = {(r.id_a, r.id_b): r.jaccard for r in
           D.ngram_jaccard_pairs(docs, 0.0, n=3).collect()}
    assert jac[(0, 1)] < 0.5               # Jaccard alone would miss it
    assert not any(2 in p for p in cont)


def test_containment_direction_matches_sizes(docs):
    # c_ab = inter/|A|, c_ba = inter/|B|; identical docs -> (1.0, 1.0)
    cont = {(r.id_a, r.id_b): (r.c_ab, r.c_ba) for r in
            D.ngram_containment_pairs(docs, 0.1, n=3).collect()}
    assert cont[(0, 1)] == (pytest.approx(1.0), pytest.approx(1.0))
    # near dup of 0: 4 shingles each, 3 shared -> 0.75 both directions
    assert cont[(0, 2)] == (pytest.approx(0.75), pytest.approx(0.75))
    assert (3, 4) not in cont


def test_minhash_identical_docs_share_all_bands(docs):
    pairs = {(r.id_a, r.id_b) for r in
             D.minhash_band_pairs(docs, num_hashes=8, rows_per_band=2).collect()}
    assert (0, 1) in pairs
    assert (3, 4) not in pairs


def test_minhash_signature_shape(docs):
    sigs = D.minhash_signatures(docs, num_hashes=8).collect()
    assert len(sigs) == 5 * 8
    assert all(0 <= r.minhash < D.MINHASH_P for r in sigs)
    # identical docs -> identical signatures
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r.id, {})[r.i] = r.minhash
    assert by_doc[0] == by_doc[1]


def test_simhash_identical_and_near(docs):
    sims = {r.id: r.simhash for r in D.simhash_table(docs).collect()}
    assert sims[0] == sims[1]
    assert all(0 <= s < 2**48 for s in sims.values())
    # max_hamming=47 -> 48 one-bit blocks: exact for every pair that
    # agrees on at least one bit (i.e. all pairs except exact complements)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             D.simhash_pairs(docs, max_hamming=47).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] < pairs.get((3, 4), 49)


def test_simhash_pairs_banding_matches_bruteforce(docs, spark):
    """Pigeonhole banding must return EXACTLY the brute-force pair set."""
    sims = {r.id: r.simhash for r in D.simhash_table(docs).collect()}
    for mh in (2, 4, 10):
        brute = {
            (a, b, bin(sims[a] ^ sims[b]).count("1"))
            for a in sims for b in sims
            if a < b and bin(sims[a] ^ sims[b]).count("1") <= mh
        }
        banded = {(r.id_a, r.id_b, r.hamming)
                  for r in D.simhash_pairs(docs, max_hamming=mh).collect()}
        assert banded == brute


def test_simhash_pairs_joins_on_band_not_data(docs, spark):
    """The self-join key must be the (blk, val) band, never a data
    column — the scale-safety property (VERDICT r01 #4)."""
    plan = spark._jvm.PythonSQLUtils.explainString(
        D.simhash_pairs(docs, max_hamming=4)._jdf.queryExecution(), "simple"
    )
    import re
    joins = [ln for ln in plan.splitlines() if "Join" in ln and "blk" in ln]
    assert joins, plan  # band columns are the equi-join keys
    assert not re.search(r"Join.*(source|text)#", plan), plan


def test_simhash_blocks_cover_all_bits():
    for mh in (1, 4, 6, 47):
        blocks = D.simhash_blocks(mh)
        assert sum(ln for _, ln in blocks) == D.SIMHASH_BITS
        assert len(blocks) == mh + 1
        starts = [s for s, _ in blocks]
        assert starts == sorted(starts) and starts[0] == 0


def test_connected_components_chain(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    comp = {r.id: r.component for r in D.connected_components(pairs, nodes).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[4] == 4 and comp[7] == 7


def test_connected_components_mixed_and_trivial(spark):
    """r15 single-pass edge build: reversed + duplicate input pairs must
    collapse to the same symmetric edge set the old per-leg union
    produced, and a graph that converges on the confirmation round
    alone (no pairs) still returns every node labeled by itself with
    the internal change flag dropped from the result schema."""
    raw = [(1, 2), (2, 1), (1, 2), (3, 4), (4, 5), (3, 5), (8, 9)]
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "id long")
    out = D.connected_components(pairs, nodes)
    assert out.columns == ["id", "component"]
    comp = {r.id: r.component for r in out.collect()}
    assert comp[1] == comp[2] == 1
    assert comp[3] == comp[4] == comp[5] == 3
    assert comp[8] == comp[9] == 8
    assert comp[6] == 6 and comp[7] == 7 and comp[10] == 10

    empty = spark.createDataFrame([], "id_a long, id_b long")
    out0 = D.connected_components(empty, nodes)
    assert out0.columns == ["id", "component"]
    assert {r.id: r.component for r in out0.collect()} == {
        i: i for i in range(1, 11)
    }


def test_connected_components_deep_path(spark):
    """A path graph with diameter 40 must converge well inside the
    default 20-round budget — pointer jumping makes rounds O(log
    diameter), and each round checkpoints RELIABLY (lineage truncated to
    stable storage, not executor-local blocks)."""
    n = 41
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = D.connected_components(pairs, nodes, max_iterations=10)
    comp = {r.id: r.component for r in out.collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n


def test_minhash_params_deterministic():
    assert D.minhash_params(8, 42) == D.minhash_params(8, 42)
    assert D.minhash_params(8, 42) != D.minhash_params(8, 43)


def test_ngram_jaccard_stop_shingles(spark, docs):
    # a generous cap changes nothing
    exact = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, 0.1, n=3).collect()}
    capped = {(r.id_a, r.id_b): r.jaccard for r in
              D.ngram_jaccard_pairs(docs, 0.1, n=3, max_doc_freq=100).collect()}
    assert capped == exact
    # cap=1 drops every shared shingle -> no intersections survive
    none_left = D.ngram_jaccard_pairs(docs, 0.1, n=3, max_doc_freq=1).collect()
    assert none_left == []


def test_simhash_blocks_rejects_unsound_block_count():
    with pytest.raises(ValueError, match="exactness"):
        D.simhash_blocks(6, num_blocks=3)
    with pytest.raises(ValueError, match="num_blocks"):
        D.simhash_blocks(48)  # needs 49 blocks > 48 bits: no guarantee


def test_minhash_pairs_against_incremental(spark, docs):
    new = docs.filter("doc_id >= 3")
    corpus = docs.filter("doc_id < 3")
    out = {(r.new_id, r.corpus_id) for r in
           D.minhash_pairs_against(new, corpus).collect()}
    # docs 3/4 are unrelated to docs 0-2: no candidates
    assert out == set()
    # an exact dup of corpus doc 0 must be caught
    dup = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta", "s9")],
        "doc_id long, text string, source string",
    )
    out2 = {(r.new_id, r.corpus_id) for r in
            D.minhash_pairs_against(dup, corpus).collect()}
    assert (9, 0) in out2 and (9, 1) in out2


def test_ngram_contamination_flags_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [(0, "a b c d e f g h"),        # shares the 5-gram "c d e f g"
         (1, "x y z w v u t s"),        # clean
         (2, "c d e f g h i j"),        # shares two 5-grams
         (3, "short text")],            # < n tokens -> no grams at all
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q q c d e f g h r r")], "doc_id long, text string"
    )
    from lshrs_spark.operators.dedup import ngram_contamination

    got = {r.id: r.n_hit_grams
           for r in ngram_contamination(corpus, bench, n=5).collect()}
    # docs 0 and 2 each share exactly the grams "c d e f g" and
    # "d e f g h" with the benchmark; docs 1 and 3 emit no hit rows
    assert got == {0: 2, 2: 2}


def test_group_representatives_picks_longest_then_smallest_id(spark):
    comps = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4)], "id long, component long"
    )
    docs = spark.createDataFrame(
        [(0, 10), (1, 25), (2, 25), (3, 7), (4, 9)],
        "doc_id long, n_chars long",
    )
    from lshrs_spark.operators.dedup import group_representatives

    got = {r.component: (r.rep_id, r.group_size)
           for r in group_representatives(comps, docs).collect()}
    # component 0: max n_chars=25 shared by ids 1 and 2 -> smallest id 1
    assert got == {0: (1, 3), 3: (3, 1), 4: (4, 1)}


def test_substring_span_pairs_catches_partial_overlap(spark):
    """A 40-token paragraph copied into two otherwise-different documents
    is found at every aligned 32-token window, with correct 1-based
    start positions in EACH document."""
    from lshrs_spark.operators.dedup import substring_span_pairs

    shared = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),      # shared starts at pos 4
        (2, "b1 " + shared + " b2 b3 b4 b5 b6"),   # shared starts at pos 2
        (3, " ".join(f"z{i}" for i in range(50))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b, r.span_start_a, r.span_start_b)
           for r in substring_span_pairs(df, 32).collect()}
    want = {(1, 2, 4 + k, 2 + k) for k in range(40 - 32 + 1)}
    assert got == want


def test_substring_span_pairs_stop_span_cap(spark):
    """max_doc_freq drops boilerplate spans present in more than that
    many documents (the m^2 pair-explosion guard)."""
    from lshrs_spark.operators.dedup import substring_span_pairs

    boiler = " ".join(f"c{i}" for i in range(8))
    rows = [(i, boiler) for i in range(1, 5)]          # 4 docs, same span
    rows.append((9, " ".join(f"u{i}" for i in range(8))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = substring_span_pairs(df, 8).count()
    assert uncapped == 6                                # C(4,2) pairs
    assert substring_span_pairs(df, 8, max_doc_freq=3).count() == 0


def test_substring_span_pairs_short_docs_no_spans(spark):
    from lshrs_spark.operators.dedup import substring_span_pairs

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "only three tokens")],
        "doc_id long, text string",
    )
    assert substring_span_pairs(df, 32).count() == 0
    assert substring_span_pairs(df, 3).count() == 1


def test_minhash_xxhash_mode(spark):
    """base_hash='xxhash64' (the JVM-native production hash) finds the
    same exact-duplicate pairs as the portable h48 mode and rejects
    unknown hash names."""
    import pytest

    from lshrs_spark.operators.dedup import minhash_band_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # dup of 1
        (3, "one two three four five six seven"),
        (4, "totally different words in this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mode in ("h48", "xxhash64"):
        pairs = {(r.id_a, r.id_b)
                 for r in minhash_band_pairs(df, base_hash=mode).collect()}
        assert (1, 2) in pairs, mode
        assert not any(3 in p or 4 in p for p in pairs), mode
    with pytest.raises(ValueError, match="base_hash"):
        minhash_band_pairs(df, base_hash="sha1").collect()


def test_substring_overlap_stats_longest_run(spark):
    """One 40-token copied region at L=32 -> one alignment diagonal with
    9 spans -> longest_overlap_tokens = 9 + 31 = 40 (exact)."""
    from lshrs_spark.operators.dedup import substring_overlap_stats

    shared = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, "b1 " + shared + " b2 b3 b4 b5 b6"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = substring_overlap_stats(df, 32).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_shared_spans == 9
    assert r.n_alignments == 1
    assert r.longest_overlap_tokens == 40      # the true copied length


def test_substring_span_pairs_xxhash_mode(spark):
    from lshrs_spark.operators.dedup import substring_span_pairs

    shared = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, "a1 a2 a3 " + shared + " a4 a5"),
         (2, "b1 " + shared + " b2 b3 b4 b5 b6")],
        "doc_id long, text string",
    )
    want = {(r.id_a, r.id_b, r.span_start_a, r.span_start_b)
            for r in substring_span_pairs(df, 32).collect()}
    got = {(r.id_a, r.id_b, r.span_start_a, r.span_start_b)
           for r in substring_span_pairs(df, 32, base_hash="xxhash64").collect()}
    assert got == want                       # same matches, either hash
    with pytest.raises(ValueError, match="base_hash"):
        substring_span_pairs(df, 32, base_hash="crc").collect()


# --------------------------------------------------------------------- #
# Line-level dedup
# --------------------------------------------------------------------- #

def test_segment_lines_shapes(spark):
    df = spark.createDataFrame(
        [(7, "a b c d e")], "doc_id long, text string"
    )
    rows = sorted(
        (r.line_no, r.line) for r in D.segment_lines(df, 2).collect()
    )
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]


def test_explode_lines_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "first line\nsecond line\nthird")], "doc_id long, text string"
    )
    rows = sorted((r.line_no, r.line) for r in D.explode_lines(df).collect())
    assert rows == [(0, "first line"), (1, "second line"), (2, "third")]


@pytest.fixture()
def line_docs(spark):
    # doc 0 and doc 1 share the line "dup dup"; doc 2 is all-unique;
    # doc 3 duplicates the shared line AGAIN plus one unique line.
    rows = [
        (0, 0, "dup dup"), (0, 1, "only zero"),
        (1, 0, "dup  DUP!"),               # normalizes to "dup dup"
        (2, 0, "unique here"),
        (3, 0, "dup dup"), (3, 1, "tail three"),
    ]
    return spark.createDataFrame(rows, "id long, line_no int, line string")


def test_line_dedup_keep_first(line_docs):
    out = {r.id: r for r in D.line_dedup(line_docs, keep_first=True).collect()}
    # first occurrence (0,0) survives; (1,0) and (3,0) dropped
    assert out[0].clean_text == "dup dup only zero"
    assert out[0].n_lines == 2 and out[0].n_kept == 2
    assert out[1].clean_text == "" and out[1].n_kept == 0
    assert out[2].clean_text == "unique here"
    assert out[3].clean_text == "tail three" and out[3].n_lines == 2


def test_line_dedup_drop_all(line_docs):
    out = {r.id: r for r in
           D.line_dedup(line_docs, keep_first=False).collect()}
    assert out[0].clean_text == "only zero"
    assert out[3].clean_text == "tail three"


def test_line_dedup_xxhash64_same_decisions(line_docs):
    a = {(r.id, r.clean_text) for r in
         D.line_dedup(line_docs, keep_first=True).collect()}
    b = {(r.id, r.clean_text) for r in
         D.line_dedup(line_docs, keep_first=True,
                      base_hash="xxhash64").collect()}
    assert a == b


def test_soft_dedup_weights(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "id long, component long",
    )
    out = {r.id: (r.group_size, r.weight) for r in
           D.soft_dedup_weights(comp).collect()}
    assert out[1] == (3, pytest.approx(1 / 3, abs=1e-5))
    assert out[2] == out[1] == out[3]
    assert out[4] == (1, 1.0)
    assert out[5] == (2, 0.5) == out[6]
    # total mass = number of clusters
    assert sum(w for _, w in out.values()) == pytest.approx(3.0, abs=1e-3)


def test_semantic_dedup_drops_near_identical(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    near = base + 0.01 * rng.standard_normal(16)     # semantic dup of base
    far = -base
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in near]),
        (2, [float(x) for x in far]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in far])],
        "centroid_id long, cvec array<float>",
    )
    out = {r.id: r for r in D.semantic_dedup(emb, cents, 0.9).collect()}
    assert out[0].keep                       # lowest id in its cluster
    assert not out[1].keep                   # near-dup of 0, same cluster
    assert out[1].max_sim_lower > 0.99
    assert out[2].keep and out[2].max_sim_lower is None   # alone in cluster


def test_containment_jaccard_inequalities_on_corpus(spark):
    """For every pair: J <= min(c_ab, c_ba) and max containment >= J —
    the set-algebra invariants that tie the two operators together,
    checked over the real test corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jac = {(r.id_a, r.id_b): r.jaccard for r in
           D.ngram_jaccard_pairs(docs, 0.0, n=3).collect()}
    cont = {(r.id_a, r.id_b): (r.c_ab, r.c_ba) for r in
            D.ngram_containment_pairs(docs, 0.0, n=3).collect()}
    assert set(jac) == set(cont) and jac, "pair sets must coincide"
    for p, j in jac.items():
        c_ab, c_ba = cont[p]
        assert j <= min(c_ab, c_ba) + 1e-12, (p, j, cont[p])
        assert max(c_ab, c_ba) >= j - 1e-12


def test_chunk_overlap_pairs_and_stop_chunk_cap(spark):
    """Shared 64-token chunks pair docs; max_doc_freq drops boilerplate
    chunks shared by too many docs."""
    from lshrs_spark.operators.dedup import chunk_overlap_pairs

    section = " ".join(f"w{i}" for i in range(64))      # one exact chunk
    boiler = " ".join(f"b{i}" for i in range(64))       # in EVERY doc
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + section + " unique one text here"),
            (2, boiler + " " + section + " entirely different words"),
            (3, boiler + " nothing else shared with the others at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.shared_chunks
        for r in chunk_overlap_pairs(docs, 64, 0, min_shared=1).collect()
    }
    # boiler chunk pairs everyone; section only pairs 1-2
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)] >= 2                    # boiler + section

    capped = {
        (r.id_a, r.id_b): r.shared_chunks
        for r in chunk_overlap_pairs(
            docs, 64, 0, min_shared=1, max_doc_freq=2
        ).collect()
    }
    assert set(capped) == {(1, 2)}             # boiler (3 docs) dropped


def test_hamming_banded_pairs_block_size_cap(spark):
    """max_block_size drops degenerate band buckets (documented recall
    tradeoff): a swarm of identical fingerprints stops producing
    quadratic pairs, while pairs outside the hot bucket survive."""
    from lshrs_spark.operators.dedup import hamming_banded_pairs

    rows = [(i, 0) for i in range(50)]          # 50 identical hashes
    rows += [(100, 7), (101, 7)]                # one small honest pair
    tbl = spark.createDataFrame(rows, "id long, h long")
    exact = hamming_banded_pairs(
        tbl, hash_col="h", bits=48, max_hamming=2,
        slot="dedup.cap_test_a",
    )
    assert exact.count() == (50 * 49) // 2 + 1
    capped = hamming_banded_pairs(
        tbl, hash_col="h", bits=48, max_hamming=2, max_block_size=10,
        slot="dedup.cap_test_b",
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}                  # hot bucket dropped whole


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_editdist_pairs_exact_vs_brute_force(spark):
    """PassJoin-style segment banding must be EXACT: for k=0..2 the
    banded pair set equals the brute-forced Levenshtein pair set over
    random short strings (incl. empty and sub-segment-length ones)."""
    import itertools
    import random

    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 10))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (0, 1, 2):
        got = {(r.id_a, r.id_b, r.dist)
               for r in D.editdist_pairs(df, max_dist=k).collect()}
        want = {
            (min(i, j), max(i, j), _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= k
        }
        assert got == want, k
    with pytest.raises(ValueError):
        D.editdist_pairs(df, max_dist=-1)


def test_editdist_pairs_plan_and_knobs(spark):
    """The candidate join must be an equi-join on segment keys (never a
    cartesian / all-pairs levenshtein); prefix_len bounds the compared
    text; max_bucket_size drops a hot segment bucket (documented recall
    tradeoff)."""
    from lshrs_spark.plans.inspect import physical_plan

    rows = [(1, "prefix-alpha tail one"), (2, "prefix-alphb tail two"),
            (3, "other text")] + [(10 + i, "same boilerplate")
                                  for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.editdist_pairs(df, max_dist=1, prefix_len=12)
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert got[(1, 2)] == 1                   # differs at char 12 only
    assert (1, 3) not in got
    # the six identical boilerplate docs pair exactly
    assert sum(1 for (a, b) in got if a >= 10 and b >= 10) == 15
    # capping the bucket kills the boilerplate cluster, keeps the rest
    capped = {
        (r.id_a, r.id_b)
        for r in D.editdist_pairs(
            df, max_dist=1, prefix_len=12, max_bucket_size=3
        ).collect()
    }
    assert (1, 2) in capped
    assert not any(a >= 10 for a, _ in capped)


def test_sorted_neighborhood_pairs_matches_reference(spark):
    """SNM: the distributed two-stage rank + window-join pipeline must
    equal a driver-side sort + sliding window, both raw and with the
    levenshtein verification; knob validation raises."""
    import random

    rng = random.Random(3)
    rows = [(i, "".join(rng.choice("abcd") for _ in range(6)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    order = sorted(rows, key=lambda r: (r[1][:3], r[0]))
    want = set()
    for i in range(len(order)):
        for d in (1, 2):
            if i + d < len(order):
                a, b = order[i][0], order[i + d][0]
                want.add((min(a, b), max(a, b)))
    got = {(r.id_a, r.id_b)
           for r in D.sorted_neighborhood_pairs(
               df, F.substring("text", 1, 3), window=2).collect()}
    assert got == want

    texts = dict(rows)
    wantv = {(a, b, _lev(texts[a], texts[b])) for a, b in want
             if _lev(texts[a], texts[b]) <= 2}
    gotv = {(r.id_a, r.id_b, r.dist)
            for r in D.sorted_neighborhood_pairs(
                df, F.substring("text", 1, 3), window=2,
                text_col="text", max_dist=2).collect()}
    assert gotv == wantv

    with pytest.raises(ValueError, match="window"):
        D.sorted_neighborhood_pairs(df, "text", window=0)
    with pytest.raises(ValueError, match="together"):
        D.sorted_neighborhood_pairs(df, "text", max_dist=2)
    with pytest.raises(ValueError, match="at least one"):
        D.sorted_neighborhood_pairs(df, [], window=2)


def test_sorted_neighborhood_multipass_recovers_leading_typos(spark):
    """VERDICT r7 #7 (Hernández & Stolfo multi-pass): a typo in the
    blocking key's FIRST character teleports the record across the
    single-key sort order; a second pass keyed past that character
    recovers the pair, and the multi-pass result is exactly the union
    of the per-key passes."""
    base = ["quick brown fox", "lazy dog sleeps", "jumping over it",
            "sphinx of black", "pack my box now", "waltz bad nymph"]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "~" + t[1:]))   # leading-char typo copy
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k1 = F.substring("text", 1, 8)
    k2 = F.expr("substring(text, 2, 8)")
    kw = dict(window=1, text_col="text", max_dist=2)

    planted = {(2 * i, 2 * i + 1) for i in range(len(base))}
    single = {(r.id_a, r.id_b)
              for r in D.sorted_neighborhood_pairs(df, k1, **kw).collect()}
    second = {(r.id_a, r.id_b)
              for r in D.sorted_neighborhood_pairs(df, k2, **kw).collect()}
    multi = {(r.id_a, r.id_b)
             for r in D.sorted_neighborhood_pairs(df, [k1, k2],
                                                  **kw).collect()}
    assert not (single & planted)       # pass 1 misses every typo pair
    assert planted <= second            # the offset key sorts them adjacent
    assert multi == single | second     # union-of-passes semantics
    assert planted <= multi


def test_editdist_join_exact_vs_brute_force(spark):
    """Cross-corpus PassJoin must be exact in BOTH directions (either
    side may hold the shorter string), incl. empty strings; ids may
    collide across the two tables without cross-talk."""
    import random

    rng = random.Random(17)
    L = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 8))))
         for i in range(40)]
    R = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 8))))
         for i in range(30)]                     # same id range as L
    ldf = spark.createDataFrame(L, "doc_id long, text string")
    rdf = spark.createDataFrame(R, "doc_id long, text string")
    for k in (0, 2):
        got = {(r.left_id, r.right_id, r.dist)
               for r in D.editdist_join(ldf, rdf, max_dist=k).collect()}
        want = {(i, j, _lev(a, b)) for (i, a) in L for (j, b) in R
                if _lev(a, b) <= k}
        assert got == want, k
    with pytest.raises(ValueError):
        D.editdist_join(ldf, rdf, max_dist=-1)


def test_ngram_overlap_report_graded_fractions(spark):
    """Graded contamination: overlap = |doc's distinct n-grams found in
    the benchmark| / |doc's distinct n-grams|, every corpus doc present
    (short docs report 0 grams, not-contaminated), decision at the
    threshold, and consistency with the boolean ngram_contamination
    hit counts."""
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e f"),          # grams: abc bcd cde def (n=3)
            (1, "a b c x y z"),          # grams: abc bcx cxy xyz
            (2, "p q"),                  # too short: 0 grams
            (3, "u v w u v w u v w"),    # repeated: distinct uvw vwu wuv
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d q r s")], "doc_id long, text string"
    )
    got = {r.id: r for r in D.ngram_overlap_report(
        corpus, bench, n=3, threshold=0.5).collect()}
    assert set(got) == {0, 1, 2, 3}
    # doc 0: grams {abc,bcd,cde,def}; bench grams {abc,bcd,cdq,dqr,qrs}
    assert (got[0].n_grams, got[0].n_hit_grams) == (4, 2)
    assert got[0].overlap == pytest.approx(0.5)
    assert bool(got[0].contaminated) is True    # 0.5 >= 0.5
    assert (got[1].n_grams, got[1].n_hit_grams) == (4, 1)
    assert bool(got[1].contaminated) is False
    assert (got[2].n_grams, got[2].n_hit_grams, got[2].overlap) == (0, 0, 0.0)
    assert bool(got[2].contaminated) is False
    assert got[3].n_grams == 3 and got[3].n_hit_grams == 0

    # hit counts agree with the boolean operator's for flagged docs
    booly = {r.id: r.n_hit_grams
             for r in D.ngram_contamination(corpus, bench, n=3).collect()}
    for i, r in got.items():
        assert booly.get(i, 0) == r.n_hit_grams

    with pytest.raises(ValueError, match="threshold"):
        D.ngram_overlap_report(corpus, bench, n=3, threshold=0.0)
