"""corpus_diff snapshot classification and clean_text_col cleanup."""

from __future__ import annotations

from pyspark.sql import functions as F

from lshrs_spark.functions.text import clean_text_col
from lshrs_spark.operators.diff import (
    content_hash_col,
    corpus_diff,
    corpus_diff_summary,
)


def test_corpus_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo EDITED"), (4, "delta")], ["doc_id", "text"]
    )
    got = {r.id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {r.status: r.n for r in
               corpus_diff_summary(corpus_diff(old, new)).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_corpus_diff_multi_column_and_null_safety(spark):
    # (text='a', lang=NULL) vs (text='a', lang='') must hash apart, and
    # a text containing the separator must not alias a column boundary
    old = spark.createDataFrame(
        [(1, "a", None), (2, "a\x1f", "x")], ["doc_id", "text", "lang"]
    )
    new = spark.createDataFrame(
        [(1, "a", ""), (2, "a", "\x1fx")], ["doc_id", "text", "lang"]
    )
    got = {r.id: r.status for r in
           corpus_diff(old, new, content_cols=["text", "lang"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_corpus_diff_xxhash64_mode(spark):
    old = spark.createDataFrame([(1, "same"), (2, "old")], ["doc_id", "text"])
    new = spark.createDataFrame([(1, "same"), (2, "new")], ["doc_id", "text"])
    got = {r.id: r.status for r in
           corpus_diff(old, new, base_hash="xxhash64").collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_content_hash_distinguishes_empty_and_null(spark):
    df = spark.createDataFrame([("", ), (None, )], "text string")
    hashes = [r.h for r in
              df.select(content_hash_col(["text"]).alias("h")).collect()]
    assert hashes[0] != hashes[1]


def test_clean_text_col_strips_and_collapses(spark):
    cases = [
        # control chars + DEL removed
        ("a\x00b\x07c\x7fd", "abcd"),
        # zero-widths (ZWSP/ZWJ/BOM) removed
        ("a​b‍c﻿d", "abcd"),
        # horizontal whitespace runs collapse; \t treated as whitespace
        ("a  \t  b", "a b"),
        # 3+ newlines collapse to a paragraph break; 2 stay
        ("a\n\n\n\n\nb", "a\n\nb"),
        ("a\n\nb", "a\n\nb"),
        # trim, but preserve case and punctuation (content transform)
        ("  Hello, World!  ", "Hello, World!"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["text"])
    got = [r.c for r in
           df.select(clean_text_col(F.col("text")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_corpus_diff_empty_sides(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert {r.status for r in corpus_diff(old, empty).collect()} == {"removed"}
    assert {r.status for r in corpus_diff(empty, old).collect()} == {"added"}
    assert corpus_diff(empty, empty).count() == 0


def test_nfc_normalize_composes_and_preserves(spark):
    from lshrs_spark.functions.text import nfc_normalize_col

    cases = [
        ("café", "café"),        # e + combining acute -> é
        ("öl", "öl"),            # o + diaeresis -> ö
        ("é", "é"),               # already composed: identity
        ("plain ascii", "plain ascii"),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "text string")
    got = [r.c for r in
           df.select(nfc_normalize_col(F.col("text")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_char_entropy_known_values(spark):
    import math

    from lshrs_spark.functions.text import char_entropy_col

    cases = [
        ("aaaa", 0.0),                     # one symbol: zero entropy
        ("abab", 1.0),                     # two equiprobable symbols
        ("abcd", 2.0),                     # four equiprobable symbols
        ("", 0.0),                         # empty: defined as 0
        ("!!!!", 0.0),                     # all-"other" pools into one bucket
        ("a!b?", None),                    # a, b, other(x2): 1.5 bits
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["text"])
    got = [r.h for r in
           df.select(char_entropy_col(F.col("text")).alias("h")).collect()]
    for (s, want), h in zip(cases, got):
        if want is None:
            want = -(0.25 * math.log2(0.25) * 2 + 0.5 * math.log2(0.5))
        assert abs(h - want) < 1e-9, (s, h)


def test_scd2_two_generations(spark):
    """Apply two CDC batches: closed rows never change again, a twice-
    updated key carries three versions chaining valid_from/valid_to,
    unchanged batch rows are no-ops, new keys open at their version."""
    from lshrs_spark.operators.diff import scd2_apply

    hist = spark.createDataFrame(
        [(1, 100, 1, -1), (2, 200, 1, -1), (3, 300, 1, -1)],
        "k long, cents long, valid_from long, valid_to long",
    )
    b1 = spark.createDataFrame(
        [(1, 150), (2, 200), (4, 400)], "k long, cents long"
    )  # 1 changes, 2 unchanged, 4 new
    h2 = scd2_apply(hist, b1, ["k"], ["cents"], version=2)
    rows2 = {(r.k, r.valid_from): (r.cents, r.valid_to) for r in h2.collect()}
    assert rows2[(1, 1)] == (100, 2) and rows2[(1, 2)] == (150, -1)
    assert rows2[(2, 1)] == (200, -1)          # unchanged: untouched
    assert rows2[(3, 1)] == (300, -1)          # absent from batch: kept
    assert rows2[(4, 2)] == (400, -1)

    b2 = spark.createDataFrame([(1, 175)], "k long, cents long")
    h3 = scd2_apply(h2, b2, ["k"], ["cents"], version=3)
    rows3 = {(r.k, r.valid_from): (r.cents, r.valid_to) for r in h3.collect()}
    assert rows3[(1, 1)] == (100, 2)           # closed history immutable
    assert rows3[(1, 2)] == (150, 3)           # second change closes v2
    assert rows3[(1, 3)] == (175, -1)
    assert len(rows3) == 6


def test_scd2_randomized_invariants(spark):
    """Randomized multi-batch SCD2 run checked against a driver-side
    reference simulation plus structural invariants: exactly one open
    row per live key, version chains contiguous, closed rows immutable."""
    import numpy as np

    from lshrs_spark.operators.diff import scd2_apply

    rng = np.random.default_rng(2024)
    keys = list(range(50))
    hist = spark.createDataFrame(
        [(k, int(rng.integers(0, 5)), 1, -1) for k in keys],
        "k long, cents long, valid_from long, valid_to long",
    )
    # driver-side reference: key -> list of [cents, from, to]
    ref = {k: [[r.cents, 1, -1]] for k, r in
           zip(keys, hist.orderBy("k").collect())}
    for version in (2, 3, 4, 5):
        batch = [
            (int(k), int(rng.integers(0, 5)))
            for k in rng.choice(60, size=20, replace=False)  # some new keys
        ]
        hist = scd2_apply(
            hist, spark.createDataFrame(batch, "k long, cents long"),
            ["k"], ["cents"], version=version,
        )
        for k, cents in batch:
            if k not in ref:
                ref[k] = [[cents, version, -1]]
            elif ref[k][-1][0] != cents:
                ref[k][-1][2] = version
                ref[k].append([cents, version, -1])
    rows = hist.collect()
    got = {}
    for r in rows:
        got.setdefault(r.k, []).append([r.cents, r.valid_from, r.valid_to])
    for k in got:
        got[k].sort(key=lambda x: x[1])
        # one open row per key, chains contiguous
        opens = [x for x in got[k] if x[2] == -1]
        assert len(opens) == 1, (k, got[k])
        for a, b in zip(got[k], got[k][1:]):
            assert a[2] == b[1], (k, got[k])
    assert got == ref


def test_scd2_null_key_value_is_a_real_key(spark):
    """ADVICE r4: presence is tracked with explicit flags, so a
    legitimately-NULL key value keeps its history row and matches
    null-safely against a NULL-keyed update."""
    from lshrs_spark.operators.diff import scd2_apply

    hist = spark.createDataFrame(
        [(None, 10, 1, -1), ("a", 20, 1, -1)],
        "k string, cents int, valid_from int, valid_to int",
    )
    upd = spark.createDataFrame([(None, 11)], "k string, cents int")
    out = scd2_apply(hist, upd, ["k"], ["cents"], version=2)
    rows = {(r.k, r.cents, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (None, 10, 1, 2),   # NULL-keyed open row closed, not dropped
        (None, 11, 2, -1),  # new open row for the NULL key
        ("a", 20, 1, -1),   # untouched key passes through
    }


def test_scd2_duplicate_batch_keys_collapse_to_one_open_row(spark):
    from lshrs_spark.operators.diff import scd2_apply

    hist = spark.createDataFrame(
        [("a", 1, 1, -1)], "k string, cents int, valid_from int, valid_to int"
    )
    upd = spark.createDataFrame(
        [("a", 5), ("a", 9), ("b", 3), ("b", 3)], "k string, cents int"
    )
    out = scd2_apply(hist, upd, ["k"], ["cents"], version=2)
    rows = {(r.k, r.cents, r.valid_from, r.valid_to) for r in out.collect()}
    # greatest tracked tuple wins deterministically; exactly one open
    # row per key
    assert rows == {
        ("a", 1, 1, 2), ("a", 9, 2, -1), ("b", 3, 2, -1),
    }
    open_rows = [r for r in out.collect() if r.valid_to == -1]
    assert len(open_rows) == 2
