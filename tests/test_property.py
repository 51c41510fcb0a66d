"""Property-based tests (hypothesis) for the driver-side math: packing
round-trips, planner invariants, S-curve shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lshrs_spark import LSHConfig
from lshrs_spark.hashing import hash_vectors_local, hash_vectors_local_long
from lshrs_spark.planner import (
    compute_collision_probability,
    compute_false_rates,
    compute_lsh_threshold,
    get_optimal_config,
)


@settings(max_examples=25, deadline=None)
@given(
    dim=st.integers(4, 48),
    bands=st.integers(1, 6),
    rows=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_long_and_binary_packing_always_agree(dim, bands, rows, seed, data):
    """little-endian long packing == int.from_bytes(packed bytes) for any
    config and any vector."""
    cfg = LSHConfig(dim=dim, num_perm=bands * rows, num_bands=bands,
                    rows_per_band=rows, seed=seed)
    raw = data.draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=dim, max_size=dim,
        )
    )
    vec = np.array(raw, dtype=np.float32)
    if not np.any(vec):
        vec[0] = 1.0
    longs = hash_vectors_local_long(vec, cfg)[0]
    byts = hash_vectors_local(vec, cfg)[0]
    for b in range(bands):
        assert longs[b] == int.from_bytes(byts[b], "little")
        assert 0 <= longs[b] < (1 << rows)


@settings(max_examples=50, deadline=None)
@given(num_perm=st.integers(1, 2048), t=st.floats(0.05, 0.99))
def test_optimal_config_always_factors_exactly(num_perm, t):
    b, r = get_optimal_config(num_perm, t)
    assert b >= 1 and r >= 1
    assert b * r == num_perm


@settings(max_examples=50, deadline=None)
@given(b=st.integers(1, 512), r=st.integers(1, 128))
def test_threshold_in_unit_interval(b, r):
    t = compute_lsh_threshold(b, r)
    assert 0.0 < t <= 1.0


@settings(max_examples=30, deadline=None)
@given(
    b=st.integers(1, 64),
    r=st.integers(1, 32),
    s1=st.floats(0.0, 1.0),
    s2=st.floats(0.0, 1.0),
)
def test_scurve_monotone_and_bounded(b, r, s1, s2):
    lo, hi = sorted((s1, s2))
    p_lo = compute_collision_probability(lo, b, r)
    p_hi = compute_collision_probability(hi, b, r)
    assert -1e-12 <= p_lo <= 1 + 1e-12
    assert p_hi >= p_lo - 1e-12


@settings(max_examples=20, deadline=None)
@given(b=st.integers(1, 64), r=st.integers(1, 32), t=st.floats(0.05, 0.95))
def test_false_rates_within_interval_mass(b, r, t):
    fp, fn = compute_false_rates(b, r, t)
    assert -1e-9 <= fp <= t + 1e-9
    assert -1e-9 <= fn <= (1 - t) + 1e-9
    assert math.isfinite(fp) and math.isfinite(fn)


# --------------------------------------------------------------------- #
# Round-2 property tests: media codecs and quantization math
# --------------------------------------------------------------------- #

@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_image_codecs_roundtrip_any_shape(w, h, seed):
    from lshrs_spark.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    for enc, dec in ((encode_ppm, decode_ppm), (encode_bmp, decode_bmp)):
        ww, hh, out = dec(enc(px))
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4096),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_codec_roundtrip_any_length(n, rate, seed):
    from lshrs_spark.multimodal import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16
    )
    got_rate, out = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(out.ravel(), s)


@settings(max_examples=50, deadline=None)
@given(
    lo=st.floats(-1e6, 1e6, allow_nan=False),
    span=st.floats(0, 1e6, allow_nan=False),
    x01=st.floats(0, 1, allow_nan=False),
)
def test_quantization_formula_error_bound(lo, span, x01):
    """The affine int8 code always reconstructs within half a step (or
    exactly, for constant dimensions) — the invariant the Spark
    expressions in operators/quant.py encode."""
    hi = lo + span
    x = lo + x01 * span
    if span > 0:
        code = math.floor((x - lo) / span * 255.0 + 0.5)
        recon = lo + code / 255.0 * span
        assert abs(x - recon) <= span / 255.0 / 2.0 + 1e-9 * max(1.0, span)
    else:
        assert lo == hi  # constant dim: code 0 reconstructs lo exactly


@settings(max_examples=25, deadline=None)
@given(
    tokens=st.lists(st.integers(1, 500), min_size=1, max_size=200),
    budget=st.integers(1, 1000),
)
def test_pack_math_covers_every_token_once(tokens, budget):
    """Driver-model of pack_sequences: windows tile the concatenated
    stream exactly — offsets are consistent with cumulative sums."""
    cum = 0
    for n in tokens:
        pack_id, off = cum // budget, cum % budget
        assert 0 <= off < budget
        assert pack_id * budget + off == cum
        cum += n


def test_pii_cols_redacts_and_counts(spark):
    from pyspark.sql import functions as F

    from lshrs_spark.functions.text import pii_cols

    df = spark.createDataFrame(
        [(0, "mail me at a.b-c_d@sub.example.org or x@y.io now"),
         (1, "call 555-123-4567 or 555-000-9999"),
         (2, "no pii here, 12-34 and user@@nope are not matches"),
         (3, "mixed: z@q.co and 111-222-3333")],
        "id long, text string",
    )
    cols = pii_cols(F.col("text"))
    got = {r.id: r for r in df.select(
        "id", cols["n_emails"].alias("e"), cols["n_phones"].alias("p"),
        cols["redacted"].alias("red")).collect()}
    assert (got[0].e, got[0].p) == (2, 0)
    assert got[0].red == "mail me at [EMAIL] or [EMAIL] now"
    assert (got[1].e, got[1].p) == (0, 2)
    assert got[1].red == "call [PHONE] or [PHONE]"
    assert (got[2].e, got[2].p) == (0, 0)
    assert got[2].red == got[2].red  # unchanged text
    assert (got[3].e, got[3].p) == (1, 1)
    assert got[3].red == "mixed: [EMAIL] and [PHONE]"


def test_chunk_documents_boundaries(spark):
    from lshrs_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(112))),   # 2 chunks exactly
         (1, " ".join(f"t{i}" for i in range(65))),    # 2nd chunk = overlap+1
         (2, "a b c"),                                 # shorter than chunk -> 1
         (3, " ".join(f"t{i}" for i in range(64)))],   # exactly one chunk
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    assert [len(v) for _, v in sorted(by_doc.items())] == [2, 2, 1, 1]
    d0 = sorted(by_doc[0], key=lambda r: r.chunk_id)
    assert d0[0].n_chunk_tokens == 64 and d0[1].n_chunk_tokens == 64
    # overlap: chunk 1 starts at token index 48 (0-based)
    assert d0[1].chunk_text.split(" ")[0] == "t48"
    assert d0[0].chunk_text.split(" ")[-1] == "t63"
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert d1[1].n_chunk_tokens == 17                   # tokens 48..64
    assert by_doc[2][0].chunk_text == "a b c"
    # every token of every doc appears in at least one chunk
    for did, chunks in by_doc.items():
        n = {0: 112, 1: 65, 2: 3, 3: 64}[did]
        covered = set()
        for c in chunks:
            covered.update(c.chunk_text.split(" "))
        want = {"a", "b", "c"} if did == 2 else {f"t{i}" for i in range(n)}
        assert covered == want


def test_unigram_logprob_orders_rare_above_common(spark):
    from lshrs_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(0, "the the the the"),            # all common tokens
         (1, "zyx wvu tsr qpo"),            # all singletons
         (2, "the the zyx the")],           # mixed
        "doc_id long, text string",
    )
    got = {r.id: r.avg_neg_logprob for r in unigram_logprob(docs).collect()}
    assert got[0] < got[2] < got[1]         # common < mixed < rare surprise


@settings(max_examples=60, deadline=None)
@given(
    word=st.text(alphabet="abcdef", min_size=0, max_size=12),
    n_merges=st.integers(0, 20),
    seed=st.integers(0, 1000),
)
def test_bpe_apply_invariants(word, n_merges, seed):
    """apply_bpe: concatenation round-trips the word; token count is in
    [1, len(word)] for non-empty words; idempotent re-application."""
    import random

    from lshrs_spark.functions.bpe import apply_bpe

    rng = random.Random(seed)
    alphabet = "abcdef"
    pieces = list(alphabet) + [a + b for a in alphabet for b in alphabet]
    merges = []
    for _ in range(n_merges):
        merges.append((rng.choice(pieces), rng.choice(pieces)))
    ranks = {m: i for i, m in enumerate(merges)}
    toks = apply_bpe(word, ranks)
    assert "".join(toks) == word
    if word:
        assert 1 <= len(toks) <= len(word)
    else:
        assert toks == []
    # re-encoding the produced tokens' concatenation is stable
    assert apply_bpe("".join(toks), ranks) == toks


def test_substring_spans_positionally_verified(spark):
    """Every reported (id_a, id_b, pa, pb) corresponds to IDENTICAL
    actual token spans (no hash-collision false positives on real
    data), and a planted copy is never missed."""
    import numpy as np

    from lshrs_spark.operators.dedup import substring_span_pairs

    rng = np.random.default_rng(97)
    vocab = [f"v{i}" for i in range(50)]
    texts = {}
    for i in range(12):
        texts[i] = [vocab[j] for j in rng.integers(0, 50, 30)]
    planted = [vocab[j] for j in rng.integers(0, 50, 12)]
    texts[3] = texts[3][:5] + planted + texts[3][5:23]
    texts[9] = planted + [vocab[j] for j in rng.integers(0, 50, 18)]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()],
        "doc_id long, text string",
    )
    L = 8
    got = {(r.id_a, r.id_b, r.span_start_a, r.span_start_b)
           for r in substring_span_pairs(df, L).collect()}
    for (a, b, pa, pb) in got:
        assert texts[a][pa - 1 : pa - 1 + L] == texts[b][pb - 1 : pb - 1 + L]
    # exhaustive ground truth: no false negatives either
    want = set()
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            for pa in range(len(texts[a]) - L + 1):
                for pb in range(len(texts[b]) - L + 1):
                    if texts[a][pa : pa + L] == texts[b][pb : pb + L]:
                        want.add((a, b, pa + 1, pb + 1))
    assert got == want
    assert any(t[0] == 3 and t[1] == 9 for t in got)   # planted copy found


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=8))
def test_video_container_roundtrip_any_frames(frames):
    from lshrs_spark.multimodal import decode_video, encode_video

    assert decode_video(encode_video(frames)) == frames


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(7, 24),
    h=st.integers(8, 24),
    shift=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_dhash_invariant_under_brightness_shift(w, h, shift, seed):
    """dHash is a gradient-SIGN fingerprint: adding a constant to every
    pixel (no clipping) preserves every bit — the brightness-shift
    robustness that makes it a perceptual near-dup hash rather than a
    content hash."""
    from lshrs_spark.multimodal import dhash48

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256 - shift, size=(h, w, 3), dtype=np.uint8)
    shifted = (px + shift).astype(np.uint8)   # no wraparound by draw range
    assert dhash48(px) == dhash48(shifted)


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12),
        min_size=1, max_size=8,
    ),
    p1=st.sampled_from("ab"),
    p2=st.sampled_from("ab"),
)
def test_phrase_search_matches_reference_counts(spark, docs, p1, p2):
    """phrase_search == a python sliding-window count over every random
    token document (including overlapping occurrences: 'a a a' contains
    'a a' twice)."""
    from lshrs_spark.functions.text import phrase_search, token_postings

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.id: r.n_matches
        for r in phrase_search(token_postings(df), [p1, p2]).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        n = sum(
            1 for j in range(len(toks) - 1)
            if toks[j] == p1 and toks[j + 1] == p2
        )
        if n:
            want[i] = n
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20)),
        min_size=1, max_size=12,
    ),
    right=st.lists(
        st.tuples(
            st.integers(1, 3), st.integers(0, 20),
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.integers(0, 5)),
        ),
        min_size=0, max_size=12,
    ),
)
def test_asof_backward_matches_reference_with_nulls(spark, left, right):
    """asof_join(backward) == a python reference on random data with
    NULL value cells: the matched right row's values are taken
    VERBATIM (a NULL cell stays NULL — the r4 torn-match fix), match =
    latest right ts <= left ts, ties by greatest (v1, v2, ts) tuple."""
    from lshrs_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(left, "k int, ts int")
    rdf = spark.createDataFrame(right, "k int, ts int, v1 int, v2 int")
    got = sorted(
        (r.k, r.ts, r.v1_right, r.v2_right, r.ts_right)
        for r in asof_join(ldf, rdf, ["k"]).collect()
    )

    def key(row):  # greatest value tuple wins on ts ties (NULLS FIRST asc)
        _, ts, v1, v2 = row
        return (ts, (v1 is not None, v1), (v2 is not None, v2))

    want = []
    for k, lts in left:
        cands = [r for r in right if r[0] == k and r[1] <= lts]
        if cands:
            m = max(cands, key=key)
            want.append((k, lts, m[2], m[3], m[1]))
        else:
            want.append((k, lts, None, None, None))
    assert got == sorted(want)
