"""Text-analysis column expressions for large-scale corpus pipelines.

Beyond-reference surface (SURVEY.md §7.2 M5): tokenization, n-gram
shingling, token counting, quality scoring, language-ID heuristics and
document fingerprinting, all as Catalyst expressions (no Python UDFs) so a
100 TB documents scan stays inside whole-stage codegen.

Every function here is deliberately expressible in ANSI-ish SQL so the
DuckDB oracle can recompute it; the shared 48-bit string hash ``h48``
(first 12 hex chars of md5, parsed as an integer) exists in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "h48",
    "tokens_col",
    "token_count_col",
    "char_ngrams_col",
    "token_shingles_col",
    "quality_score_cols",
    "language_id_col",
    "fingerprint_col",
    "LANG_MARKERS",
    "pii_cols",
    "EMAIL_PATTERN",
    "PHONE_PATTERN",
    "chunk_documents",
    "unigram_logprob",
    "normalize_text_col",
    "clean_text_col",
    "CONTROL_CHAR_PATTERN",
    "nfc_normalize_col",
    "char_entropy_col",
    "ENTROPY_ALPHABET",
    "token_postings",
    "phrase_search",
    "h48_py",
    "bm25_index_write",
    "bm25_postings",
    "bm25_stats_row",
    "bm25_store_report",
]

# the tracked alphabet for char_entropy_col; everything else pools into
# one "other" bucket
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz "

# C0 controls except \t\n, DEL, zero-widths (ZWSP/ZWNJ/ZWJ), BOM: the
# bytes a crawler's HTML-to-text step leaks into web corpora. \x{...}
# syntax parses identically in Java regex and DuckDB's RE2, so one
# pattern string serves both engines.
CONTROL_CHAR_PATTERN = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\x{200B}-\\x{200D}\\x{FEFF}]"
)


def h48(c: Column) -> Column:
    """Portable 48-bit hash: ``int(md5(s)[:12], 16)``. Matches the DuckDB
    expression built by :func:`lshrs_spark.oracle.h48_sql`."""
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def bm25_bucket_col(tok: Column, num_buckets: int) -> Column:
    """THE bucket key of the BM25 postings layout — the single
    definition every writer (:func:`bm25_postings` behind both the
    batch and streaming writers, :func:`bm25_compact`'s re-bucketing)
    must share, and whose python twin is ``h48_py(term) %
    num_buckets`` in :meth:`~lshrs_spark.serving.BM25Server
    ._term_filter`. A writer drifting from this formula would place
    postings in buckets the server never reads — every query term
    silently empty."""
    return F.pmod(h48(tok), F.lit(num_buckets))


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (the corpus is space-separated tokens)."""
    return F.split(text, " ")


def normalize_text_col(text: Column) -> Column:
    """Dedup-key normalization (the CCNet recipe, ASCII subset):
    lowercase, strip everything but ``[a-z0-9 ]``, collapse runs of
    whitespace, trim. Used to hash lines/paragraphs so trivial
    formatting differences don't defeat exact dedup. Pure codegen
    (three regexp passes) — zero exchanges, and both regexes use only
    character classes so Java regex and DuckDB's RE2 agree."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def clean_text_col(text: Column) -> Column:
    """Ingest-time text cleanup (the C4-style pre-filter pass, ASCII-safe
    subset): strip control and zero-width characters
    (:data:`CONTROL_CHAR_PATTERN`), collapse horizontal whitespace runs,
    collapse 3+ blank lines to one blank line, trim. Unlike
    :func:`normalize_text_col` (a DEDUP KEY — lossy by design) this is a
    CONTENT transform: the cleaned text is what ships to training, so it
    preserves case, punctuation, and paragraph structure. Pure codegen —
    three regexp passes, zero exchanges, and every pattern is shared
    verbatim with the DuckDB oracle (RE2/Java-common syntax only)."""
    no_ctl = F.regexp_replace(text, CONTROL_CHAR_PATTERN, "")
    one_space = F.regexp_replace(no_ctl, "[ \\t]+", " ")
    return F.trim(F.regexp_replace(one_space, "\\n{3,}", "\n\n"))


def nfc_normalize_col(text: Column) -> Column:
    """Unicode NFC normalization — composes decomposed sequences
    (``e`` + U+0301 -> ``é``) so visually-identical strings hash and
    dedup identically; a prerequisite for exact dedup on multilingual
    web text, where crawlers emit both forms. This module is otherwise
    pure Catalyst, but Spark has no NFC expression, so this one runs as
    an Arrow-batched pandas UDF over ``unicodedata`` (the Unicode
    reference algorithm — DuckDB's ``nfc_normalize`` computes the
    identical mapping, which is what the oracle checks)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # pragma: no cover - executed on workers
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x)
            if x is not None else None
        )

    return _nfc(text)


def char_entropy_col(text: Column, alphabet: str = ENTROPY_ALPHABET) -> Column:
    """Shannon entropy of the character distribution in bits — the
    classic gibberish/boilerplate detector (natural English sits near
    4.1; base64 blobs higher, repeated padding near 0). The histogram
    uses the length-replace trick — ``count(ch) = len(s) -
    len(replace(s, ch, ''))`` per alphabet character, plus one pooled
    "other" bucket — so the whole computation is codegen expressions in
    a single scan projection: no explode (which would turn a 100 TB
    corpus into a quadrillion-row char table), no shuffle, no Python."""
    n = F.length(text).cast("double")
    counts = [
        (F.length(text) - F.length(F.replace(text, F.lit(ch)))).cast("double")
        for ch in alphabet
    ]
    other = n - sum(counts[1:], counts[0])
    term = lambda c: F.when(  # noqa: E731
        c > 0, -(c / n) * F.log2(c / n)
    ).otherwise(F.lit(0.0))
    h = term(other)
    for c in counts:
        h = h + term(c)
    return F.when(n > 0, h).otherwise(F.lit(0.0))


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# Disjoint character classes so leftmost-first (Java) and RE2 (DuckDB)
# alternation agree match-for-match: letter runs, single digits (BPE
# tokenizers split digit runs), punctuation one at a time; spaces fall
# through. A cheap stand-in for a BPE pre-tokenizer's piece count.
BPE_SPLIT_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count: matches of :data:`BPE_SPLIT_PATTERN`."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN))


def char_ngrams_col(text: Column, n: int = 5) -> Column:
    """All character n-grams of ``text`` (empty array when shorter than n)."""
    count = F.length(text) - F.lit(n - 1)
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), count), lambda i: F.substring(text, i, n))
    )


def token_shingles_col(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles re-joined with single spaces."""
    toks = tokens_col(text)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), count - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# Marker-token lists per language for the heuristic classifier. The corpus
# is synthetic with a shared vocabulary, so these act as a deterministic
# scoring rule (what the oracle replicates), not a trained model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "de"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}


def language_id_col(text: Column) -> Column:
    """Predicted language = argmax over marker-token hit counts, ties broken
    by language code ascending; 'und' when no marker hits at all."""
    toks = tokens_col(text)
    scores = []  # (lang, score Column)
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append((lang, score))
    best_score = F.greatest(*[s for _, s in scores])
    pick = F.lit("und")
    # Iterate in reverse-alphabetical order so the earliest language wins ties.
    for lang, score in reversed(scores):
        pick = F.when(score == best_score, F.lit(lang)).otherwise(pick)
    return F.when(best_score > 0, pick).otherwise(F.lit("und"))


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Heuristic document-quality features + composite score in [0, 1].

    Components (each in [0, 1]):
      * ``len_score``   — min(1, n_tokens / 50)
      * ``stop_ratio``  — fraction of tokens that are English markers
      * ``alpha_ratio`` — fraction of characters in [a-z ]
      * ``tok_len_score`` — 1 - min(1, |avg_token_len - 5| / 5)
    ``quality = round(0.3*len + 0.2*stop + 0.3*alpha + 0.2*tok_len, 5)``
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).cast("double")
    n_alpha = (n_chars - F.length(F.regexp_replace(text, "[a-z ]", ""))).cast("double")
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    len_score = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    stop_ratio = n_stop / n_tokens
    alpha_ratio = n_alpha / n_chars
    tok_len_score = F.lit(1.0) - F.least(
        F.lit(1.0), F.abs(avg_tok_len - F.lit(5.0)) / F.lit(5.0)
    )
    quality = F.round(
        F.lit(0.3) * len_score
        + F.lit(0.2) * stop_ratio
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * tok_len_score,
        5,
    )
    return {
        "n_tokens": F.size(toks).cast("long"),
        "len_score": F.round(len_score, 5),
        "stop_ratio": F.round(stop_ratio, 5),
        "alpha_ratio": F.round(alpha_ratio, 5),
        "tok_len_score": F.round(tok_len_score, 5),
        "quality": quality,
    }


def fingerprint_col(text: Column, n: int = 5) -> Column:
    """Winnowing-style document fingerprint: the minimum ``h48`` over all
    character n-grams — stable under local edits, cheap to compare, and
    recomputable by the SQL oracle. Falls back to ``h48(text)`` for texts
    shorter than ``n``."""
    grams = char_ngrams_col(text, n)
    return F.when(
        F.size(grams) > 0,
        F.array_min(F.transform(grams, h48)),
    ).otherwise(h48(text))


def repetition_cols(df, n: int = 3, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Per-document n-gram repetition profile — the standard LLM-corpus
    repetition filter (a dominant repeated n-gram marks boilerplate /
    degenerate text). Returns ``(id, top_ngram_count, n_ngrams,
    repetition_ratio)``.

    Shape: explode shingles -> two hash aggregations (both with map-side
    partial agg) — never a per-doc quadratic array expression, so the
    profile costs one shuffle at any corpus size. Documents shorter than
    ``n`` tokens count the whole text as one shingle (ratio 1.0), the
    same fallback as MinHash."""
    grams = token_shingles_col(F.col(text_col), n)
    shingles = F.when(F.size(grams) > 0, grams).otherwise(
        F.array(F.col(text_col))
    )
    ex = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(shingles).alias("g"),
    )
    cnt = ex.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("id").agg(
        F.max("c").cast("long").alias("top_ngram_count"),
        F.sum("c").cast("long").alias("n_ngrams"),
        F.round(F.max("c") / F.sum("c"), 5).alias("repetition_ratio"),
    )


def gopher_rule_cols(text: Column) -> dict[str, Column]:
    """Gopher-style document filter rules (Rae et al. 2021, table A1
    subset expressible over this corpus), each a pure Catalyst
    expression:

      * 50 <= word count <= 100000
      * 3 <= mean word length <= 10
      * >= 80% alphabetic-or-space characters
      * contains at least one English stop/marker word

    ``keep`` is the conjunction. Thresholds evaluate on the raw doubles
    (both engines compute identical formulas), rounded copies are
    returned for display."""
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    mean_wl = (n_chars - (n_tokens - 1)) / n_tokens
    n_alpha = (n_chars - F.length(F.regexp_replace(text, "[a-z ]", ""))).cast(
        "double"
    )
    alpha_ratio = n_alpha / n_chars
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    has_stop = F.size(F.filter(toks, lambda t: F.array_contains(markers, t))) > 0
    keep = (
        (n_tokens >= 50) & (n_tokens <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (alpha_ratio >= 0.8)
        & has_stop
    )
    return {
        "n_tokens": F.size(toks).cast("long"),
        "mean_word_len": F.round(mean_wl, 5),
        "alpha_ratio": F.round(alpha_ratio, 5),
        "has_stop": has_stop,
        "keep": keep,
    }


# PII scrubbing: patterns restricted to syntax valid in BOTH Java regex
# (Spark) and RE2 (DuckDB oracle) — no lookarounds, no backrefs.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_cols(text: Column) -> dict[str, Column]:
    """PII detection/redaction columns for corpus scrubbing: match
    counts per category plus the redacted text (emails -> ``[EMAIL]``,
    phones -> ``[PHONE]``). Pure Catalyst regexp expressions — the whole
    scrub runs inside whole-stage codegen, one pass over the corpus,
    no Python in the loop."""
    email = F.lit(EMAIL_PATTERN)
    phone = F.lit(PHONE_PATTERN)
    redacted = F.regexp_replace(
        F.regexp_replace(text, email, F.lit("[EMAIL]")), phone, F.lit("[PHONE]")
    )
    return {
        "n_emails": F.size(F.regexp_extract_all(text, email, F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(text, phone, F.lit(0))),
        "redacted": redacted,
    }


def chunk_documents(
    df,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Token-window chunking with overlap — the pretraining prep step
    that turns long documents into model-sized pieces. Chunk ``i``
    covers tokens ``[1 + i*stride, 1 + i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; every document yields at least
    one chunk, and ``n_chunks = max(1, ceil((n - overlap) / stride))``
    (integer form, engine-portable). Pure Catalyst: one projection +
    posexplode, no shuffle, no Python."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.split(F.col(text_col), " ").alias("_t"),
    ).withColumn("_n", F.size(F.col("_t")))
    nch = F.greatest(
        F.lit(1), F.expr(f"(_n - {overlap} + {stride - 1}) div {stride}")
    )
    chunks = F.expr(
        f"transform(sequence(0, cast(_nch AS int) - 1), "
        f"i -> array_join(slice(_t, 1 + i * {stride}, {chunk_tokens}), ' '))"
    )
    return (
        toks.withColumn("_nch", nch)
        .select("id", F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            "id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias(
                "n_chunk_tokens"
            ),
            "chunk_text",
        )
    )


def unigram_logprob(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
):
    """Perplexity-proxy quality score: per-document mean negative log
    unigram probability under the CORPUS unigram distribution (the
    cheap stand-in for model-based filtering — spam/boilerplate scores
    low surprise, gibberish scores high). Two aggregations: corpus token
    frequencies, then a token->frequency join back and a per-doc mean.

    ``broadcast_vocab`` sizes the frequency-table join: the vocabulary
    GROWS with the corpus (URLs, typos, code identifiers — hundreds of
    millions of distinct whitespace tokens on a web-scale crawl), so a
    mandatory broadcast of it is a driver/executor OOM at 100 TB. True
    (default, right for bounded vocabularies and the oracle path) hints
    the broadcast; False leaves the join strategy to Catalyst/AQE, which
    sort-merges on the Zipf-fine-grained token key. The 1-row ``total``
    is always broadcast — it cannot outgrow anything."""
    tok = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("s"))
    if broadcast_vocab:
        freq = F.broadcast(freq)
    return (
        tok.join(freq, "t")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("s"))), 5).alias(
                "avg_neg_logprob"
            ),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def bigram_logprob(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    broadcast_vocab: bool = True,
):
    """Bigram stupid-backoff quality score — the LM upgrade of
    :func:`unigram_logprob`: per document, the mean of
    ``-log P(w_i | w_{i-1})`` over positions ``i >= 2`` where

    * ``P = count(w_{i-1} w_i) / count(w_{i-1})`` when the corpus has
      seen the bigram, else
    * ``P = alpha * count(w_i) / total_tokens`` (stupid backoff — no
      normalization, the standard web-scale simplification).

    Repetitive/templated text scores low surprise; shuffled-word salad
    scores high — exactly the signal the unigram proxy cannot see.
    Three corpus aggregations (unigrams, bigrams, total) + one join per
    n-gram order back onto the position stream. ``broadcast_vocab`` has
    the :func:`unigram_logprob` contract: the unigram AND bigram tables
    grow with the corpus, so default-True is for bounded vocabularies
    and the oracle path; False lets Catalyst/AQE sort-merge both."""
    tok = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "t"),
    )
    prev = tok.select(
        "id", (F.col("pos") + 1).alias("pos"), F.col("t").alias("t_prev")
    )
    pairs = tok.join(prev, ["id", "pos"])  # positions >= 2 only
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    big = (
        pairs.groupBy("t_prev", "t").agg(F.count(F.lit(1)).alias("cb"))
    )
    total = uni.agg(F.sum("cu").alias("s"))
    prev_uni = uni.select(F.col("t").alias("t_prev"), F.col("cu").alias("cp"))
    if broadcast_vocab:
        uni, big, prev_uni = F.broadcast(uni), F.broadcast(big), F.broadcast(prev_uni)
    p = F.when(
        F.col("cb").isNotNull(), F.col("cb") / F.col("cp")
    ).otherwise(F.lit(float(alpha)) * F.col("cu") / F.col("s"))
    return (
        pairs.join(big, ["t_prev", "t"], "left")
        .join(prev_uni, "t_prev")
        .join(uni, "t")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.round(F.avg(-F.log(p)), 5).alias("avg_neg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def token_postings(
    df: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """``(id, pos, tok)`` — the positional inverted index over
    whitespace tokens. Build ONCE (store partitioned/bucketed by
    ``tok`` at scale) and answer any number of phrase queries against
    it; the posting table is the narrow 3-column shape a 100 TB corpus
    search runs on, never the documents themselves."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )


def _phrase_term_order(
    postings: "DataFrame", phrase: "Sequence[str]"
) -> "list[tuple[int, str]]":
    """``[(original_index, token)]`` in ascending document-frequency
    order — the intersection schedule :func:`phrase_search` runs.
    Position shifts commute (token *i* always shifts by ``-i``
    regardless of processing order), so reordering is free; starting
    from the RAREST token makes every intermediate at most that
    token's posting size. One tiny aggregate over the phrase tokens'
    postings (≤ len(phrase) rows collected) prices the schedule; a
    token absent from the corpus counts 0 and sorts first, so the
    empty result short-circuits the whole chain. Ties break by
    original index (equal-df runs keep phrase order). Document
    frequency, not occurrence count: the intersection joins on
    ``(id, pos)`` but its selectivity is driven by how many DOCUMENTS
    a token reaches (a token repeated 1000x inside one document still
    prunes to one id), and per-doc df is also what the served path's
    ``BM25Server._doc_freq`` ranks by — the two paths schedule
    alike."""
    phrase = list(phrase)
    counts = {
        r["tok"]: r["n"]
        for r in postings.filter(F.col("tok").isin(phrase))
        .groupBy("tok").agg(F.count_distinct("id").alias("n")).collect()
    }
    return sorted(
        enumerate(phrase), key=lambda it: (counts.get(it[1], 0), it[0])
    )


def phrase_search(
    postings: "DataFrame", phrase: "Sequence[str]"
) -> "DataFrame":
    """``(id, n_matches)`` — documents containing the exact consecutive
    token ``phrase``, with occurrence counts, via posting-list
    intersection: token *i*'s postings shift their positions by ``-i``
    and equi-join on ``(id, pos)``, so a match is an all-tokens
    position agreement. Terms intersect RAREST-FIRST
    (:func:`_phrase_term_order`): the first intermediate is the rarest
    token's postings and every later join is bounded by it, so a
    phrase leading with a near-stop word ("the quick brown fox") costs
    the rare token's posting size, never the stop word's — the corpus
    is never rescanned per query."""
    phrase = list(phrase)
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    cur = None
    for i, tok in _phrase_term_order(postings, phrase):
        nxt = postings.filter(F.col("tok") == tok).select(
            "id", (F.col("pos") - i).alias("pos")
        )
        cur = nxt if cur is None else cur.join(nxt, ["id", "pos"])
    return cur.groupBy("id").agg(F.count(F.lit(1)).alias("n_matches"))


def phrase_search_batch(
    postings: "DataFrame", phrases: "Sequence[Sequence[str]]"
) -> "DataFrame":
    """``(phrase_id, id, n_matches)`` — a BATCH of exact consecutive
    phrases answered in ONE Spark plan sharing a single postings scan
    (the DataFrame twin of
    :meth:`~lshrs_spark.serving.BM25Server.phrase_batch`): the phrase
    terms become a tiny broadcast table ``(phrase_id, i, tok)``, the
    postings join it once on ``tok`` (so the corpus-side scan reads
    only tokens some phrase mentions — once, not once per phrase),
    each hit shifts to its base position ``pos - i``, and a document
    position matches phrase ``p`` iff all ``len(p)`` term slots agree
    there. Per-phrase looping would rescan the postings N times; at
    100 TB the scan is the cost, so sharing it IS the batch win.
    Result rows satisfy
    ``phrase_search(postings, phrases[pid])`` row-for-row."""
    phrases = [list(p) for p in phrases]
    if any(not p for p in phrases):
        raise ValueError("phrase must contain at least one token")
    spark = postings.sparkSession
    if not phrases:
        return spark.createDataFrame(
            [], "phrase_id int, id long, n_matches long"
        )
    terms = spark.createDataFrame(
        [(pid, i, tok) for pid, ph in enumerate(phrases)
         for i, tok in enumerate(ph)],
        "phrase_id int, i int, tok string",
    )
    lens = spark.createDataFrame(
        [(pid, len(ph)) for pid, ph in enumerate(phrases)],
        "phrase_id int, plen long",
    )
    hits = postings.join(F.broadcast(terms), "tok").select(
        "phrase_id", "i", "id", (F.col("pos") - F.col("i")).alias("p")
    )
    per_pos = hits.groupBy("phrase_id", "id", "p").agg(
        F.count_distinct("i").alias("k")
    )
    return (
        per_pos.join(F.broadcast(lens), "phrase_id")
        .filter(F.col("k") == F.col("plen"))
        .groupBy("phrase_id", "id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def h48_py(s: str) -> int:
    """Driver-side python twin of :func:`h48` (shared with the Python
    Data Source generator) — lets no-Spark-job consumers (e.g.
    :class:`~lshrs_spark.serving.BM25Server`) recompute the same
    bucket keys the Spark writer used."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def bm25_index_write(
    df: "DataFrame",
    path: str,
    *,
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
    store_positions: bool = False,
) -> None:
    """Materialize a BM25 postings layout for no-Spark-job keyword
    serving (:class:`~lshrs_spark.serving.BM25Server`): rows
    ``(tok, id, tf, dl)`` parquet-partitioned by ``bucket =
    h48(tok) % num_buckets`` and sorted by ``(tok, id)`` within files —
    a query term reads ONE bucket directory (directory pruning) and
    its row groups prune on the sorted ``tok`` min/max stats. Doc
    length rides denormalized on every posting (the standard trick: no
    doc-table lookup at query time). Sidecar ``_stats`` holds the
    corpus constants (n_docs, total_len, num_buckets).
    ``store_positions=True`` additionally stores each posting's sorted
    token positions — the POSITIONAL index that lets
    :meth:`~lshrs_spark.serving.BM25Server.phrase` answer exact phrase
    queries from the same layout (costs one int array per posting).

    Only ``mode='overwrite'`` is supported: an append would have to
    merge the ``_stats`` corpus constants too, and silently
    overwriting them with the last batch's would make every served
    score wrong — incremental maintenance is
    :func:`~lshrs_spark.streaming.ingest.stream_bm25_ingest`'s job
    (epoch-keyed layout, additive stats)."""
    if mode != "overwrite":
        raise ValueError(
            "bm25_index_write supports mode='overwrite' only — use "
            "stream_bm25_ingest for incremental maintenance"
        )
    postings, _dl = bm25_postings(
        df, num_buckets, id_col=id_col, text_col=text_col,
        store_positions=store_positions,
    )
    (
        postings.repartition(F.col("bucket"))
        .sortWithinPartitions("tok", "id")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
    # Corpus constants from a COLUMN-PRUNED read-back of the store just
    # written ((id, dl) only — dl rides denormalized on every posting),
    # so the tokenize pass runs exactly once per build: the previous
    # shape persisted the dl table and paid a second tokenize+aggregate
    # pass to fill it (r14; at 100 TB reading two int columns back is
    # a fraction of one corpus tokenize).
    try:
        dl_back = (
            df.sparkSession.read.parquet(path)
            .groupBy("id").agg(F.min("dl").alias("dl"))
        )
    except Exception:
        # empty corpus: no partition dirs to infer a schema from —
        # fall back to the lazy dl derivation (re-runs the one pass
        # over the empty input; stats row still lands with zeros)
        dl_back = _dl
    bm25_stats_row(dl_back, num_buckets).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/_stats")


def bm25_store_report(spark, path: str, *, ratio: float = 4.0):
    """One-row health card for a BM25 postings layout — the keyword
    store's twin of :func:`~lshrs_spark.operators.knn.
    ivf_balance_report`: ``(n_rows, n_partitions, mean_rows, max_rows,
    max_mean_ratio, gini, n_hot, n_docs, avg_doc_len, num_buckets,
    bucket_count_drift, n_epochs)``. ``num_buckets`` is the MAX across
    epoch ``_stats`` rows (the count :func:`bm25_compact` rebuckets
    to) and ``bucket_count_drift`` is true when epochs disagree — the
    mixed-hash-space layout that splits a term's postings across
    buckets until compaction repairs it. The balance columns come from the shared rank-form
    card (:func:`~lshrs_spark.operators.skew.balance_stats`) over
    per-BUCKET posting counts — a hot bucket is a term-hash collision
    hot spot every query landing there pays for; corpus constants come
    from the ``_stats`` sidecar (summed across stream epochs, the same
    additive read :class:`~lshrs_spark.serving.BM25Server` does); and
    ``n_epochs`` is the streamed-partition count
    (:func:`~lshrs_spark.streaming.ingest.stream_bm25_ingest` adds one
    per micro-batch) — the :func:`bm25_compact` debt signal, 0 for a
    flat batch layout. One grouped count over the bucket column plus a
    P-row aggregation and a driver-side directory listing bounded by
    the epoch count — no postings payloads read."""
    from ..operators.skew import balance_stats
    from ..serving import _fs_and_path

    counts = (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    card = balance_stats(counts, key_col="bucket", ratio=ratio)
    # num_buckets: max over epochs, NOT first() (ADVICE r10) — epochs
    # written with drifted bucket counts (the exact condition
    # bm25_compact documents repairing) would make first() an arbitrary
    # row; max() is the count compaction will rebucket to, and
    # bucket_count_drift flags the mixed layout so a scheduler can
    # alert before queries silently split one term across hash spaces.
    stats = spark.read.parquet(f"{path}/_stats").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.round(F.sum("total_len") / F.sum("n_docs"), 5)
        .alias("avg_doc_len"),
        F.max("num_buckets").cast("long").alias("num_buckets"),
        (F.countDistinct("num_buckets") > F.lit(1))
        .alias("bucket_count_drift"),
    )
    from pyarrow.fs import FileSelector, FileType

    filesystem, root = _fs_and_path(path)
    n_epochs = sum(
        1
        for info in filesystem.get_file_info(
            FileSelector(root, allow_not_found=True)
        )
        if info.type == FileType.Directory
        and info.path.rsplit("/", 1)[-1].startswith("epoch=")
    )
    return card.crossJoin(F.broadcast(stats)).withColumn(
        "n_epochs", F.lit(n_epochs).cast("long")
    )


def bm25_compact(spark, path: str, *, num_buckets: "Optional[int]" = None) -> int:
    """Fold a streamed BM25 epoch layout
    (:func:`~lshrs_spark.streaming.ingest.stream_bm25_ingest`:
    ``{path}/epoch=N/bucket=M/`` + one ``_stats`` row per epoch) back
    into a single ``epoch=-1`` with one sorted file set per bucket and
    ONE collapsed ``_stats`` row — the postings twin of the LSH store's
    ``compact()``. A long-running stream accumulates a partition and a
    stats row per micro-batch; without compaction the layout degrades
    into a small-files problem (every query term pays per-epoch file
    opens). Returns the number of postings rows in the compacted
    layout.

    The compacted epoch id is ``-1`` — a value the stream's
    non-negative epoch ids can NEVER write. That matters for the
    epoch-id-reset case: restarting the stream with a FRESH checkpoint
    restarts epochs at 0, and had compaction folded everything into
    ``epoch=0``, that first micro-batch's ``mode('overwrite')`` write
    would clobber the entire compacted corpus; at ``epoch=-1`` the new
    epochs land alongside it instead. Compact only while the stream is
    STOPPED with its checkpoint fully committed: a crash-replayed
    (uncommitted) epoch would re-write its ``epoch=N`` directory after
    its docs were already folded, double-counting them — the same
    single-writer contract as ``LSHRS.save_to_disk``.

    Bucket keys are RECOMPUTED at the target ``num_buckets`` (default:
    the largest count any ``_stats`` row declares) via the shared
    :func:`bm25_bucket_col` definition, so compaction also repairs a
    layout whose epochs were written with differing bucket counts —
    the mixed layout :class:`~lshrs_spark.serving.BM25Server` refuses
    to open. Postings rows are unioned verbatim (streamed epochs hold
    disjoint doc ids), so a server returns identical rankings before
    and after; positions columns survive, so phrase queries keep
    working. The compacted tree stays an EPOCHS layout: live
    ``BM25Server(..., epochs=True)`` instances pick it up at their
    next ``refresh()``, and the stream may keep appending ``epoch=N``
    on top (reusing this bucket count). The swap is
    write-to-temp-sibling, rename the old tree aside, rename the temp
    into place, THEN delete the old tree — a crash at any point leaves
    a recoverable layout at ``path`` or ``path.old-*`` (ADVICE r6: the
    previous rmtree-then-rename order had a window with NO layout at
    ``path`` and the data stranded under a random temp name).

    The swap runs through the path's OWN Hadoop filesystem — the same
    one Spark reads and writes through — so a scheme-less path on a
    session whose ``fs.defaultFS`` is HDFS compacts correctly instead
    of writing the tmp tree to the cluster and renaming on the local
    disk (ADVICE r7). Object-store schemes (s3/s3a/gs/...) are refused
    up front: their "rename" is a non-atomic copy, which would void
    the crash-safety contract above."""
    import uuid as _uuid

    from ..fswap import resolve_rename_fs, swap_via_rename

    fs, dst = resolve_rename_fs(spark, path, label="bm25_compact")
    jvm = spark._jvm
    stats = spark.read.parquet(f"{path}/_stats")
    posts = spark.read.parquet(path)
    if "epoch" not in posts.columns:
        raise ValueError(
            "bm25_compact expects a streamed epochs layout "
            "(epoch=N/bucket=M) — a batch bm25_index_write layout is "
            "already one sorted epoch"
        )
    srow = stats.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_len").cast("long").alias("total_len"),
        F.max("num_buckets").cast("long").alias("max_nb"),
    ).collect()[0]
    if num_buckets is not None and num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1 (got {num_buckets})")
    if num_buckets is None and srow["max_nb"] is None:
        raise ValueError(
            "bm25_compact: the layout's _stats table is empty and no "
            "num_buckets override was given — cannot infer a bucket count"
        )
    nb = int(num_buckets if num_buckets is not None else srow["max_nb"])
    data_cols = [c for c in posts.columns if c not in ("epoch", "bucket")]
    merged = posts.select(*data_cols).withColumn(
        "bucket", bm25_bucket_col(F.col("tok"), nb)
    )
    tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
    (
        merged.repartition(F.col("bucket"))
        .sortWithinPartitions("tok", "id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/epoch=-1")
    )
    spark.createDataFrame(
        [(int(srow["n_docs"] or 0), int(srow["total_len"] or 0), nb)],
        "n_docs long, total_len long, num_buckets long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/_stats/epoch=-1")
    n = spark.read.parquet(f"{tmp}/epoch=-1").count()
    tmp_p = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(tmp))
    old = fs.makeQualified(
        jvm.org.apache.hadoop.fs.Path(f"{path}.old-{_uuid.uuid4().hex}")
    )
    swap_via_rename(fs, dst, tmp_p, old, label="bm25_compact")
    return n


def bm25_postings(
    df: "DataFrame",
    num_buckets: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    store_positions: bool = False,
):
    """``(postings, dl)`` — the shared postings pipeline behind the
    batch writer (:func:`bm25_index_write`) and the streaming
    maintainer (:func:`~lshrs_spark.streaming.ingest.
    stream_bm25_ingest`): ONE definition of the layout schema and the
    bucket key, so the two writers cannot drift apart.

    r14 (guide §2.3/§4.2): per-document term counting is ROW-LOCAL, so
    the postings table is produced by ONE Arrow pass over ``(id,
    text)`` — tokenize, count, bucket (``h48_py % num_buckets``, the
    same values as :func:`bm25_bucket_col`) inside the kernel — where
    the previous ``posexplode -> groupBy(id, tok) -> join(dl on id)``
    shape tokenized the corpus twice and shuffled every TOKEN
    occurrence through two aggregation exchanges plus an id-keyed join
    of the big side before the write's own bucket shuffle. Values are
    identical (integer tf/dl/positions, same split-on-single-space
    semantics including empty tokens, NULL text emits nothing); the
    one behavioral assumption is the layout writers' existing
    contract that ``id`` is unique (duplicate ids are NOT merged into
    one document — dedupe upstream, as every store writer already
    documents). ``dl`` is derived lazily from the postings (one row
    per doc); consumers that aggregate it to corpus constants pay a
    partial-agg pass, not a second tokenize."""
    nb = int(num_buckets)
    sp = bool(store_positions)

    def emit(it):
        import hashlib

        import pyarrow as pa

        out_schema = pa.schema(
            [pa.field("bucket", pa.int64()), pa.field("tok", pa.string()),
             pa.field("id", pa.int64()), pa.field("tf", pa.int64()),
             pa.field("dl", pa.int64())]
            + ([pa.field("positions", pa.list_(pa.int32()))] if sp else [])
        )
        for batch in it:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            b_, t_, i_, tf_, dl_ = [], [], [], [], []
            pos_ = []
            for did, text in zip(ids, texts):
                if text is None:
                    continue  # split(NULL) -> no exploded rows
                toks = text.split(" ")
                dl = len(toks)
                if sp:
                    counts: dict = {}
                    for p, t in enumerate(toks):
                        counts.setdefault(t, []).append(p)
                    for t, ps in counts.items():
                        h = int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
                        b_.append(h % nb)
                        t_.append(t)
                        i_.append(did)
                        tf_.append(len(ps))
                        dl_.append(dl)
                        pos_.append(ps)
                else:
                    counts = {}
                    for t in toks:
                        counts[t] = counts.get(t, 0) + 1
                    for t, c in counts.items():
                        h = int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
                        b_.append(h % nb)
                        t_.append(t)
                        i_.append(did)
                        tf_.append(c)
                        dl_.append(dl)
            arrays = [pa.array(b_, pa.int64()), pa.array(t_, pa.string()),
                      pa.array(i_, pa.int64()), pa.array(tf_, pa.int64()),
                      pa.array(dl_, pa.int64())]
            if sp:
                arrays.append(pa.array(pos_, pa.list_(pa.int32())))
            yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    schema = "bucket long, tok string, id long, tf long, dl long" + (
        ", positions array<int>" if sp else ""
    )
    postings = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col)
    ).mapInArrow(emit, schema)
    dl = postings.groupBy("id").agg(F.min("dl").alias("dl"))
    return postings, dl


def bm25_stats_row(dl: "DataFrame", num_buckets: int) -> "DataFrame":
    """One-row corpus constants ``(n_docs, total_len, num_buckets)``
    from the per-doc length table."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        F.lit(num_buckets).cast("long").alias("num_buckets"),
    )
