"""Registry backing ``__spark_entry__.py``: every implemented operator gets
a ``queries()`` entry (Spark DataFrame program) and, when SQL-expressible,
a matching ``oracle_sql()`` DuckDB query over the same parquet tables.

Conventions (driver contract):
* column names identical between Spark result and oracle SQL;
* float columns rounded to 5 decimals on BOTH sides (float32/float64
  drift, FIXTURES.md §6);
* deterministic orderings with id tiebreaks — the driver hash is
  order-insensitive but limits/cutoffs must select identical row SETS;
* integer-typed columns cast to long/BIGINT on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import LSHConfig
from .operators.index import build_index
from .operators.probe import candidates, rerank, top_k, top_p_cutoff
from .operators.simjoin import exact_similarity_join, similarity_join
from .operators import dedup as D
from .functions.vector import cosine_similarity
from .functions import text as X
from .oracle import ORACLE_CFG, cosine_sql, h48_sql, sigs_cte

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _query_sigs(spark: SparkSession, sf_dir: str, qid: int = 0) -> DataFrame:
    """Signatures of the query vector (= embeddings row ``qid``) computed
    through the same DataFrame path as the index."""
    q = _emb(spark, sf_dir).filter(F.col("vec_id") == qid)
    return build_index(q, ORACLE_CFG, "vec_id", "embedding").withColumnRenamed(
        "id", "qid"
    )


_SIGS = sigs_cte(ORACLE_CFG)  # WITH-clause body: (id, band, sig) for embeddings
_CAND = (
    "q AS (SELECT band, sig FROM sigs WHERE id = 0), "
    "cand AS (SELECT s.id AS id, count(*)::BIGINT AS collisions "
    "FROM sigs s JOIN q USING (band, sig) GROUP BY s.id)"
)


# --------------------------------------------------------------------- #
# H1-H4 / S4: signature generation + index build (SURVEY §2.2)
# --------------------------------------------------------------------- #

@register(
    "lsh_signatures",
    f"WITH {_SIGS} SELECT id, band, sig FROM sigs",
)
def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP band signatures for every vector — the exploded bucket index
    (reference H1-H4 + S4)."""
    return build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding").select(
        "id", "band", "sig"
    )


@register(
    "lsh_index_stats",
    f"""WITH {_SIGS},
bucket AS (SELECT band, sig, count(*)::BIGINT AS n FROM sigs GROUP BY band, sig)
SELECT band, count(*)::BIGINT AS buckets, sum(n)::BIGINT AS entries,
       max(n)::BIGINT AS max_bucket
FROM bucket GROUP BY band""",
)
def lsh_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy stats per band (M3 + hot-bucket diagnostics)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    bucket = idx.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n"))
    return bucket.groupBy("band").agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("n").alias("entries"),
        F.max("n").alias("max_bucket"),
    )


# --------------------------------------------------------------------- #
# Q1-Q4: probe -> collision count -> order -> limit (SURVEY §2.3)
# --------------------------------------------------------------------- #

@register(
    "lsh_topk",
    f"""WITH {_SIGS}, {_CAND},
ranked AS (SELECT id, collisions,
                  row_number() OVER (ORDER BY collisions DESC, id ASC) AS rank
           FROM cand)
SELECT id, collisions, rank FROM ranked WHERE rank <= 10""",
)
def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end top-k ANN query for query vector = embeddings row 0
    (reference ``get_top_k``, Q1-Q4)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    cands = candidates(idx, _query_sigs(spark, sf_dir))
    return top_k(cands, 10).select(
        "id", "collisions", F.col("rank").cast("long").alias("rank")
    )


@register(
    "lsh_topp",
    f"""WITH {_SIGS}, {_CAND},
scored AS (SELECT c.id AS id,
                  {cosine_sql("e.embedding", "qe.embedding")} AS score
           FROM cand c
           JOIN embeddings e ON e.vec_id = c.id
           CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) qe),
ranked AS (SELECT id, score,
                  row_number() OVER (ORDER BY score DESC, id ASC) AS rank,
                  count(*) OVER () AS n
           FROM scored)
SELECT id, round(score, 5) AS score, rank
FROM ranked WHERE rank <= greatest(1, ceil(n * 0.5))""",
)
def lsh_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank candidates by exact cosine and keep the proportional prefix
    ``max(1, ceil(n*0.5))`` (reference ``get_above_p``, Q5-Q8)."""
    emb = _emb(spark, sf_dir)
    idx = build_index(emb, ORACLE_CFG, "vec_id", "embedding")
    cands = candidates(idx, _query_sigs(spark, sf_dir))
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = rerank(cands, emb, qdf)
    return top_p_cutoff(scored, 0.5).select(
        "id",
        F.round("score", 5).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


# --------------------------------------------------------------------- #
# Similarity search baseline: brute-force exact cosine top-k (north-star)
# --------------------------------------------------------------------- #

@register(
    "knn_bruteforce",
    f"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (SELECT e.vec_id AS id,
                  {cosine_sql("e.embedding", "q.embedding")} AS score
           FROM embeddings e CROSS JOIN q),
ranked AS (SELECT id, score,
                  row_number() OVER (ORDER BY score DESC, id ASC) AS rank
           FROM scored)
SELECT id, round(score, 5) AS score, rank FROM ranked WHERE rank <= 10""",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vector 0 — the correctness baseline
    every ANN path is measured against."""
    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    )
    scored = emb.crossJoin(q).select(
        F.col("vec_id").alias("id"),
        cosine_similarity(F.col("embedding"), F.col("qvec")).alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("id", F.round("score", 5).alias("score"),
                F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------------- #
# M1: delete = left-anti join rewrite of the index
# --------------------------------------------------------------------- #

@register(
    "lsh_delete",
    f"""WITH {_SIGS}
SELECT id, band, sig FROM sigs WHERE id NOT IN (0,1,2,3,4,5,6,7,8,9)""",
)
def lsh_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index after deleting ids 0-9 — anti-join instead of the reference's
    full Redis keyspace scan (M1)."""
    idx = build_index(_emb(spark, sf_dir), ORACLE_CFG, "vec_id", "embedding")
    deleted = spark.createDataFrame([(i,) for i in range(10)], "id long")
    return idx.join(F.broadcast(deleted), "id", "left_anti").select(
        "id", "band", "sig"
    )


# --------------------------------------------------------------------- #
# Similarity joins (M5): LSH-accelerated + exact baseline
# --------------------------------------------------------------------- #

@register(
    "simjoin_lsh",
    f"""WITH {_SIGS},
pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM sigs a JOIN sigs b
            ON a.band = b.band AND a.sig = b.sig AND a.id < b.id)
SELECT id_a, id_b, round({cosine_sql("ea.embedding", "eb.embedding")}, 5) AS score
FROM pairs
JOIN embeddings ea ON ea.vec_id = id_a
JOIN embeddings eb ON eb.vec_id = id_b
WHERE {cosine_sql("ea.embedding", "eb.embedding")} >= 0.3""",
)
def simjoin_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucket candidate pairs filtered by exact cosine >= 0.3."""
    out = similarity_join(_emb(spark, sf_dir), ORACLE_CFG, 0.3)
    return out.select("id_a", "id_b", F.round("score", 5).alias("score"))


@register(
    "simjoin_exact",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({cosine_sql("a.embedding", "b.embedding")}, 5) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cosine_sql("a.embedding", "b.embedding")} >= 0.4""",
)
def simjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine join at threshold 0.4 (the exactness
    baseline the LSH path is measured against)."""
    out = exact_similarity_join(_emb(spark, sf_dir), 0.4)
    return out.select("id_a", "id_b", F.round("score", 5).alias("score"))


# --------------------------------------------------------------------- #
# Dedup suite (M5)
# --------------------------------------------------------------------- #

@register(
    "dedup_exact",
    """SELECT doc_id AS id,
       min(doc_id) OVER (PARTITION BY text)::BIGINT AS canonical_id,
       count(*) OVER (PARTITION BY text)::BIGINT AS group_size
FROM documents""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup: canonical = min doc_id per identical text."""
    return D.exact_dedup(_docs(spark, sf_dir))


_JACCARD_CTES = """
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
shd AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
    FROM tok)),
sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jpairs AS (SELECT id_a, id_b,
                  c::DOUBLE / (sa.n + sb.n - c) AS jaccard
           FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b)
"""


@register(
    "dedup_ngram_jaccard",
    f"""WITH {_JACCARD_CTES}
SELECT id_a, id_b, round(jaccard, 5) AS jaccard
FROM jpairs WHERE jaccard >= 0.5""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-3-gram Jaccard >= 0.5 (inverted-index
    join, no O(n^2) pair space)."""
    out = D.ngram_jaccard_pairs(_docs(spark, sf_dir), 0.5, n=3)
    return out.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


@register(
    "dedup_groups",
    f"""WITH RECURSIVE {_JACCARD_CTES},
edges AS (SELECT id_a AS src, id_b AS dst FROM jpairs WHERE jaccard >= 0.5
          UNION SELECT id_b, id_a FROM jpairs WHERE jaccard >= 0.5),
reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT src AS id, min(dst)::BIGINT AS component FROM reach GROUP BY src""",
)
def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components (min-label propagation)
    over the Jaccard>=0.5 near-dup graph."""
    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, 0.5, n=3)
    nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
    return D.connected_components(pairs, nodes)


# --------------------------------------------------------------------- #
# MinHash LSH dedup (M5): portable universal-hash scheme shared with SQL
# --------------------------------------------------------------------- #

def _minhash_ctes() -> str:
    p = D.MINHASH_P
    params = D.minhash_params(8, seed=42)
    h = h48_sql("s")
    mins = ", ".join(
        f"list_min(list_transform(hv, h -> ({a}*h + {b}) % {p})) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
shl AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3
                    THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    ELSE [text] END AS sh
        FROM tok),
hs AS (SELECT doc_id, list_transform(sh, s -> ({h}) % {p}) AS hv FROM shl),
msig AS (SELECT doc_id, {mins} FROM hs)
"""


_MSIG_UNPIVOT = " UNION ALL ".join(
    f"SELECT doc_id AS id, {i} AS i, m{i} AS minhash FROM msig" for i in range(8)
)
_MBANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, m{2*b}*2097169 + m{2*b+1} AS bsig FROM msig"
    for b in range(4)
)


@register(
    "dedup_minhash_sigs",
    f"WITH {_minhash_ctes()} SELECT id, i, minhash FROM ({_MSIG_UNPIVOT})",
)
def dedup_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder MinHash signatures: 8 universal-hash minima over token
    3-gram shingle hashes, one row per (doc, hash index)."""
    return D.minhash_signatures(_docs(spark, sf_dir), num_hashes=8, n=3, seed=42)


@register(
    "dedup_minhash_pairs",
    f"""WITH {_minhash_ctes()},
bands AS ({_MBANDS})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id""",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs sharing >= 1 MinHash band (4 bands x 2
    rows) — the scale path for Jaccard dedup: band-key equi-join instead
    of all-pairs."""
    return D.minhash_band_pairs(
        _docs(spark, sf_dir), num_hashes=8, rows_per_band=2, n=3, seed=42
    )


# --------------------------------------------------------------------- #
# SimHash dedup (M5)
# --------------------------------------------------------------------- #

_SIMHASH_CTES = f"""
tokh AS (SELECT doc_id, {h48_sql('tok')} AS h
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
bits AS (SELECT doc_id, j, sum(((h >> j) & 1)*2 - 1) AS v
         FROM tokh CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS j) AS t(j)
         GROUP BY doc_id, j),
sims AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
         FROM bits GROUP BY doc_id)
"""


@register(
    "dedup_simhash",
    f"WITH {_SIMHASH_CTES} SELECT doc_id AS id, simhash FROM sims",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash fingerprint per document (per-bit majority vote
    over token hashes)."""
    return D.simhash_table(_docs(spark, sf_dir))


@register(
    "dedup_simhash_pairs",
    f"""WITH {_SIMHASH_CTES},
withsrc AS (SELECT s.doc_id, simhash, source
            FROM sims s JOIN documents d ON d.doc_id = s.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM withsrc a JOIN withsrc b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 4, blocked on
    source."""
    return D.simhash_pairs(_docs(spark, sf_dir), max_hamming=4)


# --------------------------------------------------------------------- #
# Text analysis (M5): stats, quality, language-ID, fingerprint, top-k
# --------------------------------------------------------------------- #

@register(
    "text_stats",
    """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id AS id,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
       length(text)::BIGINT AS n_chars,
       round((length(text) - (len(toks) - 1))::DOUBLE / len(toks), 5) AS avg_token_len
FROM tok""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + basic corpus stats per document."""
    docs = _docs(spark, sf_dir)
    toks = X.tokens_col(F.col("text"))
    n_tok = F.size(toks).cast("long")
    return docs.select(
        F.col("doc_id").alias("id"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            (F.length("text") - (n_tok - 1)).cast("double") / n_tok, 5
        ).alias("avg_token_len"),
    )


@register(
    "text_quality",
    """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
feat AS (SELECT doc_id,
    len(toks)::DOUBLE AS n_tokens,
    length(text)::DOUBLE AS n_chars,
    len(list_filter(toks, t -> list_contains(['the','a','and','of','to'], t)))::DOUBLE AS n_stop,
    (length(text) - length(regexp_replace(text, '[a-z ]', '', 'g')))::DOUBLE AS n_alpha,
    (length(text) - (len(toks) - 1))::DOUBLE / len(toks) AS avg_tok_len
  FROM tok)
SELECT doc_id AS id,
    n_tokens::BIGINT AS n_tokens,
    round(least(1.0, n_tokens / 50.0), 5) AS len_score,
    round(n_stop / n_tokens, 5) AS stop_ratio,
    round(n_alpha / n_chars, 5) AS alpha_ratio,
    round(1.0 - least(1.0, abs(avg_tok_len - 5.0) / 5.0), 5) AS tok_len_score,
    round(0.3*least(1.0, n_tokens / 50.0) + 0.2*(n_stop / n_tokens)
        + 0.3*(n_alpha / n_chars)
        + 0.2*(1.0 - least(1.0, abs(avg_tok_len - 5.0) / 5.0)), 5) AS quality
FROM feat""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length/stopword/alpha/token-length
    components)."""
    docs = _docs(spark, sf_dir)
    cols = X.quality_score_cols(F.col("text"))
    return docs.select(F.col("doc_id").alias("id"), *[c.alias(k) for k, c in cols.items()])


_LANG_SCORES = ", ".join(
    "len(list_filter(toks, t -> list_contains(["
    + ",".join(f"'{m}'" for m in X.LANG_MARKERS[lang])
    + f"], t))) AS s_{lang}"
    for lang in sorted(X.LANG_MARKERS)
)


@register(
    "text_langid",
    f"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sc AS (SELECT doc_id, {_LANG_SCORES} FROM tok),
best AS (SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
                greatest(s_de, s_en, s_es, s_fr, s_zh) AS b FROM sc)
SELECT doc_id AS id,
       CASE WHEN b = 0 THEN 'und'
            WHEN s_de = b THEN 'de'
            WHEN s_en = b THEN 'en'
            WHEN s_es = b THEN 'es'
            WHEN s_fr = b THEN 'fr'
            ELSE 'zh' END AS lang_pred
FROM best""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (deterministic argmax with
    alphabetical tiebreak)."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        X.language_id_col(F.col("text")).alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    f"""SELECT doc_id AS id,
       CASE WHEN length(text) >= 5
            THEN list_min(list_transform(
                 list_transform(generate_series(1, length(text)-4),
                                i -> substr(text, i, 5)), g -> {h48_sql('g')}))
            ELSE {h48_sql('text')} END AS fingerprint
FROM documents""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min h48 over character 5-grams."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        X.fingerprint_col(F.col("text"), 5).alias("fingerprint"),
    )


@register(
    "text_token_topk",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
c AS (SELECT token, count(*)::BIGINT AS cnt FROM t GROUP BY token),
r AS (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM c)
SELECT token, cnt, rank FROM r WHERE rank <= 20""",
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 tokens by frequency (explode -> hash agg ->
    TakeOrdered)."""
    docs = _docs(spark, sf_dir)
    c = (
        docs.select(F.explode(X.tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("token", "cnt", F.col("rank").cast("long").alias("rank"))
    )
