#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

``--closing-round N`` additionally commits the run as the round's
quiet-host control artifact ``CLOSING_BENCH_rN.json`` (VERDICT r11
#3): the same schema as the driver's BENCH_rN.json plus per-rep runs
and the quiet-host guard sampled at start and end, so quiet-vs-driver
line diffs are mechanical instead of prose.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from lshrs_spark.cache import release_slots
from lshrs_spark.session import get_spark
# The timed line definitions live in tools/bench_lines.py — ONE module
# both this bench and the drift runner (tools/drift_ab.py) import, so
# an isolated re-measure can never silently diverge from the series it
# is judged against (VERDICT r11 #1 extended the sharing to the
# knn/mips/stream/store sections).
from tools.bench_lines import (
    BenchState,
    bench_docs,
    quiet_guard,
    shared_line_fns,
    store_line_fns,
    vector_line_fns,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# Repetitions per query: min-of-N with one excluded warm-up run, so
# round-over-round deltas measure the plan, not JVM/JIT/page-cache noise
# (VERDICT r2 #2: the r01->r02 "regression" cluster was single-shot
# timing noise). Per-run values are emitted under "runs".
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
RUNS: dict[str, list[float]] = {}

# The served BM25/phrase query vocabulary (terms present in the
# synthetic corpus). The distinct-phrases control line and the serving
# probe both derive their query mixes from this one list.
_PHRASE_VOCAB = ["vector", "hash", "join", "stream", "table", "scan",
                 "query", "filter", "sort", "agg", "window"]


def distinct_phrase_sets() -> list:
    """The 100-DISTINCT-phrases control mix — ONE derivation shared by
    the bench line and tools/serving_probe.py (r13 review: a private
    copy of the comprehension in each would let the two series drift
    onto different query mixes, the divergence tools/bench_lines.py
    exists to prevent)."""
    return [[a, b] for a in _PHRASE_VOCAB for b in _PHRASE_VOCAB
            if a != b][:100]


def timed(fn, name: str | None = None, *, warmup: bool = True, reps: int = REPS,
          max_extra: int = 3):
    out = fn() if warmup else None
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    # Adaptive top-up: this host shows episodic multi-second stalls that
    # migrate between queries across runs (VM steal bursts; system time
    # observed above user time) — a stall window can inflate EVERY base
    # rep and read as a plan regression. Keep sampling until the fastest
    # time is reproduced within 25% by a second rep (quiet machine: the
    # base reps already satisfy this and no extra run happens), capped
    # at `max_extra` so one bench line cannot stall the whole suite.
    for _ in range(max_extra):
        s = sorted(times)
        if len(s) >= 2 and s[1] <= s[0] * 1.25:
            break
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    if name is not None:
        RUNS[name] = [round(t, 3) for t in times]
    return min(times), out


def p95_index(n: int) -> int:
    """Index of the p95 order statistic for an n-element sorted list —
    computed from the length (lat[94] hardcoded the 100-query case and
    silently mis-reported any other size). ceil(0.95*n)-1 generalizes
    lat[94] exactly: 94 for n=100 (int(0.95*n) would give 95 — the p96
    statistic — and the list maximum for small n)."""
    import math

    return max(0, math.ceil(0.95 * n) - 1)


def serve_latencies(fn, queries, *, loops: int = 2):
    """Per-query serving latencies for the p95 contract, best-of-``loops``
    full passes (compared at the p95): a host-level stall window during
    ONE pass (see `timed`'s rationale) would otherwise report as serving
    regression. Within the winning pass the distribution is untouched —
    p95 still reflects 100 consecutive real queries."""
    best = None
    i95 = p95_index(len(queries))
    for _ in range(loops):
        lat = []
        for q in queries:
            t0 = time.perf_counter()
            fn(q)
            lat.append(time.perf_counter() - t0)
        lat.sort()
        if best is None or lat[i95] < best[i95]:
            best = lat
    return best


def main(closing_round: int | None = None) -> None:
    guard_start = (quiet_guard(CPUS, io_paths=[SF_DIR])
                   if closing_round is not None else None)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # Shared lazy corpus/store state + the timed line definitions —
    # the SAME objects tools/drift_ab.py drives for isolated
    # re-measures (tools/bench_lines.py is the single source).
    st = BenchState(spark, SF_DIR, CPUS)
    emb = st.emb()  # warms the scan / JVM before timing
    vfns = vector_line_fns(st)
    sfns = store_line_fns(st)

    results: dict[str, float] = {}

    # 1. Bulk index build (S1+H1-H4+S4): signatures + explode, materialized.
    results["index_build"], n_entries = timed(
        vfns["index_build"], "index_build")
    # cache the probe index NOW — only after the build line is timed
    # (the cached plan would turn index_build into a cache read)
    st.idx_cached()

    # 2. Batch top-k probe: 100 query vectors through one plan (Q1-Q4).
    results["topk_batch100"], _ = timed(
        vfns["topk_batch100"], "topk_batch100")

    # 2b. Same batch with multiprobe=2 (r7): perturbation keys emitted
    # inside the signature Arrow UDF — 3x the probe rows, measuring the
    # recall knob's cost on the corpus-scale path.
    results["topk_batch100_mp2"], _ = timed(
        vfns["topk_batch100_mp2"], "topk_batch100_mp2")

    # 3. Rerank + top-p for the same 100 queries (Q5-Q8).
    results["topp_batch100"], _ = timed(
        vfns["topp_batch100"], "topp_batch100")

    # 4. Single-query latency through the user API (collects to driver).
    results["single_topk"], _ = timed(vfns["single_topk"], "single_topk")

    # 5. LSH similarity self-join (recall-friendly banding) over
    # embeddings, then the same join over a DELIBERATELY skewed corpus
    # (hot-bucket hazard) — definitions in tools/bench_lines.py.
    results["simjoin_lsh"], _ = timed(vfns["simjoin_lsh"], "simjoin_lsh")
    results["simjoin_lsh_skew"], _ = timed(
        vfns["simjoin_lsh_skew"], "simjoin_lsh_skew")

    # 6. Dedup pipeline over documents: MinHash bands + SimHash table.
    from lshrs_spark.operators.dedup import minhash_band_pairs

    # One small parquet file -> one input split; spread the corpus over the
    # cores (at real scale the file count provides this parallelism).
    docs = bench_docs(spark, SF_DIR, CPUS)
    docs.persist().count()
    bm25_store = os.path.join(tempfile.gettempdir(), "lshrs_bench_bm25")
    shared = shared_line_fns(spark, docs, SF_DIR, bm25_store=bm25_store)
    # Warm the shingle/md5 codegen + shuffle path on a 100-doc slice so the
    # timed run measures steady-state throughput, not first-compile JIT
    # (same convention as emb.count() and the 20x warm build below).
    minhash_band_pairs(docs.limit(100), num_hashes=8, rows_per_band=2).count()
    # release the simjoin index caches before timing the dedup phase so
    # rep timings are not entangled with other operators' cached blocks
    release_slots()
    # Portable-hash (h48/md5) mode: oracle-checkable, but Spark's md5
    # enters synchronized JVM digest machinery per call and shows
    # sporadic multi-second stalls under 32 concurrent threads (GC and
    # cgroup throttling measured and ruled out; xxhash64 reps are flat).
    # 5 reps so min-of-N stays meaningful through a stall.
    results["dedup_minhash"], _ = timed(
        shared["dedup_minhash"], "dedup_minhash", reps=max(REPS, 5),
    )
    # Production-hash mode (JVM-native xxhash64): the at-scale profile.
    results["dedup_minhash_xxh"], _ = timed(
        shared["dedup_minhash_xxh"], "dedup_minhash_xxh",
    )
    results["dedup_simhash"], _ = timed(
        shared["dedup_simhash"], "dedup_simhash")

    # 6a / 6a'. Image, audio and video near-dup: payload build ->
    # Arrow decode + perceptual hash -> banded pair joins (definitions
    # in tools/bench_lines.py).
    results["dedup_image_phash"], _ = timed(
        shared["dedup_image_phash"], "dedup_image_phash")
    results["dedup_audio_fp"], _ = timed(
        shared["dedup_audio_fp"], "dedup_audio_fp")
    results["dedup_video_frames"], _ = timed(
        shared["dedup_video_frames"], "dedup_video_frames",
    )

    # 6b. Exact-substring dedup (rolling 32-token spans, inverted-index
    # join) and BPE token counting (distinct-word Arrow UDF + join-back).
    from lshrs_spark.functions.bpe import DEFAULT_MERGES, bpe_token_counts
    from lshrs_spark.operators.dedup import substring_span_pairs

    substring_span_pairs(docs.limit(100), 32).count()  # warm
    results["dedup_substring"], _ = timed(
        shared["dedup_substring"], "dedup_substring",
    )
    bpe_token_counts(docs.limit(100), DEFAULT_MERGES).count()  # warm
    results["text_bpe_counts"], _ = timed(
        shared["text_bpe_counts"], "text_bpe_counts",
    )

    # 7. Text-analysis pass (quality + language-ID + fingerprint in one scan).
    results["text_pipeline"], _ = timed(
        shared["text_pipeline"], "text_pipeline",
    )

    # 7a. Hybrid retrieval: BM25 (one scan projection + broadcast corpus
    # constants + TakeOrderedAndProject) fused with the cosine shortlist
    # by Reciprocal Rank Fusion — the full keyword+vector search path.
    results["text_hybrid_rrf"], _ = timed(
        shared["text_hybrid_rrf"], "text_hybrid_rrf",
    )

    # 7b. Corpus-ops pass over the same documents: exact heavy hitters
    # (zero-shuffle pigeonhole prune + verify), snapshot diff (16-byte
    # hash shuffle, payloads stay put), near-dup graph centrality
    # (3 PageRank rounds over the banded minhash pair graph).
    results["text_heavy_hitters"], _ = timed(
        shared["text_heavy_hitters"], "text_heavy_hitters"
    )
    results["corpus_diff"], _ = timed(
        shared["corpus_diff"], "corpus_diff"
    )
    results["graph_pagerank"], _ = timed(
        shared["graph_pagerank"], "graph_pagerank"
    )

    # 8. Streaming ingest of the events stream (complete-mode agg).
    results["stream_agg"], _ = timed(vfns["stream_agg"], "stream_agg")

    # 9. Baseline-comparable throughput (BASELINE.md: >10k vectors/sec
    # indexing, <100 ms query): index a 20x-replicated corpus and measure
    # steady-state vectors/sec; amortized per-query latency from the
    # 100-query batch.
    n_emb = emb.count()
    big = st.big()
    n_big = big.count()
    # BASELINE.md's indexing target is steady-state batch throughput —
    # warm the path once (JIT/Arrow/python-worker spin-up) then measure.
    sfns["index_build_20x"]()
    t_big, _ = timed(
        sfns["index_build_20x"], "index_build_20x", warmup=False,
    )
    results["index_build_20x"] = t_big

    # 10. Single query against the STORED 20x index through signature
    # predicate pushdown (candidates_from_path): the latency that stays
    # flat as the index grows (measured flat 1x -> 100x locally).
    store = st.lsh_store()
    sfns["single_topk_stored20x"]()  # warm
    results["single_topk_stored20x"], _ = timed(
        sfns["single_topk_stored20x"],
        "single_topk_stored20x", warmup=False,
    )

    # 11. No-Spark-job online serving (reference contract: p95 < 100 ms,
    # requirements.md:73): IndexServer reads the SAME stored 20x index via
    # pyarrow partition + row-group-stat pruning. 100 distinct queries.
    from lshrs_spark.serving import IndexServer

    srv = IndexServer(store, st.cfg)
    qvecs = [
        np.array(r.embedding, dtype=np.float32)
        for r in emb.filter(F.col("vec_id") < 100).collect()
    ]
    srv.get_top_k(qvecs[0], 10)  # warm
    lat = serve_latencies(lambda q: srv.get_top_k(q, 10), qvecs)
    serve_p95_ms = lat[p95_index(len(lat))] * 1000
    # Batch serving: all 100 queries through ONE pruned read (shared
    # buckets collapse); reported amortized per query.
    batch_min, _ = timed(
        lambda: srv.get_top_k_batch(qvecs, 10), "served20x_batch100", reps=2
    )
    results["served20x_batch100_per_query"] = batch_min / len(qvecs)
    results["single_topk_served20x"] = lat[len(lat) // 2]

    # 12. ANN serving twin: stored IVF layout over the 20x corpus,
    # queried driver-side with partition-pruned pyarrow reads.
    from lshrs_spark.operators.knn import ivf_centroids_by_id, ivf_write_store
    from lshrs_spark.serving import IVFServer

    ivf_store = os.path.join(tempfile.gettempdir(), "lshrs_bench_ivf20x")
    ivf_write_store(big, ivf_centroids_by_id(emb, 64), ivf_store)
    isrv = IVFServer.from_store(ivf_store)
    isrv.topk(qvecs[0], 10, 4)  # warm
    lat_ivf = serve_latencies(lambda q: isrv.topk(q, 10, 4), qvecs)
    ann_serve_p95_ms = lat_ivf[p95_index(len(lat_ivf))] * 1000
    results["ann_ivf_served20x"] = lat_ivf[len(lat_ivf) // 2]

    # 12a'. Maintenance-path cost (VERDICT r10 #6): the nightly unit on
    # a DELIBERATELY skewed 20x store — 20% of rows collapse onto two
    # embeddings, so two centroids each hold ~10% of the corpus (>> the
    # 4x-mean hot rule) — timing ONE detect + split-both + LSM-fold
    # cycle. The store is re-planted between reps by copying a
    # template built once (maintenance mutates the tree; rebuilding
    # through Spark per rep would time the build, not the unit), so
    # every rep detects and splits the same two hot partitions.
    # Fixed lshrs_bench_* paths are the bench's deliberate convention
    # (serving_probe.py replays against the same stores): the bench is
    # single-instance by contract — two concurrent benches invalidate
    # each other's TIMINGS regardless of path isolation. The plant /
    # run pair lives in tools/bench_lines.py (the drift runner drives
    # the same reset hook before every rep).
    maint = sfns["ivf_maintain_20x"]
    maint["reset"]()
    maint["fn"]()  # warm-up cycle, excluded
    maint_times = []
    for _ in range(REPS):
        maint["reset"]()
        t0 = time.perf_counter()
        maint["fn"]()
        maint_times.append(time.perf_counter() - t0)
    RUNS["ivf_maintain_20x"] = [round(t, 3) for t in maint_times]
    results["ivf_maintain_20x"] = min(maint_times)

    # 12b. Matryoshka served (round-8): truncated-width stored probe
    # (16 of 64 dims — 4x smaller partition reads) + full-width refine
    # of the 40-row shortlist from the id-sorted _full sidecar.
    from lshrs_spark.serving import TruncatedIVFServer

    tivf_store = st.tivf_store()
    tsrv = TruncatedIVFServer.from_store(tivf_store)
    tsrv.topk(qvecs[0], 10, 4)  # warm
    lat_tivf = serve_latencies(lambda q: tsrv.topk(q, 10, 4), qvecs)
    trunc_serve_p95_ms = lat_tivf[p95_index(len(lat_tivf))] * 1000
    results["ann_truncated_served20x"] = lat_tivf[len(lat_tivf) // 2]

    # 12c. Spark-side BATCH query against the SAME stored matryoshka
    # layout (round-9, truncated_topk_stored): partition-pruned coarse
    # probe at truncated width + ONE shared full-width rerank pass over
    # the sidecar amortized across the 100-query batch — the stored twin
    # of knn_truncated_batch100's in-plan two-stage.
    sfns["knn_truncated_stored20x_batch100"]()  # warm
    results["knn_truncated_stored20x_batch100"], _ = timed(
        sfns["knn_truncated_stored20x_batch100"],
        "knn_truncated_stored20x_batch100", warmup=False,
    )

    # 13. PQ compressed-scan ANN over the 20x corpus: codebooks trained
    # on the 1x corpus, code table materialized once (the production
    # stored layout), ADC query reads only (id, j, code) + an m x k
    # distance table (setup + line in tools/bench_lines.py).
    cb, _codes, _qvl = st.pq_parts()
    sfns["ann_pq_query20x"]()  # warm
    results["ann_pq_query20x"], _ = timed(
        sfns["ann_pq_query20x"], "ann_pq_query20x", warmup=False,
    )

    # 14. PQ served (no Spark job): the code table loads once, every
    # query is one vectorized gather-sum over m bytes/doc.
    from lshrs_spark.operators.knn import pq_write_store
    from lshrs_spark.serving import PQServer

    pq_store = os.path.join(tempfile.gettempdir(), "lshrs_bench_pq20x")
    pq_write_store(big, cb, pq_store, m=4, dim=64)
    psrv = PQServer.from_store(pq_store)
    psrv.topk(qvecs[0], 10)  # warm
    lat_pq = serve_latencies(lambda q: psrv.topk(q, 10), qvecs)
    pq_serve_p95_ms = lat_pq[p95_index(len(lat_pq))] * 1000
    results["ann_pq_served20x"] = lat_pq[len(lat_pq) // 2]

    # 9b. MIPS through the cosine IVF tier (round-6): de-normalize,
    # norm-augment, probe — the magnitude-aware retrieval path riding
    # the existing partition pruning unchanged (setup + line in
    # tools/bench_lines.py).
    results["mips_ivf_batch100"], _ = timed(
        vfns["mips_ivf_batch100"], "mips_ivf_batch100")

    # 9c. Matryoshka two-stage (round-8): coarse over the 16-of-64
    # prefix (4x fewer bytes/multiply-adds in the scan) + full-width
    # rerank of 40 rows/query, vs the same batch brute-forced at full
    # width — the coarse-probe cost win the tier exists for.
    results["knn_full_batch100"], _ = timed(
        vfns["knn_full_batch100"], "knn_full_batch100")
    results["knn_truncated_batch100"], _ = timed(
        vfns["knn_truncated_batch100"], "knn_truncated_batch100")

    # 9e. MMR diversified rerank (round-9): same 100-query brute
    # shortlist as knn_full_batch100 (40/query) + the greedy
    # diversification pass — the delta vs knn_full_batch100 is what
    # post-shortlist diversity costs at this scale.
    results["knn_mmr_batch100"], _ = timed(
        vfns["knn_mmr_batch100"], "knn_mmr_batch100")

    # 10. BM25 keyword serving: stored postings layout, no Spark job.
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.serving import BM25Server

    results["bm25_index_build"], _ = timed(
        shared["bm25_index_build"], "bm25_index_build", reps=1,
    )
    bsrv = BM25Server(bm25_store)
    term_sets = [
        ["vector", "hash", "join", "stream"],
        ["table", "scan"], ["query", "filter", "sort"], ["agg", "window"],
    ] * 25
    lat_bm = serve_latencies(lambda t: bsrv.search(t, 10), term_sets)
    bm25_serve_p95_ms = lat_bm[p95_index(len(lat_bm))] * 1000
    results["bm25_served"] = lat_bm[len(lat_bm) // 2]
    # batch API: one postings read per DISTINCT term across the batch
    # (here 11 distinct terms serve 100 queries) — amortized per-query
    t_bb = None
    for _ in range(3):
        t0 = time.perf_counter()
        bsrv.search_batch(term_sets, 10)
        dt = time.perf_counter() - t0
        t_bb = dt if t_bb is None or dt < t_bb else t_bb
    results["bm25_served_batch100_per_query"] = t_bb / len(term_sets)

    # 11. Phrase batch serving: one positions read per DISTINCT term
    # across 100 phrase queries (positional layout; setup untimed so
    # bm25_index_build stays comparable round over round).
    bm25_pos_store = os.path.join(tempfile.gettempdir(), "lshrs_bench_bm25p")
    bm25_index_write(docs, bm25_pos_store, num_buckets=32,
                     store_positions=True)
    psrv = BM25Server(bm25_pos_store)
    phrase_sets = [
        ["vector", "hash"], ["table", "scan"],
        ["query", "filter"], ["agg", "window"],
    ] * 25
    t_pb = None
    for _ in range(3):
        t0 = time.perf_counter()
        psrv.phrase_batch(phrase_sets)
        dt = time.perf_counter() - t0
        t_pb = dt if t_pb is None or dt < t_pb else t_pb
    results["bm25_phrase_batch100_per_query"] = t_pb / len(phrase_sets)
    # uncapped control (VERDICT r9 wrong #2): the same batch with the
    # per-term document-frequency cache bound disabled. The default-on
    # max_cached_df="auto" (r8 brief #7) trades the one-read-per-
    # distinct-term guarantee for bounded driver memory by routing
    # df > 5%-of-corpus terms to the pruned per-phrase read; this line
    # keeps that trade's time cost a measured series rather than a
    # one-off docstring claim (it explains the r8->r9 0.016->0.054 s
    # delta on the capped line).
    t_pu = None
    for _ in range(3):
        t0 = time.perf_counter()
        psrv.phrase_batch(phrase_sets, max_cached_df=None)
        dt = time.perf_counter() - t0
        t_pu = dt if t_pu is None or dt < t_pu else t_pu
    results["bm25_phrase_batch100_uncapped_per_query"] = t_pu / len(phrase_sets)
    # 100-DISTINCT-phrases control (r13): the two lines above carry
    # only 4 distinct phrases, so after the r13 whole-phrase dedup
    # they mostly amortize four intersections across 100 queries —
    # the intended serving win for log-shaped traffic, but no longer
    # a per-intersection cost series. This line keeps that series:
    # every phrase distinct (dedup can't collapse them; the hot slot
    # still groups the ~11 shared lead terms).
    distinct_sets = distinct_phrase_sets()
    t_pd = None
    for _ in range(3):
        t0 = time.perf_counter()
        psrv.phrase_batch(distinct_sets)
        dt = time.perf_counter() - t0
        t_pd = dt if t_pd is None or dt < t_pd else t_pd
    results["bm25_phrase_batch100_distinct_per_query"] = (
        t_pd / len(distinct_sets))

    total = sum(results.values())
    # BASELINE.md memory target (<2 GB): driver-process peak RSS.
    # Executor memory is the JVM's (local mode shares the process);
    # the python driver side is what we can measure portably.
    rss_mb = round(
        __import__("resource").getrusage(
            __import__("resource").RUSAGE_SELF
        ).ru_maxrss / 1024
    )
    summary = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "sf": float(sf),
        "bench_reps": REPS,
        "index_vectors_per_sec": round(n_big / t_big),
        "query_latency_amortized_ms": round(
            results["topk_batch100"] / 100 * 1000, 2
        ),
        "single_query_p95_ms": round(serve_p95_ms, 2),
        "ann_query_p95_ms": round(ann_serve_p95_ms, 2),
        "truncated_query_p95_ms": round(trunc_serve_p95_ms, 2),
        "pq_query_p95_ms": round(pq_serve_p95_ms, 2),
        "bm25_query_p95_ms": round(bm25_serve_p95_ms, 2),
        "driver_peak_rss_mb": rss_mb,
        "corpus_vectors": n_emb,
    }
    # Full per-rep detail goes to a sidecar file + a non-final stdout line;
    # the FINAL stdout line is the compact summary WITHOUT "runs", sized to
    # survive the driver's bounded tail capture (VERDICT r6 #1: the grown
    # single-line JSON with per-rep runs overflowed the window and the
    # driver recorded "parsed": null).
    detail = dict(summary)
    detail["metric"] = "headline_total_detail"
    detail["runs"] = RUNS
    detail_path = os.path.join(tempfile.gettempdir(), "lshrs_bench_runs.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f)
    except OSError:
        pass
    if closing_round is not None:
        # the committed quiet-host control point (VERDICT r11 #3) —
        # same schema as the driver artifact, plus per-rep runs and
        # the start/end quiet guards (a guard sampled only once can
        # miss load arriving mid-run)
        closing = dict(summary)
        closing["metric"] = "closing_bench"
        closing["runs"] = RUNS
        closing["guard_start"] = guard_start
        # end sample: raw numbers only — the bench's own JVM and its
        # just-finished 40 lines dominate load1 here, so a quiet/loud
        # verdict would be self-measurement; judge quietness by
        # guard_start's verdict plus this sample's stray count
        closing["guard_end"] = {
            k: v for k, v in quiet_guard(CPUS, own_jvms=1).items()
            if k != "quiet"
        }
        cpath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"CLOSING_BENCH_r{closing_round}.json",
        )
        with open(cpath, "w") as f:
            json.dump(closing, f, indent=1)
    print(json.dumps(detail))
    # The compact summary MUST be the final stdout line even if
    # spark.stop() hangs or raises (observed hanging under JVM
    # contention): print it first, flush, then stop. Spark logs go to
    # stderr, so nothing else lands on stdout after this.
    print(json.dumps(summary), flush=True)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    closing = None
    argv = sys.argv[1:]
    if argv[:1] == ["--closing-round"]:
        if len(argv) != 2 or not argv[1].isdigit():
            # anything trailing the round number is a typo — fail fast
            # rather than silently producing a control artifact under
            # unintended settings
            sys.exit("usage: bench.py [--closing-round N] (no other args)")
        closing = int(argv[1])
    elif argv:
        sys.exit(f"unknown arguments: {argv}")
    main(closing)
