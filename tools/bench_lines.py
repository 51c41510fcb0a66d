"""Shared bench-line definitions for bench.py and tools/drift_ab.py.

The drift protocol's isolated re-measures are only meaningful if they
time EXACTLY the computation the bench series records — the first
drift_ab draft diverged from bench.py's corpus setup (missing
``repartition(CPUS).persist()``) and read ``dedup_substring`` 2.2x
slow from single-input-split shingling. These definitions are the
single source both scripts import, so a bench-line edit cannot
silently invalidate the A/B protocol.

Round-12 (VERDICT r11 #1): the knn / mips / stream / store-building
sections moved here too — the r11 driver-file movers were exactly the
lines the runner could NOT re-measure. The store-building sections
share state (the 20x corpus, the cached probe index, stored layouts),
so they live behind :class:`BenchState`, a lazy builder both scripts
drive: bench.py materializes each piece at its own timing point; the
drift runner materializes only what the requested lines need (setup
cost lands in the excluded warm-up run).

Three sections, each a ``{name: line}`` dict where a line is either a
zero-arg callable (timed as-is) or ``{"fn": f, "reset": g}`` (``g``
re-plants mutated state before EVERY run, excluded from timing —
maintenance lines mutate the store tree):

- :func:`shared_line_fns`  — document-corpus lines (needs ``docs``)
- :func:`vector_line_fns`  — embeddings-corpus lines (1x corpus)
- :func:`store_line_fns`   — 20x-corpus + stored-layout lines
"""

from __future__ import annotations

import os
import tempfile
import time

# Canonical execution order across all three sections — bench.py's
# OWN relative timing order for the shared lines (verified against the
# bench flow; a drift run skips the unshared lines between them). The
# drift runner re-measures any requested subset IN THIS ORDER so the
# cache state during a line's reps tracks the bench series: the probe
# index is cached after index_build, and the persisted 20x corpus +
# stored layouts exist BEFORE the mips/knn/bm25 lines, exactly as in
# bench.py (the first draft ran mips/knn before the store section and
# measured them without the 20x blocks resident — the same silent
# environment divergence the shared module exists to prevent).
# BenchState is lazy, so order alone does not guarantee residency for
# a SUBSET run that skips the store lines — the drift runner therefore
# materializes, right before timing each line, exactly the store
# pieces belonging to EARLIER store lines in this order (ADVICE r12;
# see drift_ab.build_line_fns's materialize_before — building all of
# it up front would instead tilt the PRE-store lines' environment).
LINE_ORDER = [
    # bench sections 1-5b: build, probes, rerank, user API, self-joins
    "index_build", "topk_batch100", "topk_batch100_mp2",
    "topp_batch100", "single_topk", "simjoin_lsh", "simjoin_lsh_skew",
    # bench sections 6-7b: document corpus
    "dedup_minhash", "dedup_minhash_xxh", "dedup_simhash",
    "dedup_image_phash", "dedup_audio_fp", "dedup_video_frames",
    "dedup_substring", "text_bpe_counts",
    "text_pipeline", "text_hybrid_rrf", "text_heavy_hitters",
    "corpus_diff", "graph_pagerank",
    # bench section 8: streaming
    "stream_agg",
    # bench sections 9-13: 20x corpus + stored layouts + PQ codes
    "index_build_20x", "single_topk_stored20x", "ivf_maintain_20x",
    "knn_truncated_stored20x_batch100", "ann_pq_query20x",
    # bench sections 9b-9e (timed after the store section in bench.py)
    "mips_ivf_batch100", "knn_full_batch100", "knn_truncated_batch100",
    "knn_mmr_batch100",
    # bench section 10: keyword store build
    "bm25_index_build",
]

# With these, EVERY Spark-side bench line is drift-re-measurable; the
# lines deliberately NOT here are the serving p95s / served-batch
# amortizations (IndexServer/IVFServer/PQ/BM25 reads are JVM-free —
# tools/serving_probe.py IS their isolated re-measure).
DOC_LINES = [
    "dedup_minhash", "dedup_minhash_xxh", "dedup_simhash",
    "dedup_image_phash", "dedup_audio_fp", "dedup_video_frames",
    "dedup_substring", "text_bpe_counts",
    "text_pipeline", "text_hybrid_rrf", "text_heavy_hitters",
    "corpus_diff", "graph_pagerank", "bm25_index_build",
]
VECTOR_LINES = [
    "index_build", "topk_batch100", "topk_batch100_mp2",
    "topp_batch100", "single_topk", "simjoin_lsh", "simjoin_lsh_skew",
    "stream_agg",
    "mips_ivf_batch100", "knn_full_batch100", "knn_truncated_batch100",
    "knn_mmr_batch100",
]
STORE_LINES = [
    "index_build_20x", "single_topk_stored20x", "ivf_maintain_20x",
    "knn_truncated_stored20x_batch100", "ann_pq_query20x",
]

# Lines whose timing is only valid BEFORE the cached probe index
# exists (see vector_line_fns["index_build"]'s guard). A multi-pass
# A/B run times them in its FIRST pass only — by pass 2 the cache
# exists (topk/topp built it) and a re-measure would time a cache
# read, not the build.
PRE_CACHE_LINES = {"index_build"}


# I/O canary thresholds (VERDICT r13 missing #1). cold_ratio compares
# the first strided read of the sampled bytes against an immediate
# re-read of the SAME bytes (by then page-cache resident — the host's
# own memory-speed ceiling, so the verdict is independent of absolute
# disk speed). Calibrated on this host against sf0.1 (17.5 MB
# sampled): fully resident reads 0.99-1.6; after
# `echo 3 > /proc/sys/vm/drop_caches` the same sample reads 26x; a
# partially-evicted state (minutes after a JVM last touched the files)
# read 6x. 3.0 splits resident from any faulting regime with margin on
# both sides and sits below the 2-5x serving-tier distortion the
# README documented under a green CPU/JVM-only guard — the blind spot
# this canary exists to flag.
IO_CANARY_COLD_RATIO = 3.0
# Below this many sampled bytes the two timings are dominated by
# syscall noise, not the storage tier: record the reading but do not
# let it flip the verdict (a store this small also re-warms inside
# any run's first loop, so it cannot sustain a p95 distortion).
IO_CANARY_MIN_BYTES = 4 << 20
# A cold verdict additionally requires the first pass to have LOST at
# least this much wall time to faulting: a ratio alone can trip on
# sub-ms syscall noise when the sample is fast either way, and a
# faulting mass below this floor cannot meaningfully distort the
# multi-second bench lines or a 100-query p95 series.
IO_CANARY_MIN_DELTA_S = 0.02

# CPU-steal canary threshold (VERDICT r14 #2): the guard's last
# documented blind spot — hypervisor co-tenant CPU steal inflated the
# driver's first six 32-core r14 bench lines 2-5x and serving run 3's
# pure-CPU tiers ~1.7x while the JVM/loadavg guard read green (the
# builder diagnosed it by hand: load1 12.25 with procs_running = 1 and
# climbing /proc/stat steal jiffies). A quiet unvirtualized host reads
# 0.0% steal over any window; this host idles at 0.0-0.2% (sampled);
# the r14 incident would have read tens of percent. 1.0% over the
# 0.25 s sample window flags any steal episode big enough to move a
# sub-second bench line while staying above sampling jitter.
STEAL_QUIET_PCT = 1.0
STEAL_SAMPLE_S = 0.25


def cpu_steal_sample(interval_s: float = STEAL_SAMPLE_S) -> dict:
    """``{"steal_pct", "procs_running"}`` — /proc/stat steal-jiffies
    delta over a short window plus the instantaneous runnable-process
    count (VERDICT r14 #2). ``steal_pct`` is the fraction of ALL cpu
    jiffies the hypervisor withheld during the window; it is the
    direct signal for co-tenant CPU steal. ``procs_running`` is the
    divergence side: load1 high while procs_running is ~1 means the
    loadavg is either decaying from past work (steal 0) or external
    steal is inflating it (steal > 0) — recording both lets artifact
    readers tell the two apart. Nones when /proc/stat is unreadable
    (non-Linux)."""
    def _read():
        steal = total = running = None
        with open("/proc/stat") as f:
            for ln in f:
                if ln.startswith("cpu "):
                    parts = [int(x) for x in ln.split()[1:]]
                    total = sum(parts)
                    steal = parts[7] if len(parts) > 7 else 0
                elif ln.startswith("procs_running"):
                    running = int(ln.split()[1])
        return steal, total, running

    try:
        s0, t0, _ = _read()
        time.sleep(interval_s)
        s1, t1, running = _read()
        dt = t1 - t0
        pct = round(100.0 * (s1 - s0) / dt, 3) if dt else None
    except Exception:
        return {"steal_pct": None, "procs_running": None}
    return {"steal_pct": pct, "procs_running": running}


def _eff_burn(burn_s: float) -> int:
    """Time-boxed pure-CPU burn; returns iterations done. Module-level
    so multiprocessing can resolve it by name in forked workers."""
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < burn_s:
        for _ in range(10000):
            n += 1
    return n


def cpu_efficiency_sample(nproc: int | None = None,
                          burn_s: float = 0.35) -> dict:
    """``{"cpu_eff_pct", "cpu_single_mops"}`` — N-process aggregate
    throughput as a percentage of N x the single-process rate, over a
    short pure-CPU burn. This is the co-tenant CONTENTION canary the
    steal counter cannot see (r15 session 2): two closing-bench
    attempts ran uniformly ~1.5x slow under steal_pct 0.0 and a green
    start guard — vCPU throughput was degraded by hypervisor-level
    contention that only manifests under full-width load (measured
    59-70% efficiency during the episode; single-thread serving lines
    stayed flat). OBSERVATIONAL for now: recorded in every guard
    block so a clean-epoch distribution accrues, but it does not flip
    ``quiet`` until a threshold is justified by that distribution —
    the clean-host ceiling of this box is not yet known. Nones on any
    failure (non-Linux, fork limits)."""
    import multiprocessing as mp

    if nproc is None:
        nproc = min(32, os.cpu_count() or 8)
    try:
        single = _eff_burn(burn_s) / burn_s
        with mp.Pool(nproc) as pool:
            counts = pool.map(_eff_burn, [burn_s] * nproc)
        total = sum(counts) / burn_s
        return {
            "cpu_eff_pct": round(100.0 * total / (nproc * single), 1),
            "cpu_single_mops": round(single / 1e6, 1),
        }
    except Exception:
        return {"cpu_eff_pct": None, "cpu_single_mops": None}


def io_canary(paths, *, sample_bytes: int = 32 << 20,
              block: int = 1 << 20, phase: int = 0) -> dict:
    """Timed fixed-size touch-read of the files under ``paths`` — the
    page-cache-side half of the quiet guard (VERDICT r13 missing #1:
    the CPU/JVM guard certified "quiet" while a cold page cache read
    every mmap-backed serving tier 2-5x slow). Samples up to
    ``sample_bytes`` in ``block``-sized reads STRIDED evenly across
    the byte range (so the canary cannot silently pre-warm a whole
    store — at most ``sample_bytes`` of it), times the as-found pass,
    then re-reads the same offsets (now resident) as the memory-speed
    ceiling. ``cold_ratio = t_first / t_resident``: ~1 when the pages
    were already cached, >> 1 when the first pass had to hit the
    device. ``io_quiet`` is False only when all three documented
    conditions hold: ``cold_ratio >=`` :data:`IO_CANARY_COLD_RATIO`,
    at least :data:`IO_CANARY_MIN_BYTES` sampled, and the first pass
    lost at least :data:`IO_CANARY_MIN_DELTA_S` to faulting.

    ``phase`` rotates WHICH stride-th blocks are sampled (phase *k*
    reads a slice disjoint from phase 0 whenever the stride exceeds
    *k*). A retry loop MUST advance the phase: re-reading phase 0
    would measure the previous canary's own residue — the first pass
    paged exactly those offsets in, so an identical second canary
    reads warm no matter how cold the rest of the store still is
    (the self-certification trap the r14 review caught)."""
    import time

    files: list[str] = []
    for p in paths:
        if os.path.isfile(p):
            files.append(p)
        elif os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files.extend(os.path.join(root, n) for n in names)
    files.sort()
    sizes = []
    for f in files:
        try:
            # regular files only — a FIFO in the tree would block the
            # read pass forever, and a vanished file must not abort
            # the guard's caller
            if not os.path.isfile(f):
                continue
            sz = os.path.getsize(f)
        except OSError:
            continue
        if sz > 0:
            sizes.append((f, sz))
    total = sum(sz for _, sz in sizes)
    # every stride-th block across the concatenated byte range
    n_blocks = max(1, (total + block - 1) // block) if total else 0
    want_blocks = max(1, sample_bytes // block)
    stride = max(1, (n_blocks + want_blocks - 1) // want_blocks)
    plan: list[tuple[str, int, int]] = []  # (file, offset, length)
    blk_idx = 0
    for f, sz in sizes:
        off = 0
        while off < sz:
            if blk_idx % stride == int(phase) % stride:
                plan.append((f, off, min(block, sz - off)))
            off += block
            blk_idx += 1
    skipped: set = set()

    def _read_pass() -> float:
        t0 = time.perf_counter()
        cur, fd = None, -1
        try:
            for f, off, ln in plan:
                if f != cur:
                    if fd >= 0:
                        os.close(fd)
                    fd, cur = -1, f
                    try:
                        fd = os.open(f, os.O_RDONLY)
                    except OSError:
                        # a file deleted between plan and read (a
                        # concurrent store rewrite) must not abort the
                        # guard — record, skip, keep sampling
                        skipped.add(f)
                        continue
                if fd >= 0:
                    try:
                        os.pread(fd, ln, off)
                    except OSError:
                        skipped.add(f)
        finally:
            if fd >= 0:
                os.close(fd)
        return time.perf_counter() - t0

    sampled = sum(ln for _, _, ln in plan)
    if not plan:
        return {"bytes": 0, "files": 0, "t_first_s": None,
                "t_resident_s": None, "cold_ratio": None,
                "io_quiet": True, "note": "no bytes under paths"}
    t_first = _read_pass()
    t_resident = _read_pass()
    ratio = t_first / t_resident if t_resident > 0 else float("inf")
    cold = (sampled >= IO_CANARY_MIN_BYTES
            and ratio >= IO_CANARY_COLD_RATIO
            and t_first - t_resident >= IO_CANARY_MIN_DELTA_S)
    out = {"bytes": sampled, "files": len({f for f, _, _ in plan}),
           "t_first_s": round(t_first, 4),
           "t_resident_s": round(t_resident, 4),
           "cold_ratio": round(ratio, 2), "io_quiet": not cold}
    if phase:
        out["phase"] = int(phase)
    if skipped:
        out["skipped_files"] = len(skipped)
    if sampled < IO_CANARY_MIN_BYTES:
        out["note"] = "sample below IO_CANARY_MIN_BYTES; ratio recorded, not judged"
    return out


def quiet_guard(cpus: int, *, own_jvms: int = 0, io_paths=None) -> dict:
    """Record (never silently trust) host quietness: stray JVM count
    and 1-minute load — the same guard serving_probe.py writes. Shared
    by the drift runner and bench.py's --closing-round artifact so
    quiet-vs-driver comparisons carry the same evidence. ``own_jvms``
    is how many of the counted JVMs belong to the CALLER (bench.py's
    end-of-run sample runs while its own session is still up — without
    the allowance every end guard would read un-quiet). The load
    threshold is deliberately NOT relaxed for the end sample: a busy
    own JVM still means the final lines rode a loaded host.

    ``io_paths`` (VERDICT r13 missing #1) adds the page-cache canary:
    an ``io`` sub-dict from :func:`io_canary` over the files the run
    is about to read, and a cold first-read DOWNGRADES ``quiet`` —
    CPU/JVM quietness alone no longer certifies a run whose store
    reads will hit a cold device. Start-of-run guards pass the paths;
    end-of-run raw samples leave it None (the run itself just read
    everything — a canary there would only measure its own warmth).

    r15 (VERDICT r14 #2): every guard additionally samples
    :func:`cpu_steal_sample` — ``steal_pct`` over a 0.25 s window and
    ``procs_running`` — and a steal reading above
    :data:`STEAL_QUIET_PCT` (1.0%) DOWNGRADES ``quiet``:
    hypervisor co-tenant steal was the documented blind spot that
    inflated the r14 driver bench 2-5x under a green guard.
    ``load_divergence`` flags load1 above the threshold while
    procs_running <= 2 (a decaying loadavg or external pressure —
    read it with steal_pct)."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-fc", "SparkSubmit|java -cp"],
            capture_output=True, text=True,
        ).stdout.strip()
        n_java = int(out or 0)
    except Exception:
        n_java = -1
    load1 = os.getloadavg()[0]
    # counted_jvms is the RAW count (VERDICT r12 wrong #3: the old
    # key name "stray_jvms" misled artifact readers when the one JVM
    # counted was the caller's own); strays = counted - own.
    guard = {"counted_jvms": n_java, "own_jvms": own_jvms,
             "load1": round(load1, 2),
             "quiet": 0 <= n_java <= own_jvms and load1 < float(cpus) / 4}
    steal = cpu_steal_sample()
    guard.update(steal)
    guard["load_divergence"] = bool(
        load1 >= float(cpus) / 4
        and steal["procs_running"] is not None
        and steal["procs_running"] <= 2
    )
    if steal["steal_pct"] is not None and steal["steal_pct"] > STEAL_QUIET_PCT:
        guard["quiet"] = False
    # r15 session 2: hypervisor-contention canary (see
    # cpu_efficiency_sample) — recorded, does not yet flip quiet.
    guard.update(cpu_efficiency_sample())
    if io_paths is not None:
        guard["io"] = io_canary(io_paths)
        guard["quiet"] = guard["quiet"] and guard["io"]["io_quiet"]
    return guard


def bench_docs(spark, sf_dir: str, cpus: int):
    """bench.py's corpus setup, verbatim: one small parquet file ->
    one input split, so spread the corpus over the cores. The CALLER
    persists (bench.py times the persist fill; drift_ab warms it
    before any timing)."""
    return spark.read.parquet(
        f"{sf_dir}/documents.parquet").repartition(cpus)


class BenchState:
    """Lazily-built shared corpus/store state behind the embeddings-
    side bench lines. Every piece is built at most once per instance,
    exactly the way bench.py builds it; the drift runner pays only for
    the pieces its requested lines touch.

    ``store_prefix`` defaults to bench.py's fixed ``lshrs_bench_``
    store names (the serving probe replays against those); the drift
    runner passes ``lshrs_drift_`` so an A/B run can never clobber the
    stores a later serving probe reads. Same content either way — the
    path never enters a timed computation.
    """

    def __init__(self, spark, sf_dir: str, cpus: int,
                 store_prefix: str = "lshrs_bench_"):
        from lshrs_spark import LSHConfig

        self.spark = spark
        self.sf_dir = sf_dir
        self.cpus = cpus
        self.store_prefix = store_prefix
        # Production-shaped config: 128 hyperplanes, 8 bands x 16 rows.
        self.cfg = LSHConfig(dim=64, num_perm=128, num_bands=8,
                             rows_per_band=16, seed=42)
        # 16 bands x 8 rows for the similarity self-join: ~256
        # buckets/band at dim 64 — selective enough that candidate
        # pairs stay near-linear in n at this corpus size.
        self.sj_cfg = LSHConfig(dim=64, num_perm=128, num_bands=16,
                                rows_per_band=8, seed=42)
        self._c: dict = {}

    def _store(self, name: str) -> str:
        return os.path.join(tempfile.gettempdir(),
                            f"{self.store_prefix}{name}")

    def emb(self):
        if "emb" not in self._c:
            # NOTE (r14): the 800 KB sf0.1 file reads as ONE input
            # split (under the 4 MB open-cost floor), so 1x-corpus
            # stages run single-task. A repartition(cpus) here was
            # measured and REVERTED: after the Arrow scoring kernels
            # the single-split compute is cheap, and the extra
            # exchange cost ~0.15 s inside every timed line that
            # pipelines from the corpus (index_build, the probe
            # batches, simjoin) while buying nothing. At real scale
            # the file count provides the parallelism.
            emb = self.spark.read.parquet(
                f"{self.sf_dir}/embeddings.parquet")
            emb.count()  # warm the scan / JVM before timing
            self._c["emb"] = emb
        return self._c["emb"]

    def qdf(self):
        """The 100 query vectors (vec_id < 100) as (qid, qvec)."""
        from pyspark.sql import functions as F

        if "qdf" not in self._c:
            self._c["qdf"] = self.emb().filter(
                F.col("vec_id") < 100
            ).select(F.col("vec_id").alias("qid"),
                     F.col("embedding").alias("qvec"))
        return self._c["qdf"]

    def qsigs(self):
        from lshrs_spark.operators.index import build_index

        if "qsigs" not in self._c:
            self._c["qsigs"] = build_index(
                self.qdf(), self.cfg, "qid", "qvec"
            ).withColumnRenamed("id", "qid")
        return self._c["qsigs"]

    def idx_cached(self):
        """The CACHED probe index over the 1x corpus — the state the
        batch probe / rerank lines run against in bench.py."""
        from lshrs_spark.operators.index import build_index

        if "idx" not in self._c:
            idx = build_index(self.emb(), self.cfg,
                              "vec_id", "embedding").cache()
            idx.count()
            self._c["idx"] = idx
        return self._c["idx"]

    def qv(self):
        """Query vector 0 as float32 numpy — the single-query probe."""
        import numpy as np

        if "qv" not in self._c:
            self._c["qv"] = np.array(
                self.emb().filter("vec_id = 0").first().embedding,
                dtype=np.float32)
        return self._c["qv"]

    def qsigs_mp(self):
        """Multiprobe=2 query signatures: perturbation keys emitted
        inside the signature Arrow UDF — 3x the probe rows."""
        from lshrs_spark.operators.index import build_index

        if "qsigs_mp" not in self._c:
            self._c["qsigs_mp"] = build_index(
                self.qdf(), self.cfg, "qid", "qvec", multiprobe=2
            ).withColumnRenamed("id", "qid")
        return self._c["qsigs_mp"]

    def user_api(self):
        """The LSHRS user-API object over the cached index — the
        single-query (driver-collect) latency path."""
        from lshrs_spark import LSHRS

        if "lsh" not in self._c:
            lsh = LSHRS(self.spark, 64, num_perm=128, num_bands=8,
                        rows_per_band=16)
            lsh._index_df = self.idx_cached()
            lsh.set_vectors(self.emb())
            self._c["lsh"] = lsh
        return self._c["lsh"]

    def pq_parts(self):
        """(codebooks, code table, query list) for the PQ ADC line:
        codebooks trained on the 1x corpus (cached), the 20x code
        table materialized once — the production stored layout."""
        from pyspark.sql import functions as F

        from lshrs_spark.operators.knn import pq_codebooks, pq_encode

        if "pq" not in self._c:
            cb = pq_codebooks(self.emb(), m=4, k=16, dim=64,
                              iterations=1).cache()
            cb.count()
            codes = pq_encode(
                self.big().select(F.col("vec_id"), F.col("embedding")),
                cb, m=4, dim=64).persist()
            codes.count()
            qv_list = [float(x) for x in self.qv()]
            self._c["pq"] = (cb, codes, qv_list)
        return self._c["pq"]

    def hot_embedding(self):
        from pyspark.sql import functions as F

        if "hot" not in self._c:
            self._c["hot"] = self.emb().filter(
                F.col("vec_id") == 0).select("embedding").first().embedding
        return self._c["hot"]

    def skew_emb(self):
        """10% of rows share ONE embedding, so every band has a hot
        bucket holding 10% of the corpus — the 100 TB hot-key hazard
        the skew-join line measures."""
        from pyspark.sql import functions as F

        if "skew_emb" not in self._c:
            self._c["skew_emb"] = self.emb().select(
                "vec_id",
                F.when(F.col("vec_id") % 10 == 0,
                       F.lit(self.hot_embedding()))
                .otherwise(F.col("embedding")).alias("embedding"),
            )
        return self._c["skew_emb"]

    def mips_parts(self):
        """(mips_aug, mips_cents, mips_q): norm-augmented corpus,
        trained centroids, augmented queries — the untimed setup of
        the mips_ivf_batch100 line."""
        from pyspark.sql import functions as F

        from lshrs_spark.operators.knn import (
            ivf_centroids_by_id,
            mips_augment,
            mips_augment_query,
        )

        if "mips" not in self._c:
            emb = self.emb()
            weighted = emb.withColumn(
                "wvec",
                F.transform(
                    F.col("embedding"),
                    lambda x: x.cast("double")
                    * (F.lit(1.0)
                       + (F.col("label") % 7).cast("double") * F.lit(0.25)),
                ),
            )
            mips_aug = mips_augment(weighted, vector_col="wvec",
                                    out_col="avec")
            mips_q = mips_augment_query(
                emb.filter(F.col("vec_id") < 100).select(
                    F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qvec"))
            )
            mips_cents = ivf_centroids_by_id(mips_aug, 16,
                                             vector_col="avec")
            self._c["mips"] = (mips_aug, mips_cents, mips_q)
        return self._c["mips"]

    def big(self):
        """The 20x-replicated, repartitioned, PERSISTED corpus the
        store-building lines run over (bench.py section 9)."""
        from pyspark.sql import functions as F

        if "big" not in self._c:
            emb = self.emb()
            big = emb
            for i in range(1, 20):
                big = big.unionByName(
                    emb.select(
                        (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                        "embedding", "label")
                )
            big = big.repartition(self.cpus).persist()
            big.count()
            self._c["big"] = big
        return self._c["big"]

    def lsh_store(self) -> str:
        """The stored 20x LSH index (written once, untimed)."""
        from lshrs_spark.operators.index import build_index, write_index

        if "lsh_store" not in self._c:
            path = self._store("index20x")
            write_index(
                build_index(self.big(), self.cfg, "vec_id", "embedding"),
                path)
            self._c["lsh_store"] = path
        return self._c["lsh_store"]

    def tivf_store(self) -> str:
        """The stored 20x matryoshka (truncated-IVF) layout."""
        from lshrs_spark.operators.knn import truncated_ivf_write_store

        if "tivf_store" not in self._c:
            path = self._store("tivf20x")
            truncated_ivf_write_store(self.big(), 64, 16, path)
            self._c["tivf_store"] = path
        return self._c["tivf_store"]

    def maint_template(self) -> str:
        """A skewed 20x IVF store TEMPLATE for the maintenance line:
        20% of rows collapse onto two embeddings, so two centroids
        each hold ~10% of the corpus (>> the 4x-mean hot rule). The
        line's reset hook re-plants a working copy from this template
        before every run (maintenance mutates the tree; rebuilding
        through Spark per rep would time the build, not the unit)."""
        from pyspark.sql import functions as F

        from lshrs_spark.operators.knn import (
            ivf_centroids_by_id,
            ivf_write_store,
        )

        if "maint_tmpl" not in self._c:
            emb = self.emb()
            hot2 = emb.filter(F.col("vec_id") == 1).select(
                "embedding").first().embedding
            skew_big = self.big().select(
                "vec_id",
                F.when(F.col("vec_id") % 10 == 0,
                       F.lit(self.hot_embedding()))
                .when(F.col("vec_id") % 10 == 1, F.lit(hot2))
                .otherwise(F.col("embedding")).alias("embedding"),
            )
            tmpl = self._store("maint20x_tmpl")
            ivf_write_store(skew_big, ivf_centroids_by_id(emb, 64), tmpl)
            self._c["maint_tmpl"] = tmpl
        return self._c["maint_tmpl"]

    def maint_store(self) -> str:
        return self._store("maint20x")


def vector_line_fns(state: BenchState) -> dict:
    """The 1x-embeddings-corpus bench lines over a :class:`BenchState`
    — name -> zero-arg callable returning the same count bench.py
    times. Definitions are THE bench definitions: change them here and
    both the bench series and the drift runner move together."""
    from pyspark.sql import functions as F

    from lshrs_spark.operators.index import build_index
    from lshrs_spark.operators.knn import (
        brute_force_topk,
        ivf_topk,
        truncated_topk,
    )
    from lshrs_spark.operators.mmr import mmr_rerank
    from lshrs_spark.operators.probe import (
        candidates,
        rerank,
        top_k,
        top_p_cutoff,
    )
    from lshrs_spark.operators.simjoin import similarity_join
    from lshrs_spark.streaming.ingest import stream_aggregate_complete

    spark = state.spark

    def run_index_build():
        # Bulk index build (S1+H1-H4+S4): signatures + explode,
        # materialized. MUST be timed before the cached probe index
        # exists: Catalyst's cache manager plan-matches an identical
        # uncached build and would silently turn this line into a
        # cache read (bench.py orders it first for the same reason).
        assert "idx" not in state._c, (
            "index_build must run before the cached probe index is "
            "built (bench ordering; run lines in LINE_ORDER)")
        return (build_index(state.emb(), state.cfg,
                            "vec_id", "embedding").count(),)

    def run_topk():
        # Batch top-k probe: 100 query vectors through one plan (Q1-Q4).
        return top_k(candidates(state.idx_cached(), state.qsigs()),
                     10).count()

    def run_topp():
        # Rerank + top-p for the same 100 queries (Q5-Q8).
        cands = candidates(state.idx_cached(), state.qsigs())
        scored = rerank(cands, state.emb(), state.qdf(),
                        query_vector_col="qvec")
        return top_p_cutoff(scored, 0.5, 10).count()

    def run_mmr():
        # Same 100-query brute shortlist as knn_full_batch100
        # (40/query) + the greedy diversification pass — the delta vs
        # knn_full_batch100 is what post-shortlist diversity costs.
        emb = state.emb()
        sl = (
            brute_force_topk(emb, state.qdf(), 40)
            .join(
                emb.select(
                    F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec"),
                ),
                "id",
            )
            .select("qid", "id", F.col("score").alias("rel"), "vec")
        )
        return (mmr_rerank(sl, k=10, lam=0.5).count(),)

    def run_mips():
        # MIPS through the cosine IVF tier: de-normalize,
        # norm-augment, probe — magnitude-aware retrieval riding the
        # existing partition pruning unchanged.
        mips_aug, mips_cents, mips_q = state.mips_parts()
        return ivf_topk(mips_aug, mips_cents, mips_q, k=10, nprobe=4,
                        vector_col="avec").count()

    return {
        "index_build": run_index_build,
        "topk_batch100": run_topk,
        # recall-knob cost on the corpus-scale path (multiprobe=2)
        "topk_batch100_mp2": lambda: top_k(
            candidates(state.idx_cached(), state.qsigs_mp()), 10).count(),
        "topp_batch100": run_topp,
        # single-query latency through the user API (driver collect)
        "single_topk": lambda: state.user_api().get_top_k(state.qv(), 10),
        "simjoin_lsh": lambda: similarity_join(
            state.emb(), state.sj_cfg, 0.4, max_bucket_size=2000,
            cache_index=True).count(),
        # Same join over the deliberately skewed corpus: AQE
        # skew-split + the max_bucket_size cap must keep this within
        # ~2x of the uniform case (the 100 TB hot-key hazard).
        "simjoin_lsh_skew": lambda: similarity_join(
            state.skew_emb(), state.sj_cfg, 0.4, max_bucket_size=2000,
            cache_index=True).count(),
        # Streaming ingest of the events stream (complete-mode agg).
        "stream_agg": lambda: stream_aggregate_complete(
            spark,
            f"{state.sf_dir}/events.parquet",
            ["event_type"],
            [F.count(F.lit(1)).alias("n")],
        ).count(),
        "mips_ivf_batch100": run_mips,
        # Matryoshka two-stage vs the same batch brute-forced at full
        # width — the coarse-probe cost win the tier exists for.
        "knn_full_batch100": lambda: brute_force_topk(
            state.emb(), state.qdf(), 10).count(),
        "knn_truncated_batch100": lambda: truncated_topk(
            state.emb(), state.qdf(), 10, coarse_dims=16,
            coarse_k=40).count(),
        "knn_mmr_batch100": run_mmr,
    }


def store_line_fns(state: BenchState) -> dict:
    """The 20x-corpus / stored-layout bench lines. Values are zero-arg
    callables except ``ivf_maintain_20x``, whose ``reset`` hook
    re-plants the mutated store from the template before EVERY run
    (excluded from timing)."""
    import shutil

    from lshrs_spark.operators.index import build_index
    from lshrs_spark.operators.knn import (
        ivf_compact,
        ivf_maintain,
        pq_adc_topk,
        truncated_topk_stored,
    )
    from lshrs_spark.operators.probe import candidates_from_path, top_k

    spark = state.spark

    def run_index_build_20x():
        # BASELINE.md's indexing target is steady-state batch
        # throughput over the 20x corpus.
        return build_index(state.big(), state.cfg,
                           "vec_id", "embedding").count()

    def run_single_stored():
        # Single query against the STORED 20x index through signature
        # predicate pushdown — the latency that stays flat as the
        # index grows (measured flat 1x -> 100x locally).
        return top_k(
            candidates_from_path(spark, state.lsh_store(), state.qv(),
                                 state.cfg), 10
        ).count()

    def plant_maint_store():
        tmpl = state.maint_template()
        store = state.maint_store()
        if os.path.isdir(store):
            shutil.rmtree(store)
        shutil.copytree(tmpl, store)

    def run_maintain():
        # ONE detect + split-both + LSM-fold cycle on the skewed
        # store; the plant guarantees exactly two hot ids.
        log = ivf_maintain(spark, state.maint_store(), ratio=4.0,
                           max_splits=2, n_splits=2)
        if len(log) != 2:
            raise RuntimeError(f"expected two splits, got {log}")
        ivf_compact(spark, state.maint_store(), min_files=8)

    def run_truncated_stored():
        # Partition-pruned coarse probe at truncated width + ONE
        # shared full-width rerank pass over the sidecar, amortized
        # across the 100-query batch.
        return truncated_topk_stored(
            spark, state.tivf_store(), state.qdf(), 10, coarse_k=40,
            nprobe=4
        ).count()

    def run_pq_query():
        # PQ compressed-scan ANN over the 20x corpus: ADC query reads
        # only (id, j, code) + an m x k distance table.
        cb, codes, qv_list = state.pq_parts()
        return pq_adc_topk(qv_list, cb, codes, 10, m=4, dim=64).count()

    return {
        "index_build_20x": run_index_build_20x,
        "single_topk_stored20x": run_single_stored,
        "ivf_maintain_20x": {"fn": run_maintain,
                             "reset": plant_maint_store},
        "knn_truncated_stored20x_batch100": run_truncated_stored,
        "ann_pq_query20x": run_pq_query,
    }


def shared_line_fns(spark, docs, sf_dir: str,
                    bm25_store: str | None = None) -> dict:
    """The re-measurable bench lines over a (persisted) ``docs``
    frame: name -> zero-arg callable returning the same count
    bench.py times. Definitions are THE bench definitions — change
    them here and both the bench series and the drift runner move
    together. ``bm25_store`` is where the bm25_index_build line
    writes (bench.py passes its fixed store so the serving section
    reads what the timed line wrote; the drift runner's default keeps
    a drift-prefixed path)."""
    from pyspark.sql import functions as F

    from lshrs_spark.cache import release_slots
    from lshrs_spark.entries import QUERIES as _ENTRY_QUERIES
    from lshrs_spark.functions import text as X
    from lshrs_spark.functions.bpe import DEFAULT_MERGES, bpe_token_counts
    from lshrs_spark.functions.sketch import heavy_hitters
    from lshrs_spark.functions.text import bm25_index_write
    from lshrs_spark.multimodal import (
        with_ppm_payload,
        with_video_payload,
        with_wav_payload,
    )
    from lshrs_spark.operators.dedup import (
        audio_fingerprint_pairs,
        image_dhash_pairs,
        minhash_band_pairs,
        simhash_table,
        substring_span_pairs,
        video_near_dup_pairs,
    )
    from lshrs_spark.operators.diff import corpus_diff
    from lshrs_spark.operators.graph import pagerank

    if bm25_store is None:
        bm25_store = os.path.join(tempfile.gettempdir(),
                                  "lshrs_drift_bm25")

    def run_substring():
        n = substring_span_pairs(docs, 32).count()
        release_slots()   # span persist slot — same hygiene as minhash
        return n

    def run_text():
        cols = X.quality_score_cols(F.col("text"))
        return docs.select(
            "doc_id",
            cols["quality"].alias("q"),
            X.language_id_col(F.col("text")).alias("lang"),
            X.fingerprint_col(F.col("text")).alias("fp"),
        ).count()

    def run_pagerank():
        pairs = minhash_band_pairs(docs, num_hashes=8, rows_per_band=2,
                                   base_hash="xxhash64")
        nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
        n = pagerank(pairs, nodes, iterations=3).count()
        # r14: pagerank's edge table is an invocation-scoped
        # localCheckpoint now (freed with the frame); release_slots()
        # stays for any upstream persist residue
        release_slots()
        return n

    vid = with_video_payload(docs, num_frames=3, width=7, height=8)
    ppm = with_ppm_payload(docs, width=7, height=8)
    wav = with_wav_payload(docs)
    v2 = docs.filter(F.col("doc_id") % 17 != 0)
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    return {
        # portable-hash (h48/md5) banding — oracle-checkable mode; the
        # xxh line below is the production-hash control (md5 enters
        # synchronized JVM digest machinery and stalls sporadically)
        "dedup_minhash": lambda: minhash_band_pairs(
            docs, num_hashes=8, rows_per_band=2).count(),
        "dedup_simhash": lambda: simhash_table(docs).count(),
        # Catalyst PPM payload -> Arrow decode + 48-bit dHash ->
        # pigeonhole Hamming-banded pair join
        "dedup_image_phash": lambda: image_dhash_pairs(
            ppm, max_hamming=6).count(),
        "dedup_audio_fp": lambda: audio_fingerprint_pairs(
            wav, max_hamming=3).count(),
        "text_bpe_counts": lambda: bpe_token_counts(
            docs, DEFAULT_MERGES).count(),
        "corpus_diff": lambda: corpus_diff(docs, v2).count(),
        "dedup_substring": run_substring,
        "text_pipeline": run_text,
        "text_hybrid_rrf": lambda: _ENTRY_QUERIES["text_hybrid_rrf"](
            spark, sf_dir).count(),
        "dedup_video_frames": lambda: video_near_dup_pairs(
            vid, min_shared_frames=1, max_hash_freq=50).count(),
        "graph_pagerank": run_pagerank,
        "dedup_minhash_xxh": lambda: minhash_band_pairs(
            docs, num_hashes=8, rows_per_band=2,
            base_hash="xxhash64").count(),
        "text_heavy_hitters": lambda: heavy_hitters(tok, "token",
                                                    100).count(),
        # BM25 postings store build (bucketed layout, stats sidecar).
        "bm25_index_build": lambda: bm25_index_write(
            docs, bm25_store, num_buckets=32),
    }
