#!/usr/bin/env python
"""Isolated fresh-JVM re-measure of flagged bench lines (drift protocol).

The repo's perf-drift protocol (README "Round-over-round line deltas are
judged against ISOLATED quiet-host re-measures") needs a reusable
runner: the driver's bench file rides a virtualized host right after
thirty Spark-heavy lines, so any flagged delta is re-measured here —
fresh JVM, recorded quiet-host guard, one warm-up then min-of-REPS
(default 5), line definitions IMPORTED from tools/bench_lines.py (the
same module bench.py times, so the A/B can never silently diverge from
the series it judges).

Round-12 (VERDICT r11 #1): covers the knn / mips / stream / store /
bm25-build sections too. Store-building setup (the 20x corpus, stored
layouts) is shared with bench.py through tools.bench_lines.BenchState
and built lazily — only the sections the requested lines touch are
paid for, in the excluded warm-up. Stores are written under a
``lshrs_drift_`` prefix so an A/B run never clobbers the
``lshrs_bench_`` stores tools/serving_probe.py replays against.
Served-latency lines (p95s) are NOT here by design: serving is
JVM-free, and tools/serving_probe.py IS their isolated re-measure.

TWO-PASS PROTOCOL (default --passes 2, VERDICT r11 #5): the whole
requested line sequence is timed twice inside the one JVM. This host
shows multi-second stall windows that MIGRATE between queries — r11's
first A/B pass read dedup_minhash_xxh reps climbing 1.70 -> 5.38 s on
identical code within one fresh JVM while a second pass flat-repped at
1.48 s. A stall window must hit the SAME line in BOTH passes to
corrupt the reported min; per-pass runs are recorded so that failure
mode stays visible.

Usage:
    python tools/drift_ab.py [--reps 5] [--passes 2] [--out F.json] [line ...]

With no line names, runs the round-12 flagged set (VERDICT r11 wrong
#1 + #2's movers). Lines always execute in tools.bench_lines.LINE_ORDER
(bench.py's own order) regardless of CLI order — cache state during a
line's reps must match the bench series (e.g. index_build before the
probe index is cached).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_lines import (  # noqa: E402
    DOC_LINES,
    LINE_ORDER,
    PRE_CACHE_LINES,
    STORE_LINES,
    VECTOR_LINES,
    quiet_guard,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

R11_FLAGGED = [
    "dedup_substring",
    "text_pipeline",
    "text_hybrid_rrf",
    "dedup_video_frames",
    "graph_pagerank",
    "dedup_minhash_xxh",
    "text_heavy_hitters",
]

# The r11 driver-file movers (VERDICT r11 wrong #1 / wrong #2): every
# bench line the judge flagged that is not a served p95 (those re-measure
# through tools/serving_probe.py).
R12_FLAGGED = [
    "index_build",
    "topp_batch100",
    "simjoin_lsh_skew",
    "stream_agg",
    "mips_ivf_batch100",
    "knn_full_batch100",
    "knn_truncated_batch100",
    "knn_mmr_batch100",
    "bm25_index_build",
    "index_build_20x",
    "single_topk_stored20x",
    "ivf_maintain_20x",
    "knn_truncated_stored20x_batch100",
]


def build_line_fns(spark, names: list[str]):
    """Assemble {name: line} for the requested names, building only the
    setup their sections need. A line is a zero-arg callable or a
    {"fn", "reset"} dict (see tools.bench_lines).

    Returns ``(fns, materialize_before)``: bench-parity residency
    (ADVICE r12) says a line must be timed with exactly the
    store-section state bench.py has resident at that line's OWN
    timing point — the pieces belonging to store lines EARLIER in
    LINE_ORDER (so e.g. ``drift_ab.py mips_ivf_batch100`` gets the
    full 20x corpus + stored layouts, while ``single_topk_stored20x``
    alone gets only the 20x corpus; a line's own pieces build in its
    excluded warm-up, as in bench). Call ``materialize_before(name)``
    right before timing ``name`` — building everything up front would
    tilt the other direction (a first r13 draft did: the PRE-store
    lines index_build/topp/stream_agg would have been timed with 20x
    blocks resident that bench.py never has at their timing points)."""
    from tools.bench_lines import (
        BenchState,
        bench_docs,
        shared_line_fns,
        store_line_fns,
        vector_line_fns,
    )

    want = set(names)
    store_start = LINE_ORDER.index(STORE_LINES[0])
    needs_store_residency = any(
        LINE_ORDER.index(n) >= store_start for n in names
    )
    fns: dict = {}
    state = None
    if want & set(DOC_LINES):
        docs = bench_docs(spark, SF_DIR, CPUS)
        docs.persist().count()   # warmed BEFORE any timing (bench parity)
        fns.update(shared_line_fns(spark, docs, SF_DIR))
    if want & (set(VECTOR_LINES) | set(STORE_LINES)) or needs_store_residency:
        state = BenchState(spark, SF_DIR, CPUS, store_prefix="lshrs_drift_")
        fns.update(vector_line_fns(state))
        if want & set(STORE_LINES):
            fns.update(store_line_fns(state))

    # store pieces in bench.py's own build order, keyed by the line
    # whose (untimed) setup/warm-up creates each piece; BenchState
    # memoizes, so repeat calls are free
    piece_order = [
        ("index_build_20x", lambda: state.big()),
        ("single_topk_stored20x", lambda: state.lsh_store()),
        ("ivf_maintain_20x", lambda: state.maint_template()),
        ("knn_truncated_stored20x_batch100", lambda: state.tivf_store()),
        ("ann_pq_query20x", lambda: state.pq_parts()),
    ]

    def materialize_before(name: str) -> None:
        if state is None:
            return
        idx = LINE_ORDER.index(name)
        for line, build in piece_order:
            if LINE_ORDER.index(line) < idx:
                build()

    return fns, materialize_before


def time_line(fn, reps: int, *, reset=None, warmup: bool = True) -> list:
    """One warm-up (excluded) + ``reps`` timed runs; ``reset`` (store
    re-plant for maintenance lines) runs before EVERY run, excluded."""
    if warmup:
        if reset is not None:
            reset()
        fn()
    times = []
    for _ in range(reps):
        if reset is not None:
            reset()
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return times


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    passes = 2
    out_path = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps_s = next(it, None)
            # isdigit alone let --reps 0 through, which paid JVM
            # startup and the warm-up run before crashing on min([])
            # of an empty times list (ADVICE r11)
            if reps_s is None or not reps_s.isdigit() or int(reps_s) < 1:
                sys.exit("--reps needs a positive integer argument")
            reps = int(reps_s)
        elif a == "--passes":
            p_s = next(it, None)
            if p_s is None or not p_s.isdigit() or int(p_s) < 1:
                sys.exit("--passes needs a positive integer argument")
            passes = int(p_s)
        elif a == "--out":
            out_path = next(it, None)
            if out_path is None:
                sys.exit("--out needs a file path argument")
        else:
            names.append(a)
    names = names or R12_FLAGGED
    # fail fast on a typo'd line name BEFORE paying JVM startup
    known = set(LINE_ORDER)
    unknown = [n for n in names if n not in known]
    if unknown:
        sys.exit(f"unknown bench line(s) {unknown}; known: {sorted(known)}")
    # canonical bench order, whatever order the CLI gave
    names = [n for n in LINE_ORDER if n in set(names)]

    # start guard carries the page-cache canary over the corpus the
    # run reads (VERDICT r13 missing #1)
    guard = quiet_guard(CPUS, io_paths=[SF_DIR])
    from lshrs_spark.cache import release_slots
    from lshrs_spark.session import get_spark

    spark = get_spark("drift_ab", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    fns, materialize_before = build_line_fns(spark, names)
    results: dict[str, dict] = {
        n: {"min": None, "passes": [], "ok_passes": [], "errors": []}
        for n in names
    }
    for p in range(passes):
        for name in names:
            if p > 0 and name in PRE_CACHE_LINES:
                # only pass 1 times these: the cached probe index now
                # exists, and a re-measure would time a cache read
                continue
            line = fns[name]
            fn = line["fn"] if isinstance(line, dict) else line
            reset = line.get("reset") if isinstance(line, dict) else None
            # bench-parity residency at THIS line's timing point
            # (memoized — free after the first build)
            materialize_before(name)
            r = results[name]
            # Warm-up on the first pass only — pass 2 exists to catch a
            # stall window, not to re-pay JIT — UNLESS every prior pass
            # of this line failed (possibly before its warm-up ever
            # completed): the first retry after a failed pass re-warms
            # so its min can never include first-compile cost
            # (ADVICE r12).
            warm = p == 0 or not r["ok_passes"]
            try:
                times = time_line(fn, reps, reset=reset, warmup=warm)
            except Exception as exc:  # noqa: BLE001
                # one broken line must not lose the other lines' 20
                # minutes of measurement: record the failure in the
                # artifact and keep going (an A/B run of this runner's
                # own first draft crashed on pass 2 and lost a full
                # pass-1 sweep — exit code stays nonzero below).
                # Per-pass error tags + ok_passes make a partial line
                # unambiguous: min came from the passes listed there.
                r["errors"].append(
                    f"pass{p + 1}: {type(exc).__name__}: {exc}")
                print(f"AB pass{p + 1} {name} ERROR {exc}", flush=True)
                release_slots()
                continue
            # per-line slot hygiene between lines (bench releases at
            # section boundaries; reps within a line never release —
            # exactly like bench)
            release_slots()
            r["passes"].append([round(t, 3) for t in times])
            r["ok_passes"].append(p + 1)
            m = min(times)
            r["min"] = round(m if r["min"] is None else min(r["min"], m), 3)
            print(f"AB pass{p + 1} {name} min={m:.3f} "
                  f"runs={[round(t, 3) for t in times]}", flush=True)
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": reps,
               "passes": passes, "guard": guard, "results": results}
    print("ABJSON " + json.dumps(payload), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    failed = sorted(n for n, r in results.items() if r["errors"])
    if failed:
        # the artifact is written (partial evidence beats none) but the
        # run itself must not read as a clean settlement; lines that
        # recovered in a later pass are named so the partial evidence
        # is legible without opening the artifact
        partial = [n for n in failed if results[n]["ok_passes"]]
        sys.exit(f"lines with failed passes: {failed}"
                 f" (recovered in a later pass: {partial or 'none'})"
                 " — artifact written, exit nonzero")


if __name__ == "__main__":
    main()
