"""Plan-shape regression tests: the properties that matter at 100 TB are
asserted here so they can't silently disappear — single UDF evaluation,
broadcast probe join (index side never shuffled pre-join), partial
aggregation, column-pruned scans, filter pushdown."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark import LSHConfig
from lshrs_spark.operators.index import build_index
from lshrs_spark.operators.probe import candidates, query_signatures_df, top_k
from lshrs_spark.plans.inspect import physical_plan, plan_report

CFG = LSHConfig(dim=64, num_perm=32, num_bands=4, rows_per_band=8, seed=42)
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_index_build_evaluates_udf_once(spark, emb):
    """The signature matmul must not be duplicated by a generate-time
    filter (posexplode_outer keeps Catalyst from cloning the UDF)."""
    idx = build_index(emb, CFG, "vec_id", "embedding")
    simple = spark._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "simple"
    )
    assert simple.count("ArrowEvalPython") == 1
    assert "Exchange" not in simple  # shuffle-free map-side build


def test_index_scan_prunes_columns(emb):
    idx = build_index(emb, CFG, "vec_id", "embedding")
    r = plan_report(idx)
    assert any(
        "vec_id" in s and "embedding" in s and "label" not in s
        for s in r["read_schemas"]
    ), r["read_schemas"]


def test_probe_broadcasts_query_side(spark, emb):
    idx = build_index(emb, CFG, "vec_id", "embedding")
    qv = np.array(emb.filter("vec_id=0").first().embedding, dtype=np.float32)
    qs = query_signatures_df(spark, qv, CFG, qids=[0])
    r = plan_report(top_k(candidates(idx, qs), 10))
    assert r["has_broadcast_join"]
    assert not r["has_sortmerge_join"]
    assert r["partial_aggregate"]


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 7).select("l_orderkey", "l_quantity")
    r = plan_report(q)
    assert any("l_orderkey" in s for s in r["pushed_filters"]), r["pushed_filters"]
    assert any(
        "l_quantity" in s and "l_extendedprice" not in s for s in r["read_schemas"]
    )


def test_ivf_stored_scan_is_partition_pruned(spark, emb, tmp_path):
    """The stored-IVF probe must prune non-probed centroid partitions at
    the scan (PartitionFilters), not filter post-read."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_topk_stored,
        ivf_write_store,
    )

    cents = ivf_centroids_by_id(emb, 8)
    store = str(tmp_path / "ivf_store")
    ivf_write_store(emb, cents, store)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivf_topk_stored(spark, store, cents, queries, k=5, nprobe=2)
    plan = physical_plan(out)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines, "stored scan has no PartitionFilters section"
    assert any("centroid_id" in l and "IN" in l.upper() for l in part_lines), part_lines
    # correctness too: equals the in-memory IVF result
    from lshrs_spark.operators.knn import ivf_topk

    mem = ivf_topk(emb, cents, queries, k=5, nprobe=2)
    assert sorted((r.qid, r.id, r.rank) for r in out.collect()) == sorted(
        (r.qid, r.id, r.rank) for r in mem.collect()
    )


def test_interval_join_bucketed_is_equijoin(spark):
    """Bucketized interval join must plan as a hash equi-join on
    (keys, bucket) — not BroadcastNestedLoop/Cartesian, which is the
    O(points x intervals) shape it exists to avoid."""
    import datetime as dt

    from lshrs_spark.operators.ranges import interval_join

    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, i % 3, t0 + dt.timedelta(seconds=i)) for i in range(100)],
        "pid long, k long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(j, j % 3, t0 + dt.timedelta(seconds=10 * j),
          t0 + dt.timedelta(seconds=10 * j + 30)) for j in range(10)],
        "iid long, k long, start timestamp, end timestamp",
    )
    plan = physical_plan(interval_join(pts, ivs, ["k"], bucket_seconds=60))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_probe_strategy_cost_rule_both_regimes(spark, emb):
    """VERDICT r5 #7: the driver-side cost rule picks broadcast for
    interactive batches (index never shuffled) and shuffle for
    corpus-scale probe sides (co-partition instead of shipping a
    near-index-size broadcast to every task) — both regimes' plans
    asserted, results identical."""
    from lshrs_spark.operators.probe import (
        candidates,
        choose_probe_strategy,
        query_signatures_df,
    )

    # the rule: absolute cap and index-relative cap
    assert choose_probe_strategy(100, 4) == "broadcast"
    assert choose_probe_strategy(1_000_000, 4) == "shuffle"
    assert choose_probe_strategy(250_000, 4) == "broadcast"  # == cap: keep
    assert choose_probe_strategy(100, 4, index_rows=1_000) == "shuffle"
    assert choose_probe_strategy(100, 4, index_rows=1_000_000) == "broadcast"
    with pytest.raises(ValueError):
        candidates(None, None, strategy="bogus")

    idx = build_index(emb, CFG, "vec_id", "embedding")
    rng = np.random.default_rng(5)
    qvecs = rng.standard_normal((5, 64)).astype("float32")
    qs = query_signatures_df(spark, qvecs, CFG)
    bplan = physical_plan(candidates(idx, qs, strategy="broadcast"))
    assert "BroadcastHashJoin" in bplan, bplan
    splan = physical_plan(candidates(idx, qs, strategy="shuffle"))
    assert "ShuffledHashJoin" in splan or "SortMergeJoin" in splan, splan
    assert "BroadcastHashJoin" not in splan, splan
    rows = lambda df: sorted(
        (r.qid, r.id, r.collisions) for r in df.collect()
    )
    assert rows(candidates(idx, qs, strategy="broadcast")) == rows(
        candidates(idx, qs, strategy="shuffle")
    )


def test_plan_row_estimate_vector_row_width(spark, tmp_path):
    """The free Catalyst row estimate must be told the real row width
    for vector schemas: schema defaultSize counts ONE array element
    (12 B for (long, array<float>)), which would inflate parquet-backed
    query-batch estimates ~dim/3x and flip the cost rule into the
    shuffle regime far too early."""
    import pandas as pd

    from lshrs_spark.core import _plan_row_estimate

    n, dim = 2000, 64
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "qid": np.arange(n, dtype=np.int64),
            "qvec": list(rng.standard_normal((n, dim)).astype(np.float32)),
        }
    )
    path = str(tmp_path / "q.parquet")
    spark.createDataFrame(pdf, "qid long, qvec array<float>").write.parquet(
        path
    )
    df = spark.read.parquet(path)
    est = _plan_row_estimate(df, row_width=8 + 4 * dim)
    assert est is not None
    # right ballpark: within 4x of truth, NOT inflated ~16x
    assert n / 4 <= est <= 4 * n, est
    inflated = _plan_row_estimate(df)
    assert inflated is None or inflated > est


def test_window_running_single_window_exchange(spark):
    """All three window specs in rel_window_running share one
    (partitionBy, orderBy) -> Catalyst must plan a single Window node
    over a single hash exchange on o_custkey."""
    from lshrs_spark.entries import QUERIES

    df = QUERIES["rel_window_running"](spark, SF)
    simple = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert simple.count("Window") == 1, simple
    assert simple.count("Exchange") == 1, simple


def test_gapfill_grid_sides_broadcast(spark):
    """The dense (day x type) grid is tiny; the left join against the
    aggregated counts must broadcast, never sort-merge."""
    from lshrs_spark.entries import QUERIES

    r = plan_report(QUERIES["rel_gapfill_daily"](spark, SF))
    assert r["has_broadcast_join"]
    assert not r["has_sortmerge_join"]


def test_ntile_quartiles_cover_all_customers(spark):
    from lshrs_spark.entries import QUERIES

    out = QUERIES["rel_ntile_quartiles"](spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n for r in out) == n_cust
    for row in out:
        assert 1 <= row.quartile <= 4
        assert row.lo_cents <= row.hi_cents


def test_salted_agg_two_stage_exchanges(spark):
    """Salted aggregation must plan exactly two hash exchanges: one on
    (key, salt), one on key — each with map-side partial aggregation."""
    from lshrs_spark.entries import QUERIES

    df = QUERIES["rel_salted_agg"](spark, SF)
    simple = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert simple.count("Exchange") == 2, simple
    assert "partial_" in simple


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """Pre-bucketing both sides on the join key must remove the shuffle
    entirely — the layout that makes repeated 100 TB fact-fact joins
    affordable. Both tables bucketed 8 ways on their orderkey; the
    sort-merge join plan must contain zero Exchange nodes."""
    d = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(d / "o")).mode("overwrite").saveAsTable("bt_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(d / "l")).mode("overwrite").saveAsTable("bt_li"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_orders").join(
            spark.table("bt_li"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("qty"))
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan, plan
        # the only exchange allowed is the final groupBy on o_custkey
        assert plan.count("Exchange") <= 1, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_li")


def test_scalar_subquery_decorrelates_to_joins(spark):
    """Catalyst must rewrite the correlated subqueries into aggregate
    joins — no per-row nested-loop execution."""
    from lshrs_spark.entries import QUERIES

    plan = physical_plan(QUERIES["rel_scalar_subquery"](spark, SF))
    assert "CartesianProduct" not in plan, plan


def test_decontamination_broadcasts_benchmark(spark):
    """The benchmark gram set must reach the corpus side as a broadcast
    — a shuffled join here would move every corpus gram at 100 TB."""
    from lshrs_spark.entries import QUERIES

    plan = physical_plan(QUERIES["text_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_group_representatives_no_window_sort(spark):
    """Representative selection is one max_by aggregation — a window
    row_number plan would sort every group's rows."""
    from lshrs_spark.operators.dedup import group_representatives

    comps = spark.createDataFrame(
        [(i, i % 10) for i in range(100)], "id long, component long"
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(group_representatives(comps, docs))
    assert "Window" not in plan, plan
    # tree-only node count ("formatted" repeats each node in the detail
    # section): broadcast of the small side + the component-key shuffle
    assert plan.count("Exchange (") <= 3, plan


def test_unigram_logprob_vocab_broadcast_is_optional(spark):
    """The vocabulary table grows with the corpus; at 100 TB the
    broadcast hint is an OOM, so it must be opt-out. Pin
    autoBroadcastJoinThreshold=-1 to stand in for at-scale size
    estimates: disabled, the token-frequency join must NOT plan as a
    BroadcastHashJoin (Catalyst picks sort-merge, as it would for a
    web-scale vocabulary); enabled, the hint must force one anyway."""
    from lshrs_spark.functions.text import unigram_logprob
    from lshrs_spark.streaming.ingest import scoped_session_conf

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with scoped_session_conf(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        plan_off = physical_plan(unigram_logprob(docs, broadcast_vocab=False))
        assert "BroadcastHashJoin" not in plan_off, plan_off
        plan_on = physical_plan(unigram_logprob(docs, broadcast_vocab=True))
        assert "BroadcastHashJoin" in plan_on, plan_on


def test_pii_scrub_is_pure_codegen(spark):
    """The PII scrub must stay JVM-side: no Python evaluation, no
    exchange — it is a per-row projection."""
    from lshrs_spark.functions.text import pii_cols

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cols = pii_cols(F.col("text"))
    plan = physical_plan(
        docs.select("doc_id", cols["n_emails"], cols["redacted"])
    )
    assert "Python" not in plan, plan
    assert "Exchange" not in plan, plan


def test_bigram_logprob_hand_computed(spark):
    """Stupid-backoff bigram scoring against a hand-computed corpus:
    seen bigrams use cb/c_prev, unseen back off to alpha * cu / total;
    single-token docs emit no row. Broadcast hint opt-out like
    unigram."""
    import math

    from lshrs_spark.functions.text import bigram_logprob
    from lshrs_spark.streaming.ingest import scoped_session_conf

    # corpus: "a b a b" (1), "a b" (2), "b z" (3), "q" (4)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "b z"), (4, "q")],
        "doc_id long, text string",
    )
    got = {r.id: (r.avg_neg_logprob, r.n_bigrams)
           for r in bigram_logprob(docs).collect()}
    # unigrams: a=3, b=4, z=1, q=1, total=9
    # bigrams: (a,b)=3, (b,a)=1, (b,z)=1
    p_ab = 3 / 3          # cb(a,b)=3 / cu(a)=3
    p_ba = 1 / 4
    p_bz = 1 / 4
    d1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    assert got[1] == (round(d1, 5), 3)
    assert got[2] == (round(-math.log(p_ab), 5), 1)
    assert got[3] == (round(-math.log(p_bz), 5), 1)
    assert 4 not in got                       # no bigram positions
    with scoped_session_conf(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        plan = physical_plan(bigram_logprob(docs, broadcast_vocab=False))
        assert "BroadcastHashJoin" not in plan.replace(
            "BroadcastNestedLoopJoin", ""
        ), plan


def test_ivfpq_stored_scan_is_partition_pruned(spark, emb, tmp_path):
    """The IVFADC code-table scan must prune non-probed centroid
    partitions (PartitionFilters) and read only (id, codes) — bytes per
    document, no embedding column."""
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivfpq_topk_stored,
        ivfpq_write_store,
        pq_codebooks,
    )

    cents = ivf_centroids_by_id(emb, 8)
    cb = pq_codebooks(emb, m=4, k=8, dim=64, iterations=1)
    store = str(tmp_path / "ivfpq_store")
    ivfpq_write_store(emb, cents, cb, store, m=4, dim=64)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first().embedding]
    out = ivfpq_topk_stored(spark, store, cents, cb, qv, 5, 2, m=4, dim=64)
    plan = physical_plan(out)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines, "code-table scan has no PartitionFilters section"
    assert any("centroid_id" in l and "IN" in l.upper() for l in part_lines)
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("codes" in l and "embedding" not in l for l in schemas), schemas


def test_corpus_diff_shuffles_hashes_not_payloads(spark):
    """The snapshot diff must project each side down to (id, hash)
    BEFORE the full-outer join — document text crossing the exchange
    would turn a 100 TB diff into a 100 TB shuffle."""
    from lshrs_spark.operators.diff import corpus_diff

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(corpus_diff(docs, docs))
    join_lines = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert join_lines, plan
    # join keys are the ids alone; hash columns ride as 8-byte payload
    assert all("text#" not in ln for ln in join_lines)
    # the exchanges (one per side) carry only id + hash: in formatted
    # output each "(n) Exchange" node's columns are on its Input line
    import re as _re

    lines = plan.splitlines()
    ex_inputs = [
        lines[i + 1]
        for i, ln in enumerate(lines)
        if _re.match(r"\(\d+\) Exchange", ln) and i + 1 < len(lines)
    ]
    assert ex_inputs and all("text#" not in ln for ln in ex_inputs)


def test_cms_build_partial_aggregates_before_shuffle(spark):
    """The sketch's sum aggregation must map-side combine: the exchange
    then carries at most depth*width cells per partition, independent of
    input row count."""
    from lshrs_spark.functions.sketch import cms_build

    ev = spark.read.parquet(f"{SF}/events.parquet")
    import re as _re

    r = plan_report(cms_build(ev, "user_id", 512, 3))
    assert r["partial_aggregate"]
    # exactly one exchange node (formatted plans print each node twice —
    # tree summary + "(n) Exchange" detail header; count the headers)
    assert len(_re.findall(r"\(\d+\) Exchange", r["plan"])) == 1


def test_clean_text_is_pure_codegen(spark):
    """Cleanup runs in the scan's project — zero exchanges, no Python."""
    from lshrs_spark.functions.text import clean_text_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(docs.select(clean_text_col(F.col("text"))))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_negative_samples_no_allpairs_join(spark):
    """The docstring promises no all-pairs join — hold it to that: no
    cartesian/nested-loop node anywhere in the plan."""
    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.export import negative_samples

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(negative_samples(docs, 2))
    release_slots()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_budget_no_single_partition_exchange(spark):
    """The cumulative count must come from the two-stage prefix sum —
    a SinglePartition exchange would be the 100 TB bottleneck the
    operator exists to avoid."""
    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.prefix import token_budget_select

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.col("n_chars").alias("quality"),
        F.col("n_chars").alias("n_tokens"),
    )
    plan = physical_plan(token_budget_select(docs, 1000))
    release_slots()
    assert "SinglePartition" not in plan


def test_bm25_topk_is_heap_not_global_sort(spark):
    """BM25 retrieval must end in TakeOrderedAndProject (per-partition
    heaps + driver merge of k-row heads) — a global Sort before the
    LIMIT would shuffle the whole scored corpus at 100 TB. The corpus
    constants must reach the scorer as a broadcast, not a sort-merge."""
    import re

    from lshrs_spark.entries import QUERIES

    df = QUERIES["text_bm25_topk"](spark, SF)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert not re.findall(r"\(\d+\) Sort\b", plan), "global sort crept in"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_broadcasts_all_dims(spark):
    """Fact-to-dims star join (customer -> nation -> region + orders):
    every dimension table must reach the fact scan as a broadcast — a
    sort-merge against a 5-row dims table at 100 TB would shuffle the
    entire fact side for nothing."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    r = spark.read.parquet(f"{SF}/region.parquet")
    q = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("cents"))
    )
    rep = plan_report(q)
    assert rep["has_broadcast_join"]
    assert not rep["has_sortmerge_join"], "a dim fell back to sort-merge"
    assert rep["partial_aggregate"]


def test_hygiene_cascade_single_scan_single_agg(spark):
    """The whole five-rule attrition funnel must cost ONE scan of the
    corpus and one aggregation — rule count must not multiply passes."""
    import re

    from lshrs_spark.entries import QUERIES

    plan = physical_plan(QUERIES["pipeline_hygiene_cascade"](spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    # one partial + one final hash aggregate pair, single exchange
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE must split the hot partition of a skewed sort-merge join at
    RUNTIME (SortMergeJoin(skew=true) + 'AQEShuffleRead … skewed' in the
    final adaptive plan). forceOptimizeSkewedJoin is needed here because
    the downstream hash aggregation imposes a distribution requirement
    that the split would violate without an extra shuffle — the
    documented Spark tradeoff our salting operators exist to avoid
    statically."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"))
        rows = {r.k: r.n for r in j.collect()}  # executes THIS plan
        assert rows[0] == 360_000  # hot key correct despite the split
        final = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "skew=true" in final, final
        assert "skewed" in final  # AQEShuffleRead skew-split read
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_image_dhash_pairs_banded_no_cartesian(spark):
    """The image near-dup join must stay a (blk, val) equi-join — a
    cartesian/broadcast-nested-loop product over payloads would be the
    100 TB catastrophe this operator exists to avoid."""
    from lshrs_spark.multimodal import with_ppm_payload
    from lshrs_spark.operators.dedup import image_dhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = image_dhash_pairs(
        with_ppm_payload(docs, width=7, height=8), max_hamming=6
    )
    plan = physical_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the self-join key is the band tuple, never a payload column
    assert "blk" in plan and "val" in plan
    pairs.count()  # and it executes


def test_audio_video_dedup_plans_are_equijoins(spark):
    """The new multimodal dedup members keep the battery's plan
    contract: banded/hash-value equi-joins, never a cartesian or
    payload-keyed join."""
    from lshrs_spark.multimodal import with_video_payload, with_wav_payload
    from lshrs_spark.operators.dedup import (
        audio_fingerprint_pairs,
        video_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ap = audio_fingerprint_pairs(with_wav_payload(docs), max_hamming=3)
    plan = physical_plan(ap)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "blk" in plan and "val" in plan      # pigeonhole band key
    ap.count()
    vp = video_near_dup_pairs(
        with_video_payload(docs, num_frames=3, width=7, height=8),
        max_hash_freq=50,
    )
    plan = physical_plan(vp)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "dhash" in plan                      # hash-value join key
    vp.count()


def test_phrase_search_is_equijoin_on_postings(spark):
    """Phrase intersection must be an (id, pos) equi-join over the
    token-filtered postings — never a cartesian over documents."""
    from lshrs_spark.functions.text import phrase_search, token_postings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = phrase_search(token_postings(docs), ["key", "scan"])
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    out.count()


def test_phrase_search_intersects_rarest_token_first(spark):
    """VERDICT r5 #1: the intersection schedule must start from the
    RAREST token so the first intermediate is its posting list, not a
    stop word's — and a reordered schedule returns exactly the
    phrase-order results (position shifts commute)."""
    from lshrs_spark.functions.text import (
        _phrase_term_order,
        phrase_search,
        token_postings,
    )

    rows = [(i, "the filler the padding the noise") for i in range(40)]
    rows += [(100, "the quick brown fox"), (101, "a quick brown dog"),
             (102, "the slow brown fox the quick step")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = token_postings(docs)

    # schedule: fox(2) quick(3) brown(3) the(42); ties keep phrase order
    order = _phrase_term_order(postings, ["the", "quick", "brown", "fox"])
    assert [tok for _, tok in order] == ["fox", "quick", "brown", "the"]
    assert [i for i, _ in order] == [3, 1, 2, 0]
    # a token absent from the corpus sorts first → empty short-circuit
    order2 = _phrase_term_order(postings, ["the", "zzzmissing"])
    assert order2[0] == (1, "zzzmissing")

    got = {
        r.id: r.n_matches
        for r in phrase_search(
            postings, ["the", "quick", "brown", "fox"]
        ).collect()
    }
    assert got == {100: 1}
    assert {
        r.id: r.n_matches
        for r in phrase_search(postings, ["the", "quick"]).collect()
    } == {100: 1, 102: 1}
    # duplicate tokens keep their per-occurrence shifts after reorder
    dup = spark.createDataFrame(
        [(1, "go stop go"), (2, "go go stop")], "doc_id long, text string"
    )
    assert {
        r.id: r.n_matches
        for r in phrase_search(
            token_postings(dup), ["go", "stop", "go"]
        ).collect()
    } == {1: 1}


def test_semantic_decontaminate_broadcasts_bench_side(spark):
    """The benchmark side must broadcast (one corpus scan, no shuffle
    of the corpus before scoring) — the plan that survives 100 TB."""
    import sys

    sys.path.insert(0, "/root/repo")
    import lshrs_spark.entries as entries

    out = entries.QUERIES["emb_semantic_decontaminate"](spark, SF)
    plan = physical_plan(out)
    assert "BroadcastNestedLoopJoin" in plan   # tiny bench side broadcast
    assert out.count() > 0


def test_bm25_postings_read_prunes_to_one_bucket(spark, tmp_path):
    """A query term's posting read must touch only its own bucket=N/
    directory — the directory-pruning contract of the layout."""
    from lshrs_spark.functions.text import bm25_index_write, h48_py
    from lshrs_spark.serving import BM25Server

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    store = str(tmp_path / "bm25_prune")
    bm25_index_write(docs, store, num_buckets=16)
    srv = BM25Server(store)
    import pyarrow.dataset as pads

    b = h48_py("table") % 16
    frags = list(srv._ds.get_fragments(
        filter=(pads.field("bucket") == b) & (pads.field("tok") == "table")
    ))
    assert frags and all(f"bucket={b}/" in f.path for f in frags)


def test_mips_topk_broadcasts_queries_single_corpus_scan(spark, emb):
    """The exact-MIPS baseline keeps brute_force_topk's plan contract
    (r14 Arrow-kernel form): the query batch ships to every task inside
    the MapInArrow closure (the broadcast's cost class — no join node
    at all), the corpus is scanned ONCE whatever the batch size, and
    the kernel's partition-local top-k leaves a single bounded
    exchange before the final per-query window."""
    from lshrs_spark.operators.knn import mips_topk

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = mips_topk(emb, q, 5)
    plan = physical_plan(out)
    # scoring + partition-local top-k run in ONE Arrow kernel pass
    assert "MapInArrow" in plan
    # one corpus scan, no join of any kind (the query batch rides the
    # kernel closure; formatted plans list each scan twice: tree+detail)
    assert plan.count("Location: InMemoryFileIndex") <= 2
    assert "Join" not in plan
    # exactly one exchange: the bounded survivor set's per-query window
    assert plan.count("+- Exchange") == 1
    assert out.count() == 15


def test_build_index_multiprobe_emits_perturbation_keys(spark, emb):
    """VERDICT r6 #4: the DataFrame signature path emits the T
    perturbation keys inside the SAME Arrow UDF — (1+T)*bands probe
    rows per vector, one ArrowEvalPython node, and the key set equals
    the driver-side multiprobe_keys_local + exact signatures."""
    from lshrs_spark.hashing import (
        hash_vectors_local_long,
        multiprobe_keys_local,
    )

    sub = emb.filter(F.col("vec_id") < 20)
    T_ = 2
    idx = build_index(sub, CFG, "vec_id", "embedding", multiprobe=T_)
    simple = spark._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "simple"
    )
    assert simple.count("ArrowEvalPython") == 1
    assert "Exchange" not in simple

    rows = idx.collect()
    per_id: dict = {}
    for r in rows:
        per_id.setdefault(r.id, set()).add((r.band, r.sig))
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float32)
            for r in sub.collect()}
    for vid, got in per_id.items():
        assert len([r for r in rows if r.id == vid]) == (1 + T_) * CFG.num_bands
        v = vecs[vid][None, :]
        exact = {(b, int(s)) for b, s in
                 enumerate(hash_vectors_local_long(v, CFG)[0])}
        extra = {(b, s) for b, s in multiprobe_keys_local(v, CFG, T_)[0]}
        assert got == exact | extra


def test_query_batch_auto_strategy_from_cached_stats(spark, emb):
    """VERDICT r6 #7: with stats() cached on the instance and a
    corpus-sized query DataFrame, query_batch picks the shuffle regime
    with NO caller hints; a small interactive batch stays broadcast."""
    from lshrs_spark import LSHRS

    lsh = LSHRS(spark, 64, num_perm=32, num_bands=4, rows_per_band=8)
    lsh.index_dataframe(emb, "vec_id", "embedding")
    lsh.stats()                                   # caches index row count
    assert lsh._index_rows == emb.count() * 4

    # corpus-sized query side (the whole table): plan stats estimate a
    # probe side > 10% of the index -> co-partition, don't broadcast
    qall = emb.select(F.col("vec_id").alias("qid"),
                      F.col("embedding").alias("qvec"))
    plan_all = physical_plan(lsh.query_batch(qall, top_k=5))
    assert "ShuffledHashJoin" in plan_all or "SortMergeJoin" in plan_all, plan_all

    # interactive batch: tiny local relation -> broadcast regime
    import numpy as _np

    rng = _np.random.default_rng(3)
    qsmall = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(3)],
        "qid long, qvec array<float>",
    )
    plan_small = physical_plan(lsh.query_batch(qsmall, top_k=5))
    assert "BroadcastHashJoin" in plan_small, plan_small


def test_query_batch_multiprobe_matches_per_query_api(spark, emb):
    """query_batch(multiprobe=T) == get_top_k(v, multiprobe=T) for every
    query — the DataFrame batch path now carries the recall knob."""
    from lshrs_spark import LSHRS

    lsh = LSHRS(spark, 64, num_perm=32, num_bands=4, rows_per_band=8)
    lsh.index_dataframe(emb, "vec_id", "embedding")
    qdf = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in lsh.query_batch(qdf, top_k=5, multiprobe=2).collect():
        got.setdefault(r.qid, []).append((r.rank, r.id))
    qvecs = {r.vec_id: np.array(r.embedding, dtype=np.float32)
             for r in emb.filter(F.col("vec_id") < 8).collect()}
    for qid, vec in qvecs.items():
        want = lsh.get_top_k(vec, 5, multiprobe=2)
        assert [i for _, i in sorted(got.get(qid, []))] == want, qid


def test_phrase_search_batch_one_scan_matches_singles(spark):
    """phrase_search_batch answers N phrases in ONE plan: a single scan
    of the documents parquet (the per-phrase loop would scan it N
    times), phrase terms broadcast, and results row-for-row equal to
    the single-phrase API."""
    import re

    from lshrs_spark.functions.text import (
        phrase_search,
        phrase_search_batch,
        token_postings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    postings = token_postings(docs)
    phrases = [["key", "scan"], ["key"], ["key", "key"],
               ["zzz", "missing"]]
    out = phrase_search_batch(postings, phrases)
    plan = physical_plan(out)
    # formatted plans print each scan once in the detail section:
    # count the file-index locations (verify-skill gotcha)
    assert len(re.findall(r"Location: InMemoryFileIndex", plan)) == 1, plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) >= 1, plan

    got: dict = {}
    for r in out.collect():
        got.setdefault(r.phrase_id, {})[r.id] = r.n_matches
    for pid, ph in enumerate(phrases):
        want = {r.id: r.n_matches
                for r in phrase_search(postings, ph).collect()}
        assert got.get(pid, {}) == want, (pid, ph)

    with pytest.raises(ValueError, match="at least one token"):
        phrase_search_batch(postings, [["key"], []])
    assert phrase_search_batch(postings, []).count() == 0


def test_video_payload_clamp_evaluates_once(spark):
    """The non-ASCII clamp in with_video_payload must run ONCE per row:
    inlined into the per-frame substrings it would run num_frames times
    (measured ~6x the cost at 3 frames on the bench corpus)."""
    from lshrs_spark.multimodal import with_video_payload

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = with_video_payload(
        docs, num_frames=3, width=7, height=8
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") == 1, plan


def test_bucketed_index_table_joins_without_exchange(spark, emb):
    """write_index_table persists the bucket index bucketBy(band, sig):
    a self-join on the bucketing keys (the similarity-join shape) must
    plan with ZERO exchanges, and an index-vs-query-sigs probe in the
    shuffle regime must exchange ONLY the query side — the co-located
    layout a 100 TB deployment re-probing nightly pays one bucket
    shuffle at write for."""
    import re

    from lshrs_spark.operators.index import write_index_table
    from lshrs_spark.operators.probe import candidates

    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    bc0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # the test corpus is tiny enough to auto-broadcast, which would hide
    # the co-location property this layout exists for — disable it so
    # the plan shows what a 100 TB (never-broadcastable) index does
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = build_index(emb, CFG, "vec_id", "embedding")
        write_index_table(idx, "t_bucketed_idx", num_buckets=8)
        bt = spark.table("t_bucketed_idx")

        # self-join on the bucketing keys: both sides read the bucketed
        # distribution off the files — the ONLY exchange in the whole
        # plan is the downstream aggregation's on (id_a, id_b)
        j = (
            bt.alias("a")
            .join(bt.alias("b"), ["band", "sig"])
            .filter(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id"), F.col("b.id"))
            .count()
        )
        plan = physical_plan(j)
        joins = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)",
                           plan)
        assert joins, plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "SelectedBucketsCount" in plan, plan

        # shuffle-regime probe: only the (non-bucketed) query side
        # exchanges; target the bucket count so distributions match
        n0 = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            rng = np.random.default_rng(9)
            qs = query_signatures_df(
                spark, rng.standard_normal((5, 64)).astype("float32"), CFG
            )
            pplan = physical_plan(
                candidates(bt, qs, strategy="shuffle")
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", n0)
        # exactly ONE pre-join exchange (query side) + the final
        # aggregation exchange; the bucketed index side has none
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", pplan))
        assert n_exchanges == 2, pplan
        j.count()  # plans execute, not just explain
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc0)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_idx")


def test_truncated_stored_plan_prunes_and_matches_inplan(spark, emb, tmp_path):
    """The stored matryoshka query's COARSE scan must carry the probed
    centroids as PartitionFilters (pruned truncated-width read, not a
    post-read filter), and results must equal the in-plan truncated_topk
    at the same centroid set / knobs."""
    from lshrs_spark.operators.knn import (
        truncated_ivf_write_store,
        truncated_topk,
        truncated_topk_stored,
    )

    store = str(tmp_path / "trunc_store")
    truncated_ivf_write_store(emb, 8, 16, store)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # scan mode keeps the whole two-stage lineage in ONE plan — assert
    # the coarse scan's centroid partition pruning there
    scan = truncated_topk_stored(spark, store, queries, 5, coarse_k=20,
                                 nprobe=2, refine="scan")
    plan = physical_plan(scan)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines, "coarse scan has no PartitionFilters section"
    assert any("centroid_id" in l and "IN" in l.upper()
               for l in part_lines), part_lines
    # explicit pushdown (auto picks scan at this tiny sidecar): the
    # coarse stage is collected, and the returned plan's sidecar scan
    # carries the shortlist as a pushed In filter — O(shortlist) row
    # groups read, not O(corpus)
    out = truncated_topk_stored(spark, store, queries, 5, coarse_k=20,
                                nprobe=2, refine="pushdown")
    pplan = physical_plan(out)
    pushed = [l for l in pplan.splitlines()
              if "PushedFilters" in l and "In(id" in l]
    assert pushed, "pushdown refine has no In(id, ...) on the sidecar scan"
    mem = truncated_topk(emb, queries, 5, coarse_dims=16, coarse_k=20,
                         num_centroids=8, nprobe=2)
    want = sorted((r.qid, r.id, r.rank) for r in mem.collect())
    assert sorted((r.qid, r.id, r.rank) for r in out.collect()) == want
    # the shared-scan refine returns the identical result
    assert sorted((r.qid, r.id, r.rank) for r in scan.collect()) == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="refine must be"):
        truncated_topk_stored(spark, store, queries, 5, refine="nope")


def test_kdist_curve_no_single_partition_exchange(spark):
    """The k-distance curve's global rank must come from the two-stage
    distributed scan (running_total) — a SinglePartition window/sort
    over the per-point k-distances would serialize the curve at scale,
    which is exactly what the operator's docstring promises away."""
    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.graph import dbscan_kdist_curve

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 80
    )
    plan = physical_plan(dbscan_kdist_curve(emb, 3, quantiles=4))
    release_slots()
    assert "SinglePartition" not in plan


def test_balance_stats_rank_no_single_partition_exchange(spark):
    """The shared health-card Gini's ascending rank must be the
    two-stage distributed ordinal (running_total), never a
    partition-less row_number window: the IVF/BM25 cards rank small
    key sets, but lsh_balance_report ranks (band, sig) buckets whose
    cardinality grows with the corpus — a SinglePartition sort there
    would be the card's 100 TB bottleneck."""
    import re

    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.skew import _balance_card

    counts = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("n")
    )
    # the lazy internal: balance_stats itself returns a LOCAL 1-row
    # frame (eager-card contract), whose plan is just a table scan
    plan = physical_plan(
        _balance_card(counts, "k", "n", 4.0, "test.balance.plan")
    )
    release_slots()
    # Every window in the plan must be partitioned (running_total's
    # _pid spec) — a partition-less windowspecdefinition is the
    # single-task global sort. The final 1-row aggregate's
    # SinglePartition merge of PARTIAL rows is fine (bounded by the
    # shuffle-partition count), so asserting on Exchange would be the
    # wrong check here.
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the running_total window in the plan"
    assert all("_pid" in s for s in specs), specs


def test_entry_topk_cuts_are_take_ordered(spark):
    """Entry top-k/shortlist cuts must be TakeOrderedAndProject (the
    distributed per-partition heap) feeding a k-row rank window — a
    corpus-wide partition-less row_number window funnels every scored
    row through ONE task, which is exactly the shape these entries'
    operators (pq/brute topk in knn.py) already avoid."""
    from lshrs_spark.entries import QUERIES

    for name in ("knn_bruteforce", "text_token_topk", "text_hybrid_rrf",
                  "quant_topk"):
        plan = physical_plan(QUERIES[name](spark, SF))
        assert "TakeOrderedAndProject" in plan, name
