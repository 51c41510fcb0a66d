"""Training-export primitives: hash sampling, shard shuffle, writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators import export as E


@pytest.fixture()
def ids(spark):
    return spark.range(0, 500).withColumnRenamed("id", "doc_id")


def test_hash_sample_fraction_and_determinism(ids):
    a = E.hash_sample(ids, 0.5)
    b = E.hash_sample(ids.repartition(7), 0.5)
    got_a = sorted(r.doc_id for r in a.collect())
    got_b = sorted(r.doc_id for r in b.collect())
    assert got_a == got_b                      # partition-layout independent
    assert 0.35 < len(got_a) / 500 < 0.65


def test_hash_sample_composes_with_distinct_salts(ids):
    outer = E.hash_sample(ids, 0.5, salt="stage1")
    inner = E.hash_sample(outer, 0.5, salt="stage2")
    n = inner.count()
    assert 0.1 < n / 500 < 0.4                 # ~25%
    # same salt twice is idempotent, not compounding
    again = E.hash_sample(outer, 0.5, salt="stage1")
    assert again.count() == outer.count()


def test_hash_sample_bounds(ids):
    assert E.hash_sample(ids, 0.0).count() == 0
    assert E.hash_sample(ids, 1.0).count() == 500
    with pytest.raises(ValueError):
        E.hash_sample(ids, 1.5)


def test_shuffle_shards_partitions_positions(ids):
    out = E.shuffle_shards(ids, 4)
    rows = out.collect()
    assert len(rows) == 500
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():        # dense 1..n per shard
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_shards_seed_changes_order(ids):
    a = {(r.id, r.shard, r.pos) for r in E.shuffle_shards(ids, 4, seed=1).collect()}
    b = {(r.id, r.shard, r.pos) for r in E.shuffle_shards(ids, 4, seed=2).collect()}
    assert a != b
    # same seed reproduces exactly
    c = {(r.id, r.shard, r.pos) for r in E.shuffle_shards(ids, 4, seed=1).collect()}
    assert a == c


def test_shuffle_shards_xxhash64_valid(ids):
    out = E.shuffle_shards(ids, 4, base_hash="xxhash64")
    assert out.count() == 500
    assert out.agg(F.min("shard"), F.max("shard")).first() == (0, 3)


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("doc "), F.col("doc_id")))
    path = str(tmp_path / "shards")
    E.write_training_shards(df, path, 4, seed=7)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(r.shard for r in back.select("shard").distinct().collect()) \
        == {0, 1, 2, 3}
    # within each shard file, rows sit in seeded shuffle order
    key = E.shuffle_key_col(F.col("doc_id"), seed=7, base_hash="xxhash64")
    one = back.filter(F.col("shard") == 0).withColumn("_k", key)
    vals = [r._k for r in one.collect()]       # parquet row order preserved
    assert vals == sorted(vals)


def test_negative_samples_properties(spark):
    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.export import negative_samples

    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    got = negative_samples(docs, 3, seed=7).collect()
    release_slots()
    assert len(got) == 40 * 3
    for r in got:
        assert r.negative_id != r.anchor_id       # never self
        assert 0 <= r.negative_id < 40
    # deterministic: second run identical
    again = negative_samples(docs, 3, seed=7).collect()
    release_slots()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # different seed -> different draws (overwhelmingly)
    other = negative_samples(docs, 3, seed=8).collect()
    release_slots()
    assert sorted(map(tuple, other)) != sorted(map(tuple, got))
    import pytest as _pt

    with _pt.raises(ValueError):
        negative_samples(docs, 0)
    with _pt.raises(ValueError):
        negative_samples(docs.limit(1), 2)


def test_weighted_sample_deterministic_and_complete(ids):
    w = ids.withColumn("n_chars", F.col("doc_id") % 7 + 1)
    a = E.weighted_sample(w, 20, "n_chars").collect()
    b = E.weighted_sample(w, 20, "n_chars").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # replayable
    assert len(a) == 20
    assert all(r.key < 0 for r in a)          # ln(u)/w with u in (0,1]
    keys = [r.key for r in a]
    assert keys == sorted(keys, reverse=True)  # top-k descending
    # k >= n returns everything
    assert E.weighted_sample(w, 600, "n_chars").count() == 500


def test_weighted_sample_bias_toward_heavy_rows(spark):
    # two weight classes, 10:1 — across 20 independent draws of 10-of-100
    # the heavy half must dominate the selections (E[heavy] ~ 9.2/10)
    rows = [(i, 100 if i < 50 else 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    heavy = total = 0
    for seed in range(20):
        picked = E.weighted_sample(df, 10, "w", seed=seed).collect()
        heavy += sum(1 for r in picked if r.doc_id < 50)
        total += len(picked)
    assert total == 200
    assert heavy / total > 0.75, f"heavy share {heavy/total}"


def test_weighted_sample_rejects_bad_k(ids):
    with pytest.raises(ValueError, match="k must be"):
        E.weighted_sample(ids.withColumn("w", F.lit(1)), 0, "w")


def test_group_split_never_straddles_near_dup_pairs(spark):
    """The leakage-safety invariant: every Jaccard>=0.5 pair lands in
    ONE split (a doc-level hash split violates this by design)."""
    from lshrs_spark.entries import QUERIES
    from lshrs_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    out = QUERIES["pipeline_group_split"](spark, sf)
    split_of = {r.doc_id: r.split for r in out.collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = D.ngram_jaccard_pairs(docs, 0.5, n=3).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert split_of[p.id_a] == split_of[p.id_b], (p.id_a, p.id_b)
    assert set(split_of.values()) >= {"train"}


def test_webdataset_round_trip_and_determinism(spark, tmp_path):
    """Tar shards must contain every document exactly once, in seeded
    shuffle order, and re-exporting must be byte-identical."""
    import glob
    import hashlib
    import tarfile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d1 = str(tmp_path / "wds1")
    d2 = str(tmp_path / "wds2")
    m1 = {r.shard: (r.n_members, r.total_bytes)
          for r in E.write_webdataset(docs, d1, 4).collect()}
    m2 = {r.shard: (r.n_members, r.total_bytes)
          for r in E.write_webdataset(docs, d2, 4).collect()}
    assert m1 == m2 and set(m1) == {0, 1, 2, 3}
    assert sum(n for n, _ in m1.values()) == docs.count()

    texts = {r.doc_id: r.text for r in docs.collect()}
    seen = {}
    for f in sorted(glob.glob(f"{d1}/shard-*.tar")):
        with tarfile.open(f) as tar:
            names = tar.getnames()
            assert names == sorted(names)  # members in shuffle order
            for mem in tar.getmembers():
                pos, doc_id, ext = mem.name.split(".")
                assert ext == "txt"
                seen[int(doc_id)] = tar.extractfile(mem).read().decode()
    assert seen == texts  # every doc exactly once, payload intact

    h = lambda d: [  # noqa: E731
        hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(f"{d}/shard-*.tar"))
    ]
    assert h(d1) == h(d2)  # byte-identical release

    with pytest.raises(ValueError, match="num_shards"):
        E.write_webdataset(docs, str(tmp_path / "bad"), 0)
