"""Clustered / z-ordered at-rest layout: the file-level min/max
envelopes that make parquet-stats data skipping work."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators.export import write_clustered, zorder_key_col

SF = "/root/testdata/sf0.001"


def _file_envelopes(path, col):
    """Per-file (min, max) of ``col`` straight from parquet footers —
    exactly the stats a scan prunes on."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_range_clustered_files_are_disjoint(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "clustered")
    write_clustered(docs, path, ["n_chars"], num_files=8)
    env = _file_envelopes(path, "n_chars")
    assert len(env) > 1
    # repartitionByRange guarantees disjoint ranges (boundary ties may
    # share a value): sorted by min, each file starts at or after the
    # previous file's max
    env.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(env, env[1:]):
        assert lo_b >= hi_a - 0  # no interleaving beyond the boundary
    # a point predicate intersects few files — the skipping property
    probe = env[0][1]  # some existing value
    hit = [1 for lo, hi in env if lo <= probe <= hi]
    assert len(hit) <= 2


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "zordered")
    write_clustered(
        docs, path, ["n_chars", "doc_id"], num_files=8,
        zorder=True, zorder_bits=8,
    )
    total = docs.count()
    assert spark.read.parquet(path).count() == total  # lossless rewrite

    for col in ("n_chars", "doc_id"):
        env = _file_envelopes(path, col)
        g_lo = min(lo for lo, _ in env)
        g_hi = max(hi for _, hi in env)
        spans = [(hi - lo) / max(1, (g_hi - g_lo)) for lo, hi in env]
        # every dimension's average per-file envelope is narrower than
        # the global span — multi-column skipping from one layout
        assert sum(spans) / len(spans) < 0.8


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (255, 0), (0, 255), (255, 255)], ["x", "y"]
    )
    key = zorder_key_col(
        [
            (F.col("x"), F.lit(0), F.lit(255)),
            (F.col("y"), F.lit(0), F.lit(255)),
        ],
        bits=8,
    )
    got = {(r.x, r.y): r.k for r in df.select("x", "y", key.alias("k")).collect()}
    # corners of the grid: 0, alternating-bit patterns, all-ones
    assert got[(0, 0)] == 0
    assert got[(255, 255)] == (1 << 16) - 1
    assert got[(255, 0)] == int("0101010101010101", 2)
    assert got[(0, 255)] == int("1010101010101010", 2)


def test_write_clustered_validates_cols(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        write_clustered(docs, str(tmp_path / "x"), [])
    with pytest.raises(ValueError):
        zorder_key_col([])


def _bloom_offsets(spark, path_glob):
    """Per-file bloom-filter offset of the `sig` column, read from the
    parquet footer via the JVM reader (pyarrow 16 has no bloom API)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = []
    for f in sorted(glob.glob(path_glob)):
        jpath = jvm.org.apache.hadoop.fs.Path(f)
        footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, jpath
        )
        for b in range(footer.getBlocks().size()):
            blk = footer.getBlocks().get(b)
            for j in range(blk.getColumns().size()):
                c = blk.getColumns().get(j)
                if "sig" in str(c.getPath()):
                    out.append(c.getBloomFilterOffset())
    return out


def test_write_index_bloom_filter_lands_in_footer(spark, tmp_path):
    """bloom_filter=True must produce a parquet Bloom filter on `sig`
    (point-probe skipping for row groups whose min/max RANGE covers the
    key but which don't contain it); default stays bloom-free; reads
    are identical either way.

    The sig column must OVERFLOW parquet's dictionary encoding for a
    Bloom filter to be written at all (parquet-mr skips blooms on fully
    dictionary-encoded row groups — the dictionary already gives exact
    membership, so the flag only pays off at scale). Synthetic
    high-cardinality sigs model that; the real sf0.001 index is tiny
    enough to stay dictionary-encoded, where the flag is a no-op by
    design."""
    from lshrs_spark.operators.index import read_index, write_index

    idx = spark.range(300_000).select(
        (F.col("id") % 4).cast("int").alias("band"),
        (F.col("id") * 2654435761 % (2 ** 61)).alias("sig"),
        F.col("id"),
    )
    plain = str(tmp_path / "idx_plain")
    bloomed = str(tmp_path / "idx_bloom")
    write_index(idx, plain, bucket_partitions=2)
    write_index(
        idx, bloomed, bucket_partitions=2,
        bloom_filter=True, bloom_ndv=300_000,
    )

    offs_plain = _bloom_offsets(spark, f"{plain}/band=*/*.parquet")
    offs_bloom = _bloom_offsets(spark, f"{bloomed}/band=*/*.parquet")
    assert offs_plain and all(o == -1 for o in offs_plain)
    assert offs_bloom and all(o > 0 for o in offs_bloom)

    chk = lambda p: read_index(spark, p).agg(  # noqa: E731
        F.sum(F.col("sig") % 1000003), F.count("*")
    ).collect()
    assert chk(plain) == chk(bloomed)
