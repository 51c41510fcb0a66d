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
