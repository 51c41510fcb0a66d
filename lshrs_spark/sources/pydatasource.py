"""Python Data Source API (Spark 4): a deterministic synthetic-vector
generator source.

Benchmarking and capacity-testing a 100 TB deployment needs corpora far
bigger than any fixture — the right tool is a GENERATOR source that
materializes nothing: each Spark partition synthesizes its own id range
on the executor, so "reading" 10^11 rows is pure compute with zero I/O
and perfect parallelism. Spark 4's Python Data Source API
(``pyspark.sql.datasource``) lets this live behind an ordinary
``spark.read.format(...)`` call — schema, partition planning, and row
generation all in Python, batch-read through Arrow.

Values are PORTABLE, not numpy-RNG: component ``j`` of vector ``id`` is
``h48("vg{seed}|{id}|{j}")`` mapped linearly into [-1, 1] (the same
md5-prefix hash the rest of the engine shares with the DuckDB oracle),
so any engine regenerates the identical corpus from ``(seed, n, dim)``
alone — which is what makes cross-engine correctness checks of a
generated corpus possible at all.

Worker-import note: the DataSource/Reader classes are defined NESTED in
:func:`make_vectorgen_source` so cloudpickle ships them by value —
module-level classes pickle by reference and would make executors
``import lshrs_spark``, which fails under a vanilla driver session.
"""

from __future__ import annotations

__all__ = ["make_vectorgen_source", "register_vectorgen"]


def make_vectorgen_source():
    """Build the DataSource class (nested so it pickles by value)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class VectorGenReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.dim = int(options.get("dim", 8))
            self.seed = int(options.get("seed", 42))
            self.numparts = int(options.get("numpartitions", 8))

        def partitions(self):
            per = -(-self.n // self.numparts)  # ceil
            return [
                InputPartition((p * per, min(self.n, (p + 1) * per)))
                for p in range(self.numparts)
                if p * per < self.n
            ]

        def read(self, partition):
            import hashlib

            lo, hi = partition.value
            dim, seed = self.dim, self.seed

            def h48(s: str) -> int:
                return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

            for i in range(lo, hi):
                vec = [
                    (h48(f"vg{seed}|{i}|{j}") % 2_000_001 - 1_000_000)
                    / 1_000_000.0
                    for j in range(dim)
                ]
                yield (i, vec, h48(f"vglabel{seed}|{i}") % 16)

    class VectorGenSource(DataSource):
        @classmethod
        def name(cls):
            return "vectorgen"

        def schema(self):
            return "vec_id bigint, embedding array<double>, label bigint"

        def reader(self, schema):
            return VectorGenReader(self.options)

    return VectorGenSource


def register_vectorgen(spark) -> None:
    """Register the source; afterwards
    ``spark.read.format("vectorgen").option("n", ...).load()`` works
    anywhere in the session."""
    spark.dataSource.register(make_vectorgen_source())
