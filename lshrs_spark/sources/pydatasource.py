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
            # "portable": md5-based values the DuckDB oracle replays.
            # "fast": vectorized splitmix64 + Arrow batches — the mode
            # for generating million-row benchmark corpora.
            self.mode = str(options.get("mode", "portable"))

        def partitions(self):
            per = -(-self.n // self.numparts)  # ceil
            return [
                InputPartition((p * per, min(self.n, (p + 1) * per)))
                for p in range(self.numparts)
                if p * per < self.n
            ]

        def read(self, partition):
            lo, hi = partition.value
            if self.mode == "fast":
                yield from self._read_fast(lo, hi)
                return
            import hashlib

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

        def _read_fast(self, lo: int, hi: int):
            # Vectorized splitmix64 over the (id, component) grid, one
            # Arrow batch per partition: ~100x the portable mode's
            # throughput, still a pure function of (seed, id, j) — the
            # values are id-stable under ANY partitioning, they just
            # use a different (numpy-fast) mixer than the md5-based
            # oracle-portable mode.
            import numpy as np
            import pyarrow as pa

            n, dim, seed = hi - lo, self.dim, self.seed

            def mix(x):
                x = (x + np.uint64(0x9E3779B97F4A7C15))
                x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                return x ^ (x >> np.uint64(31))

            with np.errstate(over="ignore"):
                ids = np.arange(lo, hi, dtype=np.uint64)
                grid = (
                    ids[:, None] * np.uint64(dim)
                    + np.arange(dim, dtype=np.uint64)[None, :]
                    + mix(np.uint64(seed))
                )
                vals = mix(grid).astype(np.float64) / 2**63 - 1.0
                labels = (mix(ids ^ np.uint64(0xABCD)) % np.uint64(16))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64)),
                    pa.array(list(vals), type=pa.list_(pa.float64())),
                    pa.array(labels.astype(np.int64)),
                ],
                names=["vec_id", "embedding", "label"],
            )

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
