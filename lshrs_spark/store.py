"""Segmented bucket-index store: LSM-style segments + manifest snapshots.

``write_index`` lays one immutable probe-optimal index on disk; real
deployments ingest continuously. The classic answer (Lucene segments,
Iceberg snapshots) is the one that works at 100 TB:

* every ingest batch becomes a new IMMUTABLE segment directory (each in
  the probe-optimal ``write_index`` layout, so row-group pruning holds
  per segment);
* deletes append id-tombstone files — no segment is ever rewritten in
  place;
* a JSON **manifest per version** lists exactly which segment and
  tombstone files make up that snapshot. Commit = write manifest
  ``v_{N+1}.json`` + flip the ``CURRENT`` pointer; readers that pinned
  version N keep an immutable, consistent view (time travel) because
  nothing they reference is ever mutated;
* ``compact()`` merges the live view into one fresh segment and commits
  a manifest that references only it — old versions stay readable until
  ``prune()`` reclaims unreferenced directories.

Single-writer by design (ingest pipelines serialize commits); the
commit itself is one small JSON file + pointer flip — on a real object
store use a conditional put for the pointer, locally an atomic rename.
Readers never list directories — they read the manifest, so eventual
listing consistency on object stores is irrelevant.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.index import write_index

__all__ = ["SegmentedIndexStore"]


class SegmentedIndexStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        if not os.path.exists(self._manifest_dir):
            raise FileNotFoundError(
                f"no store at {root!r} — call SegmentedIndexStore.create"
            )

    # ------------------------------------------------------------- paths
    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v_{version}.json")

    @property
    def _current_path(self) -> str:
        return os.path.join(self._manifest_dir, "CURRENT")

    # ------------------------------------------------------------ set up
    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "SegmentedIndexStore":
        os.makedirs(os.path.join(root, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(root, "segments"), exist_ok=True)
        os.makedirs(os.path.join(root, "tombstones"), exist_ok=True)
        store = object.__new__(cls)
        store.spark, store.root = spark, root
        if not os.path.exists(store._current_path):
            store._commit({"version": 0, "segments": [], "tombstones": []})
        return store

    # ---------------------------------------------------------- manifest
    def current_version(self) -> int:
        with open(self._current_path) as f:
            return int(f.read().strip())

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v_") and name.endswith(".json"):
                out.append(int(name[2:-5]))
        return sorted(out)

    def manifest(self, version: Optional[int] = None) -> dict:
        v = self.current_version() if version is None else version
        try:
            with open(self._manifest_path(v)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"version {v} does not exist (pruned or never written); "
                f"available: {self.versions()}"
            ) from None

    def _commit(self, manifest: dict) -> int:
        v = manifest["version"]
        tmp = self._manifest_path(v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(v))
        tmp2 = self._current_path + ".tmp"
        with open(tmp2, "w") as f:
            f.write(str(v))
        os.replace(tmp2, self._current_path)  # object store: conditional put
        return v

    # ------------------------------------------------------------ writes
    def append(self, index_df: DataFrame, **write_kw) -> int:
        """Commit one ingest batch as a new immutable segment; returns
        the new version. The batch lands in the probe-optimal layout,
        so per-segment row-group pruning is identical to a monolithic
        ``write_index`` store."""
        seg = f"segments/{uuid.uuid4().hex[:16]}"
        write_index(index_df, os.path.join(self.root, seg), **write_kw)
        m = self.manifest()
        return self._commit({
            "version": m["version"] + 1,
            "segments": m["segments"] + [seg],
            "tombstones": m["tombstones"],
        })

    def append_epoch(self, index_df: DataFrame, epoch_id: int,
                     **write_kw) -> int:
        """Replay-safe streaming append: the segment directory is keyed
        by the micro-batch epoch, so a retried batch OVERWRITES its own
        segment and — if the epoch already committed — leaves the
        manifest untouched. ``foreachBatch`` at-least-once delivery
        therefore lands exactly one segment per epoch."""
        seg = f"segments/epoch_{int(epoch_id)}"
        write_index(index_df, os.path.join(self.root, seg), **write_kw)
        m = self.manifest()
        if seg in m["segments"]:
            return m["version"]
        return self._commit({
            "version": m["version"] + 1,
            "segments": m["segments"] + [seg],
            "tombstones": m["tombstones"],
        })

    def delete_ids(self, ids: Sequence[int]) -> int:
        """Commit a tombstone file for ``ids``; no segment is touched."""
        ts = f"tombstones/{uuid.uuid4().hex[:16]}"
        self.spark.createDataFrame(
            [(int(i),) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, ts)
        )
        m = self.manifest()
        return self._commit({
            "version": m["version"] + 1,
            "segments": m["segments"],
            "tombstones": m["tombstones"] + [ts],
        })

    # ------------------------------------------------------------- reads
    def read(self, version: Optional[int] = None) -> DataFrame:
        """The live bucket table at a version (default: current):
        union of that manifest's segments minus its tombstones. The
        union is segment-pruned per probe exactly like a single
        directory; the anti-join's tombstone side is tiny (ids only)
        and broadcasts. Plan size grows with the segment count — run
        :meth:`compact` on the usual LSM cadence (e.g. when segments
        exceed a few hundred) to fold the union back to one input."""
        m = self.manifest(version)
        if not m["segments"]:
            return self.spark.createDataFrame(
                [], "band int, sig long, id long"
            )
        parts = [
            self.spark.read.parquet(os.path.join(self.root, s))
            .select("band", "sig", "id")
            for s in m["segments"]
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        for t in m["tombstones"]:
            dead = self.spark.read.parquet(os.path.join(self.root, t))
            df = df.join(F.broadcast(dead), "id", "left_anti")
        return df.select("band", "sig", "id")

    # ------------------------------------------------------ maintenance
    def compact(self, **write_kw) -> int:
        """Merge the current view into ONE fresh segment (tombstones
        applied, probe-optimal layout restored across segment
        boundaries) and commit a manifest referencing only it. Old
        versions keep reading their old segments until :meth:`prune`."""
        seg = f"segments/{uuid.uuid4().hex[:16]}"
        write_index(self.read(), os.path.join(self.root, seg), **write_kw)
        m = self.manifest()
        return self._commit({
            "version": m["version"] + 1,
            "segments": [seg],
            "tombstones": [],
        })

    def prune(self, keep_versions: int = 1) -> list[str]:
        """Reclaim storage: drop all but the newest ``keep_versions``
        manifests and delete every segment/tombstone directory no kept
        manifest references. Returns the deleted paths."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        keep = self.versions()[-keep_versions:]
        live: set[str] = set()
        for v in keep:
            m = self.manifest(v)
            live.update(m["segments"])
            live.update(m["tombstones"])
        deleted = []
        for v in self.versions():
            if v not in keep:
                os.remove(self._manifest_path(v))
        for kind in ("segments", "tombstones"):
            base = os.path.join(self.root, kind)
            for name in os.listdir(base):
                rel = f"{kind}/{name}"
                if rel not in live:
                    shutil.rmtree(os.path.join(base, name))
                    deleted.append(rel)
        return deleted
