#!/usr/bin/env python
"""Plan-shape audit of a registered-entry family (round 15).

For every requested entry, builds its DataFrame against
``$SPARK_GRAFT_SF_DIR`` and counts the scale-relevant physical-plan
nodes — Exchange, Python-boundary nodes (BatchEvalPython /
ArrowEvalPython / MapInPandas / MapInArrow / FlatMapGroupsInPandas),
CartesianProduct / BroadcastNestedLoopJoin, and join strategies — the
§7.2 checklist applied in bulk to the correctness-only families the
bench does not time (VERDICT r14: "the LLM-pipeline family has had no
optimization pass yet"). With ``--time`` each entry is additionally
executed through the noop sink (guide §1.4) and wall time recorded.

Usage: python tools/family_audit.py [--time] [--out F.json] prefix ...
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = [
    ("exchange", r"\bExchange\b"),
    ("batch_eval_python", r"\bBatchEvalPython\b"),
    ("arrow_eval_python", r"\bArrowEvalPython\b"),
    ("map_in_pandas", r"\bMapInPandas\b"),
    ("map_in_arrow", r"\bMapInArrow\b"),
    ("flatmap_groups", r"\bFlatMapGroupsInPandas\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("bnl_join", r"\bBroadcastNestedLoopJoin\b"),
    ("sort_merge_join", r"\bSortMergeJoin\b"),
    ("shuffled_hash_join", r"\bShuffledHashJoin\b"),
    ("broadcast_hash_join", r"\bBroadcastHashJoin\b"),
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_time = "--time" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if not args:
        sys.exit("usage: family_audit.py [--time] [--out F.json] prefix ...")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lshrs_spark import entries
    from lshrs_spark.session import get_spark

    spark = get_spark("family_audit")
    names = sorted(
        n for n in entries.QUERIES
        if any(n.startswith(p) for p in args)
    )
    report: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"audit: {name}")
        row: dict = {}
        try:
            df = entries.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            for key, pat in NODES:
                c = len(re.findall(pat, plan))
                if c:
                    row[key] = c
            if do_time:
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                row["noop_sec"] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — audit must not abort
            row["err"] = f"{type(exc).__name__}: {exc}"[:200]
        report[name] = row
        print(json.dumps({name: row}), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
