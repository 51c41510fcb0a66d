#!/usr/bin/env python
"""Regenerate ROTATION.md — the per-entry driver-row rotation ledger
(VERDICT r4 #6). History = union of the driver's CORRECTNESS_r*.json
key sets; entries currently in DRIVER_WINDOW are tagged for the round
given with --round (they will be hard-checked this round).

Usage:  python tools/gen_rotation.py --round 5
Run after ANY change to DRIVER_WINDOW; keep the round-rotation
paragraph at the top of ROTATION.md up to date by hand (it records the
zero-sum promote/demote rationale the guard cannot infer).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="current round number (window entries tagged rN)")
    args = ap.parse_args()

    import lshrs_spark.entries as e

    hist: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            hist[name] = max(rnd, hist.get(name, 0))

    ledger = os.path.join(REPO, "ROTATION.md")
    lines = open(ledger).read().split("\n")
    head = lines[:lines.index("| entry | last driver round |")]

    out = head + ["| entry | last driver round |", "| --- | --- |"]
    never = []
    for name in sorted(e.QUERIES):
        if name in e.DRIVER_WINDOW:
            tag = f"window (r{args.round})"
        elif name in hist:
            tag = f"r{hist[name]}"
        else:
            tag = "never"
            never.append(name)
        out.append(f"| {name} | {tag} |")
    out.append("")
    out.append(f"Never driver-checked: {len(never)} entries — the rotation "
               "queue")
    out.append("for future rounds (oldest families first).")
    open(ledger, "w").write("\n".join(out) + "\n")
    print(f"ROTATION.md: {len(e.QUERIES)} entries, "
          f"{len(e.DRIVER_WINDOW)} in-window, {len(never)} never-checked")


if __name__ == "__main__":
    main()
