#!/usr/bin/env python
"""Regenerate lshrs_spark.functions.bpe.DEFAULT_MERGES.

Learns the shipped BPE merge table from the sf0.001 documents table
(deterministic — no RNG) and prints the Python literal to paste into
``bpe.py``. Run after any change to the corpus generator:

    python tools/gen_bpe_merges.py [sf_dir] [num_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lshrs_spark.functions.bpe import learn_bpe_merges
from lshrs_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("gen_bpe_merges", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = learn_bpe_merges(docs, num_merges)
    print("DEFAULT_MERGES: list[tuple[str, str]] = [")
    for i in range(0, len(merges), 4):
        chunk = ", ".join(repr(m) for m in merges[i : i + 4])
        print(f"    {chunk},")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
