"""r10 A/B: per-iteration persist() vs localCheckpoint() lineage
truncation in the tokenizer trainers (verdict item 4) — does plan
truncation cut the 4-6 s per-invocation constant the r9 bench rows
showed (builder-measured identical at sf0.001 vs sf0.1, i.e. pure
Catalyst planning/codegen, not data)?

Measures wall time of a fresh train call (DataFrame build + collect)
for bpe_train_fixed / wordpiece_train_fixed / unigram_train_fixed at
n_merges (or n_iters) in {5, 20, 50} ({1, 2, 4} for unigram), both
switch positions, min of 2 runs each, one shared session.

Usage: python tools/r10_tokenizer_ab.py
Prints one JSON line per (trainer, n, mode); paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.llmdata import bpe


def main() -> None:
    spark = get_spark("r10-tok-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = docs.select("text").persist()
    docs.count()

    def timed(fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    ladders = [
        ("bpe", lambda n: bpe.bpe_train_fixed(docs, n_merges=n), [5, 20, 50]),
        ("wordpiece", lambda n: bpe.wordpiece_train_fixed(docs, n_merges=n), [5, 20, 50]),
        ("unigram", lambda n: bpe.unigram_train_fixed(docs, n_iters=n), [1, 2, 4]),
    ]
    for name, make, ns in ladders:
        for n in ns:
            row = {"probe": "r10_tokenizer_ab", "trainer": name, "n": n}
            for mode, flag in (("persist", False), ("truncate", True)):
                bpe.ITER_TRUNCATE = flag
                try:
                    row[mode + "_sec"] = timed(lambda: make(n).collect())
                finally:
                    bpe.ITER_TRUNCATE = False
            row["ratio"] = round(row["truncate_sec"] / row["persist_sec"], 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
