"""r10 A/B: per-iteration persist() vs localCheckpoint() lineage
truncation in the tokenizer trainers (verdict item 4).

Finding (see PLANS.md r10): the 4-6 s "plan-compile constant" was the
small-n edge of an EXPONENTIAL: every merge/EM fold references its
input column several times, so CollapseProject substitutes the
previous iteration's fold into each reference and the optimized
expression doubles per iteration.  jstack on the stalled n_merges=20
run showed ~700 s of CPU inside TreeNode.generateTreeString (the plan
describe walks the blown-up tree).  persist() does not help — the
blowup is in the logical expression, not execution.  localCheckpoint
truncation caps the visible plan at one fold: measured linear.

The harness runs persist mode only at small n (it is non-terminating
past ~n=15: per-iteration times double — 0.83 s at iteration 10,
2.3 s at 13, 8.6 s at 15) and the truncate ladder through n=50.

Usage: python tools/r10_tokenizer_ab.py
Prints one JSON line per (trainer, mode, n); paste into PLANS.md.
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

    def timed(fn):
        t0 = time.time()
        n_rows = len(fn().collect())
        return round(time.time() - t0, 2), n_rows

    ladders = [
        ("bpe", lambda n: bpe.bpe_train_fixed(docs, n_merges=n)),
        ("wordpiece", lambda n: bpe.wordpiece_train_fixed(docs, n_merges=n)),
    ]
    for name, make in ladders:
        for mode, flag, ns in (
            ("persist", False, [5, 12]),       # n>15 non-terminating
            ("truncate", True, [5, 20, 50]),
        ):
            for n in ns:
                bpe.ITER_TRUNCATE = flag
                try:
                    sec, rows = timed(lambda: make(n))
                finally:
                    bpe.ITER_TRUNCATE = True
                print(json.dumps({
                    "probe": "r10_tokenizer_ab", "trainer": name,
                    "mode": mode, "n": n, "sec": sec, "rows": rows,
                }), flush=True)
    # unigram: the EM loop localCheckpoints unconditionally (same
    # exponential via _scored's self-nesting total attach); ladder the
    # iteration count to show linearity
    for n in (1, 2, 4, 8):
        t0 = time.time()
        bpe.unigram_train_fixed(docs, n_iters=n).collect()
        print(json.dumps({
            "probe": "r10_tokenizer_ab", "trainer": "unigram",
            "mode": "truncate", "n": n,
            "sec": round(time.time() - t0, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
