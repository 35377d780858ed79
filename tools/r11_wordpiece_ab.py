"""r11 VERDICT item 6 — flatten the WordPiece trainer's superlinear
tail (86 s at n_merges=50 vs BPE's 12.6 under the same truncation,
PLANS.md r10).

Shipped fix: the two per-iteration broadcast joins re-aggregated the
full word table once per broadcast exchange (sym_counts evaluated
twice) on top of the pair aggregation — three corpus-sized
aggregations per round.  The symbol-count relation is VOCAB-bounded
(alphabet + one row per prior merge), so it is collected and inlined
as a literal lookup map: ONE distributed aggregation per round,
scores bit-identical.

This probe re-runs the truncate ladder (n = 5, 20, 50) for both
trainers and prints per-iteration times for wordpiece at n=50 so the
tail shape (flat vs growing) is visible, plus a value-identity check
of the n=20 merge table against the module's pre-fix expectation
hash recorded by the r10 gates (the 3-SF gate re-run is the real
verdict; this is the quick in-probe signal).

Usage: python tools/r11_wordpiece_ab.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.llmdata import bpe


def main() -> None:
    spark = get_spark("r11-wp-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = docs.select("text").persist()
    docs.count()

    def timed(fn):
        t0 = time.time()
        rows = fn().collect()
        return round(time.time() - t0, 2), rows

    for name, make in (
        ("bpe", lambda n, st: bpe.bpe_train_fixed(docs, n_merges=n)),
        ("wordpiece", lambda n, st: bpe.wordpiece_train_fixed(
            docs, n_merges=n, stats=st)),
    ):
        for n in (5, 20, 50):
            stats: dict = {}
            sec, rows = timed(lambda: make(n, stats))
            out = {"trainer": name, "n": n, "sec": sec, "rows": len(rows)}
            iters = stats.get("iter_sec")
            if iters:
                out["iter_first3"] = iters[:3]
                out["iter_last3"] = iters[-3:]
            print(json.dumps(out), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
