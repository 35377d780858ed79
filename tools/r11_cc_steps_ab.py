"""r11 — A/B the connected-components cycle composition (steps_per_cycle)
on the dedup_clusters closure at sf0.1, with a host-factor reference row
(minhash_lsh, judge quiet-host 1.42 s in r10) so the numbers are
comparable across host days.  One session, min-of-3 per variant,
lz4 codec (session default).

Usage: python tools/r11_cc_steps_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.llmdata.dedup import (
    connected_components,
    simhash_neardup_pairs,
)
from transcriptomics_data_integration_spark.runtime import cleanup_persisted


def _timed(label: str, fn, reps: int = 3):
    best, n = float("inf"), None
    for _ in range(reps):
        cleanup_persisted()
        time.sleep(0.05)
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": label, "sec": round(best, 3), "rows": n}), flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r11-cc-steps-ab")
    from transcriptomics_data_integration_spark.suite import QUERIES

    docs_raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs_raw.select("doc_id", "text").unionByName(
        docs_raw.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    # pin the edge list so every variant times ONLY the closure
    pairs = (
        simhash_neardup_pairs(docs, "doc_id", max_hamming=3, expand="star")
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    print(json.dumps({"edges": pairs.count()}), flush=True)

    # warm
    connected_components(pairs).count()

    for steps in (1, 2, 3):
        stats: dict = {}

        def run(steps=steps, stats=stats):
            return connected_components(pairs, steps_per_cycle=steps, stats=stats).count()

        _timed(f"closure_steps{steps}", run)
        print(json.dumps({"variant": steps, "prop_steps": stats.get("rounds")}), flush=True)

    # cross-variant value identity (fixpoint is unique, but prove it)
    base = connected_components(pairs, steps_per_cycle=1)
    for steps in (2, 3):
        alt = connected_components(pairs, steps_per_cycle=steps)
        diff = base.withColumnRenamed("component", "c1").join(
            alt.withColumnRenamed("component", "c2"), "node"
        ).where(F.col("c1") != F.col("c2")).count()
        print(json.dumps({"variant": steps, "label_mismatches": diff}), flush=True)

    # host-factor reference (judge r10 quiet-host: 1.42 s)
    QUERIES["minhash_lsh"](spark, sf_dir).count()
    _timed("minhash_lsh_ref", lambda: QUERIES["minhash_lsh"](spark, sf_dir).count())
    # and the full gate at the new default
    QUERIES["dedup_clusters"](spark, sf_dir).count()
    _timed("dedup_clusters_gate", lambda: QUERIES["dedup_clusters"](spark, sf_dir).count())
    spark.stop()


if __name__ == "__main__":
    main()
