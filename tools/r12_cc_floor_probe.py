"""r12 — decompose the CC closure's per-cycle fixed cost (VERDICT r11
item 5).  Pins the sf0.1 two-crawl SimHash edge list once (checkpoint),
then times connected_components under toggles in ONE session:
shuffle-partition count (32 vs 1 via repartition of the inputs), AQE
on/off is session-level so probed via env in separate runs if needed.

Usage: python tools/r12_cc_floor_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r12-cc-floor")
    spark.sparkContext.setLogLevel("ERROR")

    from transcriptomics_data_integration_spark.suite_llm import _t, _two_crawls
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        connected_components,
        simhash_neardup_pairs,
    )

    docs = _two_crawls(_t(spark, sf_dir, "documents"))
    pairs = (
        simhash_neardup_pairs(docs, "doc_id", max_hamming=3, expand="star")
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_edges = pairs.count()
    print(f"edges={n_edges}")

    def timed(label, fn):
        best = float("inf")
        stats = {}
        for _ in range(reps):
            spark._jvm.System.gc()
            time.sleep(0.05)
            t0 = time.perf_counter()
            n = fn(stats)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": label, "sec": round(best, 3),
                          "rows": n, "rounds": stats.get("rounds")}), flush=True)

    for spc in (1, 2, 3, 4):
        timed(f"steps={spc}", lambda st, s=spc: connected_components(
            pairs, steps_per_cycle=s, stats=st).count())

    # single-partition inputs: does the per-cycle cost drop when every
    # shuffle/join runs 1 task?  (repartition(1) once, outside the loop)
    p1 = pairs.repartition(1).localCheckpoint(eager=True)
    p1.count()
    for spc in (2,):
        timed(f"steps={spc}+edges@1part", lambda st, s=spc: connected_components(
            p1, steps_per_cycle=s, stats=st).count())

    spark.stop()


if __name__ == "__main__":
    main()
