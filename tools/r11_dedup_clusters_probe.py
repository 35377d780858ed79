"""r11 VERDICT item 2 — adjudicate the `dedup_clusters` bench drift
(r1 4.79 s -> r9 5.0 -> r10 driver 6.2 / judge quiet-host 6.67).

Code-identity first (see PLANS.md r11): `git diff 1846766(r9-HEAD)..HEAD`
on the executed path (`llmdata/dedup.py` simhash/banding/closure kernels,
`suite_llm.py:q_dedup_clusters`, `runtime.py`, `session.py`) is
docstring-only — an r9-vs-r10 code A/B is vacuous by construction, so
this probe instead (a) reproduces the bench measurement exactly
(warm pass + min-of-3 `.count()`), (b) breaks the chain into its
stages to locate where the wall went, and (c) A/Bs the one session
knob that changed in r11 (io codec zstd vs lz4, via
SPARK_GRAFT_IO_CODEC) — run once per codec, one process per run
(codec is session-fixed).

Usage:  python tools/r11_dedup_clusters_probe.py [sf_dir]
Prints one JSON line per stage.
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
    dedup_clusters,
    simhash,
    simhash_neardup_pairs,
)
from transcriptomics_data_integration_spark.runtime import cleanup_persisted


def _timed(label: str, fn, reps: int = 3) -> float:
    best = float("inf")
    n = None
    for _ in range(reps):
        cleanup_persisted()
        time.sleep(0.05)
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": label, "sec": round(best, 3), "rows": n}), flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    codec = os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd")
    spark = get_spark("r11-dedup-clusters-probe")
    print(json.dumps({"probe": "dedup_clusters", "sf_dir": sf_dir, "codec": codec}), flush=True)

    docs_raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs_raw.select("doc_id", "text").unionByName(
        docs_raw.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )

    # warm (bench contract: untimed pass absorbs codegen/JIT)
    from transcriptomics_data_integration_spark.suite import QUERIES

    QUERIES["dedup_clusters"](spark, sf_dir).count()

    # (a) the bench row itself
    _timed("full_gate", lambda: QUERIES["dedup_clusters"](spark, sf_dir).count())

    # (b) stage breakdown (kernels, not the gate wrapper)
    _timed("digest_reps", lambda: (
        docs.withColumn("_dig", F.md5(F.col("text")))
        .withColumn("_rep", F.expr("min(doc_id) over (partition by _dig)"))
        .where(F.col("doc_id") == F.col("_rep"))
        .count()
    ))
    _timed("simhash_sigs", lambda: simhash(docs, "doc_id").count())
    pairs = lambda: simhash_neardup_pairs(docs, "doc_id", max_hamming=3, expand="star")
    _timed("star_pairs", lambda: pairs().count())
    _timed("closure", lambda: dedup_clusters(pairs().select("id_a", "id_b")).count())

    spark.stop()


if __name__ == "__main__":
    main()
