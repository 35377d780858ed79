"""r12 — stage-level breakdown of corpus_pipeline (+ the suspect rows
semdedup_2level, minhash_accuracy) at sf0.1, per VERDICT r11 item 4:
the driver measured corpus_pipeline 14.5 s @32c / 11.9 s @8c vs 6.5 s
in r10 — elevated at BOTH core counts, i.e. more than host drift.

Times each stage of the corpus_pipeline chain with a count() action
(min-of-reps, bench session), plus calibration rows so the window is
interpretable.  Usage: python tools/r12_corpus_stage_probe.py [sf_dir] [reps]
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
    spark = get_spark("r12-corpus-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from transcriptomics_data_integration_spark.suite import QUERIES
    from transcriptomics_data_integration_spark.suite_llm import _t, _two_crawls
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        connected_components,
        dedup_clusters,
        keep_best_per_cluster,
        simhash_neardup_pairs,
    )
    from transcriptomics_data_integration_spark.llmdata.text import quality_filter
    from transcriptomics_data_integration_spark.runtime import register_persisted

    def timed(label: str, fn) -> float:
        best, n = float("inf"), None
        for _ in range(reps):
            spark._jvm.System.gc()
            time.sleep(0.05)
            t0 = time.perf_counter()
            n = fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(json.dumps({"stage": label, "sec": round(best, 3), "rows": n}), flush=True)
        return best

    # calibration first (host window check)
    for q in ("gene_stats", "dedup_exact", "pricing_summary", "sessionize"):
        timed(f"cal:{q}", lambda q=q: QUERIES[q](spark, sf_dir).count())

    # stage chain (each stage includes its upstream, so deltas are the
    # per-stage costs; persists mirror q_corpus_pipeline exactly)
    def run_upto(stage: str, steps_per_cycle: int = 2) -> int:
        docs = _two_crawls(_t(spark, sf_dir, "documents"), parallelize=False)
        kept_docs = (
            quality_filter(docs).where(F.col("keep")).select("doc_id", "text").persist()
        )
        register_persisted(kept_docs)
        if stage == "kept":
            return kept_docs.count()
        pairs = simhash_neardup_pairs(kept_docs, "doc_id", max_hamming=3, expand="star")
        if stage == "pairs":
            return pairs.count()
        cc = connected_components(
            pairs.select("id_a", "id_b"), steps_per_cycle=steps_per_cycle
        )
        from pyspark.sql import Window

        clusters = cc.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            F.count(F.lit(1)).over(Window.partitionBy("component")).alias("cluster_size"),
        )
        if stage == "clusters":
            return clusters.count()
        survivors = keep_best_per_cluster(
            kept_docs, clusters, "doc_id", score=F.length("text").cast("long")
        )
        if stage == "survivors":
            return survivors.count()
        out = survivors.join(
            kept_docs.select(F.col("doc_id").alias("kept_id"), "text"), "kept_id"
        )
        toks = F.split(F.trim(F.col("text")), " ")
        return out.select(
            "kept_id",
            "cluster_key",
            "cluster_size",
            "kept_score",
            F.size(toks).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        ).count()

    for stage in ("kept", "pairs", "clusters", "survivors", "full"):
        timed(f"corpus:{stage}", lambda s=stage: run_upto(s))
    for spc in (1, 2, 3):
        timed(f"corpus:clusters:steps={spc}", lambda s=spc: run_upto("clusters", s))

    # the two suspect rows, as-benched
    for q in ("semdedup_2level", "minhash_accuracy", "corpus_pipeline", "dedup_clusters"):
        timed(f"query:{q}", lambda q=q: QUERIES[q](spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
