"""r10 probe: prefix-partitioned persisted index vs flat index for
the incremental dedup batch phase — does partition pruning cut the
per-batch wall time when the batch is small relative to the index?
(The r10 ladder measured incoming throughput halving as the kept
index grew; the pruned layout makes per-batch index I/O proportional
to the batch's key coverage.)

Usage: python tools/r10_pruned_index_probe.py [n_docs n_inc]
Prints JSON lines; paste into PLANS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark
from tools.r8b_ops_probe import synth_docs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("r10-pruned-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
        incremental_minhash_dedup_pruned,
        write_minhash_index_partitioned,
    )

    tmp = "/tmp/r10_pruned_probe"
    shutil.rmtree(tmp, ignore_errors=True)
    synth_docs(spark, n_docs, "l").repartition(cores).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/existing")
    existing = spark.read.parquet(f"{tmp}/existing")
    (
        spark.range(n_inc)
        .select((F.col("id") * (n_docs // n_inc)).alias("src_id"), F.col("id").alias("k"))
        .join(existing.select(F.col("doc_id").alias("src_id"), "text"), "src_id")
        .select(
            (F.col("src_id") + 10 * n_docs).alias("doc_id"),
            F.when(F.col("k") % 5 < 2, F.col("text"))
            .when(F.col("k") % 5 < 4, F.concat(F.col("text"), F.lit(" qq")))
            .otherwise(F.concat(F.lit("fresh-"), F.col("k"), F.lit("-novel-payload-row")))
            .alias("text"),
        )
        .repartition(cores)
        .write.mode("overwrite").parquet(f"{tmp}/incoming")
    )
    incoming = spark.read.parquet(f"{tmp}/incoming")

    index = build_minhash_index(existing, "doc_id")
    t0 = time.perf_counter()
    index.write.mode("overwrite").parquet(f"{tmp}/flat")
    t_flat = time.perf_counter() - t0
    t0 = time.perf_counter()
    write_minhash_index_partitioned(index, f"{tmp}/part")
    t_part = time.perf_counter() - t0
    print(json.dumps({"probe": "pruned_index_write", "n_docs": n_docs,
                      "flat_sec": round(t_flat, 1),
                      "partitioned_sec": round(t_part, 1)}), flush=True)

    def counts(df):
        return {r["verdict"]: r["n"] for r in
                df.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}

    # batch phase, flat index (min of 2)
    flat = spark.read.parquet(f"{tmp}/flat")
    best_flat, c_flat = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        c_flat = counts(incremental_minhash_dedup(
            None, incoming, "doc_id", existing_index=flat))
        dt = time.perf_counter() - t0
        best_flat = dt if best_flat is None else min(best_flat, dt)
        spark.catalog.clearCache()
    # batch phase, pruned index (min of 2)
    best_pr, c_pr = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        c_pr = counts(incremental_minhash_dedup_pruned(
            spark, incoming, f"{tmp}/part", "doc_id"))
        dt = time.perf_counter() - t0
        best_pr = dt if best_pr is None else min(best_pr, dt)
        spark.catalog.clearCache()
    print(json.dumps({"probe": "pruned_index_batch", "n_docs": n_docs,
                      "n_inc": n_inc, "flat_sec": round(best_flat, 1),
                      "pruned_sec": round(best_pr, 1),
                      "speedup": round(best_flat / best_pr, 2),
                      "verdicts_equal": c_flat == c_pr,
                      "verdicts": c_pr}), flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
