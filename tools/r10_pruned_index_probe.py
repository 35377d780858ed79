"""r10 probe: prefix-partitioned persisted index vs flat index for
the incremental dedup batch phase — REJECTED lever (kept as the
measured negative; the implementation was removed from dedup.py).

Hypothesis: partition the stored index by content-key prefixes so a
batch's own keys prune the scan (turning the per-batch index read
from O(index) into O(matching buckets)).  Measured (250k index,
min-of-2, verdicts identical to the flat kernel):

  - 5k-doc batch:  flat 9.3 s, pruned 29.7 s (0.31x)
  - 200-doc batch: flat 6.8 s, pruned 11.5 s (0.59x)
  - partitioned write itself 2-3.4x the flat write

Cause: content hashes are UNIFORM, so a batch's key-prefix coverage
saturates the partition space at any realistic batch size (5k docs
cover all 256 digest dirs and ~all 1024 band dirs; even 200 docs
cover ~55%), while the layout pays 1,280 small-file dirs and
n_bands x duplicated verify sets.  Parquet min/max row-group skipping
is equally useless on uniform keys.  The remaining honest levers for
the per-batch index-size component are shuffle-side, not scan-side:
bucket the stored band relation BY band_key so the index side joins
without a shuffle (r11 candidate), and/or a broadcast bloom of batch
digests to pre-filter the index scan's exact arm.

This run happens to also re-demonstrate the NEED the probe was
aimed at (the r10 ladder's index-size component) — rejection of one
lever does not close the item, it names the next two.

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

    try:
        from transcriptomics_data_integration_spark.llmdata.dedup import (
            build_minhash_index,
            incremental_minhash_dedup,
            incremental_minhash_dedup_pruned,
            write_minhash_index_partitioned,
        )
    except ImportError:
        print(json.dumps({"probe": "pruned_index", "status":
                          "lever rejected and removed; numbers above are "
                          "the recorded measurement"}))
        return

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
