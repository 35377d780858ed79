"""r11 VERDICT item 1 — re-run the incremental-dedup ladder with the
two levers shipped this round (broadcast digest-bloom prefilter on the
exact arm; pre-exploded persisted band index + broadcast band-key /
candidate-id prefilters on the near arm) and show incoming docs/s
~FLAT in index size.

Key difference from the r10 ladder: the incoming batch is a FIXED
200k docs at every rung, so the per-batch wall isolates the
index-size term (the r10 ladder grew the batch with the rung, which
conflated the two).  Composition matches r10: 40% exact / 40% near /
20% new.

The persisted index is TWO parquet relations (docs: digest+sigs+sset;
bands: pre-exploded (ex_id, bk64)) — the band explode is paid once at
build, never per batch.  zstd io codec (disk-tight single host,
PLANS.md r10/r11: probe sessions only, NOT the session default — it
measured 29% slower on the closure-heavy bench gates).

Run ONE rung per process (r10 lesson: a finished rung's shuffle files
linger and starve the next rung's spill space).

Usage: python tools/r11_incremental_probe.py [n_docs ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.r8b_ops_probe import synth_docs

BATCH = 200_000


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1_000_000, 2_500_000]
    import os as _os

    from pyspark.sql import SparkSession

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r11-incremental-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", _os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.cleaner.referenceTracking.blocking", "false")
        .config("spark.io.compression.codec", "zstd")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        build_minhash_band_index,
        build_minhash_index,
        incremental_minhash_dedup,
    )

    for n_docs in rungs:
        run_rung(spark, cores, n_docs, build_minhash_index,
                 build_minhash_band_index, incremental_minhash_dedup)


def run_rung(spark, cores, n_docs, build_minhash_index,
             build_minhash_band_index, incremental_minhash_dedup) -> None:
    tmp = "/tmp/r11_inc_probe"
    shutil.rmtree(tmp, ignore_errors=True)
    synth_docs(spark, n_docs, "l").repartition(cores).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/existing")
    existing = spark.read.parquet(f"{tmp}/existing")
    n_inc = BATCH
    (
        spark.range(n_inc)
        .select((F.col("id") * (n_docs // n_inc)).alias("src_id"),
                F.col("id").alias("k"))
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

    t0 = time.perf_counter()
    build_minhash_index(existing, "doc_id").write.mode("overwrite").parquet(
        f"{tmp}/index_docs"
    )
    index = spark.read.parquet(f"{tmp}/index_docs")
    build_minhash_band_index(index).write.mode("overwrite").parquet(
        f"{tmp}/index_bands"
    )
    t_index = time.perf_counter() - t0
    bands = spark.read.parquet(f"{tmp}/index_bands")
    print(json.dumps({"probe": f"r11_minhash_index_build_{n_docs}",
                      "sec": round(t_index, 1),
                      "docs_per_sec": int(n_docs / t_index)}), flush=True)

    t0 = time.perf_counter()
    out = incremental_minhash_dedup(
        None, incoming, "doc_id", existing_index=index, index_bands=bands
    )
    counts = {r["verdict"]: r["n"] for r in
              out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"r11_incremental_dedup_{n_docs}x{n_inc}",
                      "verdicts": counts, "sec": round(t, 1),
                      "incoming_docs_per_sec": int(n_inc / t)}), flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
