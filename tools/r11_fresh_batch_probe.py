"""r11 — clean-session ladder for the lever'd incremental dedup: the
in-process build contaminates the batch measurement (the rung-2 843-s
build left shuffle/GC state that DOUBLED the same batch's wall:
243 s in-process vs 120 s settled, tools/r11_batch_phase_probe.py),
so this tool splits the rung into TWO processes:

  mode=build  — synth corpus + incoming batch + both index relations
                written under /tmp/r11_fresh_<n>; exits.
  mode=batch  — fresh session reads the stored index and times ONLY
                incremental_minhash_dedup on the fixed 200k batch.

Run:  python tools/r11_fresh_batch_probe.py build 1000000
      python tools/r11_fresh_batch_probe.py batch 1000000
      (same pair at 2500000; compare the two batch rows)
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


def get_session(name: str):
    import os as _os

    from pyspark.sql import SparkSession

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
    return spark


def main() -> None:
    mode = sys.argv[1]
    n_docs = int(sys.argv[2])
    tmp = f"/tmp/r11_fresh_{n_docs}"
    spark = get_session(f"r11-fresh-{mode}")
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        build_minhash_band_index,
        build_minhash_index,
        incremental_minhash_dedup,
    )

    if mode == "build":
        shutil.rmtree(tmp, ignore_errors=True)
        synth_docs(spark, n_docs, "l").repartition(cores).write.parquet(
            f"{tmp}/existing"
        )
        existing = spark.read.parquet(f"{tmp}/existing")
        (
            spark.range(BATCH)
            .select((F.col("id") * (n_docs // BATCH)).alias("src_id"),
                    F.col("id").alias("k"))
            .join(existing.select(F.col("doc_id").alias("src_id"), "text"), "src_id")
            .select(
                (F.col("src_id") + 10 * n_docs).alias("doc_id"),
                F.when(F.col("k") % 5 < 2, F.col("text"))
                .when(F.col("k") % 5 < 4, F.concat(F.col("text"), F.lit(" qq")))
                .otherwise(F.concat(F.lit("fresh-"), F.col("k"),
                                    F.lit("-novel-payload-row")))
                .alias("text"),
            )
            .repartition(cores)
            .write.parquet(f"{tmp}/incoming")
        )
        t0 = time.perf_counter()
        build_minhash_index(existing, "doc_id").write.parquet(f"{tmp}/index_docs")
        index = spark.read.parquet(f"{tmp}/index_docs")
        build_minhash_band_index(index).write.parquet(f"{tmp}/index_bands")
        print(json.dumps({"probe": f"build_{n_docs}",
                          "sec": round(time.perf_counter() - t0, 1)}), flush=True)
    elif mode == "batch":
        # THREE reps: rep 0 is cold-cache (the build's tens of GB of
        # spill evicted the written files from the page cache — a
        # single-host artifact: a cluster reads its stored index at
        # aggregate disk bandwidth every time), reps 1-2 are warm —
        # the number comparable across rungs and to the phase probe.
        from transcriptomics_data_integration_spark.runtime import (
            cleanup_persisted,
        )

        incoming = spark.read.parquet(f"{tmp}/incoming")
        index = spark.read.parquet(f"{tmp}/index_docs")
        bands = spark.read.parquet(f"{tmp}/index_bands")
        for rep in range(3):
            cleanup_persisted()
            t0 = time.perf_counter()
            out = incremental_minhash_dedup(
                None, incoming, "doc_id", existing_index=index, index_bands=bands
            )
            counts = {r["verdict"]: r["n"] for r in
                      out.groupBy("verdict").agg(
                          F.count(F.lit(1)).alias("n")).collect()}
            t = time.perf_counter() - t0
            print(json.dumps({"probe": f"fresh_batch_{n_docs}x{BATCH}",
                              "rep": rep, "verdicts": counts, "sec": round(t, 1),
                              "incoming_docs_per_sec": int(BATCH / t)}), flush=True)
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
