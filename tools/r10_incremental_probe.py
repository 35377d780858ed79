"""r10 scale probe (verdict item 5): the persisted-index incremental
dedup past the r9 1 M-doc row — confirm index-build linearity and
measure incoming-batch throughput against index size, SAME-SESSION
rungs so the ratios are host-band-free (the r9 lesson: never compare
wall-clock across days).

HOST BOUND, measured: the 5 M-doc index build's sort spill exceeds
this host's ~80 GB free tmp under lz4 (ENOSPC) AND under zstd (97%
disk before the build completed) — a single-host DISK bound, not an
algorithmic one: spill bytes scale linearly with the corpus and
distribute across executors' local disks on a cluster.  The ladder
tops out at 2.5 M here; the candidate/spill arithmetic per doc is
constant across rungs.

Same corpus generator and phase split as tools/r8b_ops_probe.py
(synth md5-keyed docs, 20% dup storms; incoming = n/5 with 40% exact
/ 40% near / 20% new), parquet-materialized for honest stats.

Run ONE rung per process: within a session, a finished rung's
shuffle files linger until the non-blocking cleaner gets to them, and
they starved the next rung's spill space (measured: rung 2 ENOSPC'd
with rung 1's ~50 GB still on disk).  Back-to-back processes on the
same host keep the ladder ratio honest.

Usage: python tools/r10_incremental_probe.py [n_docs ...]
Prints one JSON line per (rung, phase); paste into PLANS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.r8b_ops_probe import synth_docs


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1_000_000, 2_500_000]
    # zstd shuffle/spill compression: the 5 M index build's sort spill
    # exceeded this host's ~80 GB free under default lz4 (ENOSPC);
    # zstd cuts spill bytes ~35% at negligible CPU for this shape.
    # On a cluster the spill distributes across executors' local disks
    # — this is a single-host probe accommodation, recorded in
    # PLANS.md r10.  The session must be created HERE with the codec
    # (get_spark's getOrCreate would otherwise pin the default): same
    # configs as session.get_spark plus the codec.
    import os as _os

    from pyspark.sql import SparkSession

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r10-incremental-probe")
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
        build_minhash_index,
        incremental_minhash_dedup,
    )

    for n_docs in rungs:
        run_rung(spark, cores, n_docs, build_minhash_index,
                 incremental_minhash_dedup)


def run_rung(spark, cores, n_docs, build_minhash_index,
             incremental_minhash_dedup) -> None:
    tmp = "/tmp/r10_inc_probe"
    shutil.rmtree(tmp, ignore_errors=True)
    synth_docs(spark, n_docs, "l").repartition(cores).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/existing")
    existing = spark.read.parquet(f"{tmp}/existing")
    n_inc = n_docs // 5
    (
        spark.range(n_inc)
        .select((F.col("id") * 5).alias("src_id"), F.col("id").alias("k"))
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
        f"{tmp}/index"
    )
    t_index = time.perf_counter() - t0
    index = spark.read.parquet(f"{tmp}/index")
    print(json.dumps({"probe": f"r10_minhash_index_build_{n_docs}",
                      "sec": round(t_index, 1),
                      "docs_per_sec": int(n_docs / t_index)}), flush=True)

    t0 = time.perf_counter()
    out = incremental_minhash_dedup(
        None, incoming, "doc_id", existing_index=index
    )
    counts = {r["verdict"]: r["n"] for r in
              out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"r10_incremental_dedup_{n_docs}x{n_inc}",
                      "verdicts": counts, "sec": round(t, 1),
                      "incoming_docs_per_sec": int(n_inc / t)}), flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
