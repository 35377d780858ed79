"""r11 follow-up: WHERE does the per-batch wall go after the shuffle
levers?  The lever ladder still halves incoming docs/s as the index
grows 1M -> 2.5M (1,619 -> 822), so some index-LINEAR term survives.
Candidates: (a) the verify-arm prefilter's scan+decompress of the
stored sset column (big arrays, zstd), (b) the exact-arm digest scan,
(c) the band scan, (d) batch-side shingle/minhash work (index-
independent — the floor).

This probe builds ONE index at n_docs, keeps it on disk, and times:
  - batch_side: incoming signature pipeline alone (the floor)
  - exact_arm:  digest prefilter + groupBy + join, counted
  - cands:      band prefilter + candidate join, counted
  - full:       the whole kernel
  - full_500k:  the whole kernel on a 2.5x batch (amortization check:
                if docs/s RISES with batch size at fixed index, the
                index-linear term amortizes across bigger batches)

Usage: python tools/r11_batch_phase_probe.py [n_docs]   (default 2.5M)
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.r8b_ops_probe import synth_docs

TMP = "/tmp/r11_phase_probe"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    import os as _os

    from pyspark.sql import SparkSession

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r11-phase-probe")
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
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        N_BANDS,
        N_HASHES,
        SHINGLE_LEN,
        build_minhash_band_index,
        build_minhash_index,
        content_digest,
        hashed_shingles,
        incremental_minhash_dedup,
        shingles,
        _band_key64,
    )
    from transcriptomics_data_integration_spark.runtime import cleanup_persisted

    shutil.rmtree(TMP, ignore_errors=True)
    synth_docs(spark, n_docs, "l").repartition(cores).write.parquet(f"{TMP}/existing")
    existing = spark.read.parquet(f"{TMP}/existing")

    def make_incoming(n_inc: int, path: str):
        (
            spark.range(n_inc)
            .select((F.col("id") * (n_docs // n_inc)).alias("src_id"),
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
            .write.parquet(f"{TMP}/{path}")
        )
        return spark.read.parquet(f"{TMP}/{path}")

    inc200 = make_incoming(200_000, "inc200")
    inc500 = make_incoming(500_000, "inc500")

    t0 = time.perf_counter()
    build_minhash_index(existing, "doc_id").write.parquet(f"{TMP}/index_docs")
    index = spark.read.parquet(f"{TMP}/index_docs")
    build_minhash_band_index(index).write.parquet(f"{TMP}/index_bands")
    bands = spark.read.parquet(f"{TMP}/index_bands")
    print(json.dumps({"phase": "index_build", "sec": round(time.perf_counter() - t0, 1),
                      "n_docs": n_docs}), flush=True)

    def timed(label, fn):
        cleanup_persisted()
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"phase": label, "sec": round(time.perf_counter() - t0, 1),
                          "rows": n}), flush=True)

    # the index-independent floor: incoming signature pipeline alone
    def batch_side():
        sh = shingles(inc200.select("doc_id", "text"), "doc_id", "text", SHINGLE_LEN)
        hashed = hashed_shingles(sh, N_HASHES, strategy="inline")
        sigs = hashed.groupBy("doc_id").agg(
            *[F.min(f"h{j}").alias(f"m{j}") for j in range(N_HASHES)],
            F.collect_set("sid").alias("sset"),
        )
        return sigs.count()

    timed("batch_side_sigs", batch_side)

    # exact arm alone (prefilter + groupBy + join)
    def exact_arm():
        inc = inc200.select(
            F.col("doc_id").alias("inc_id"),
            content_digest(F.col("text")).alias("digest"),
        )
        inc_d64 = inc.select(F.xxhash64("digest").alias("_d64")).distinct()
        ex_docs = index.join(
            F.broadcast(inc_d64),
            F.xxhash64(index["digest"]) == F.col("_d64"), "left_semi",
        )
        ex_digest = ex_docs.groupBy("digest").agg(F.min("ex_id").alias("matched_id"))
        return inc.join(ex_digest, "digest").count()

    timed("exact_arm", exact_arm)

    # candidate arm alone (batch sigs cached -> band prefilter + join)
    def cand_arm():
        sh = shingles(inc200.select("doc_id", "text"), "doc_id", "text", SHINGLE_LEN)
        hashed = hashed_shingles(sh, N_HASHES, strategy="inline")
        sigs = hashed.groupBy("doc_id").agg(
            *[F.min(f"h{j}").alias(f"m{j}") for j in range(N_HASHES)],
        ).cache()
        inc_bands = _band_key64(sigs, "doc_id", N_HASHES, N_BANDS)
        inc_keys = inc_bands.select("bk64").distinct()
        ex_b = bands.join(F.broadcast(inc_keys), "bk64", "left_semi")
        n = (
            inc_bands.withColumnRenamed("doc_id", "inc_id")
            .join(ex_b, "bk64").select("inc_id", "ex_id").distinct().count()
        )
        sigs.unpersist()
        return n

    timed("cand_arm", cand_arm)

    # the verify-arm index scan alone: semi-filter the sset column by a
    # token candidate set (forces the full docs scan incl. sset bytes)
    def verify_scan():
        some = index.select("ex_id").limit(100_000).cache()
        some.count()
        n = index.select("ex_id", "sset").join(
            F.broadcast(some), "ex_id", "left_semi"
        ).select(F.sum(F.size("sset"))).collect()[0][0]
        some.unpersist()
        return int(n)

    timed("verify_scan_sset", verify_scan)

    for label, inc, n_inc in (("full_200k", inc200, 200_000),
                              ("full_500k", inc500, 500_000)):
        t0 = time.perf_counter()
        out = incremental_minhash_dedup(
            None, inc, "doc_id", existing_index=index, index_bands=bands
        )
        counts = {r["verdict"]: r["n"] for r in
                  out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
        t = time.perf_counter() - t0
        print(json.dumps({"phase": label, "verdicts": counts, "sec": round(t, 1),
                          "incoming_docs_per_sec": int(n_inc / t)}), flush=True)
        cleanup_persisted()

    shutil.rmtree(TMP, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
