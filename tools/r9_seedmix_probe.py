"""r9 seed-family A/B probe: re-measure the two minhash hot paths that
PLANS.md r8b recorded under the old 16-md5-per-shingle recipe —
`build_minhash_index` (578.2 s / 1,729 docs/s at 1 M docs) and the
incremental batch against the stored index (314.9 s / 635 docs/s for
200 k incoming) — after the r9 md5-lane family
(llmdata/dedup.py:_minhash_words; final form: four 30-bit lanes per
md5, ceil(n/4) md5 + ceil(n/2) conv calls).

History this probe is the evidence for: the FIRST r9 attempt was a
Kirsch-Mitzenmacher arithmetic mix (one md5, h_j = (h1 + j*h2) mod
2^60).  Its index build measured 320.3 s — but h_j affine in j
order-correlates the rows of a band, band match probability collapses
from J^4 toward J on non-storm corpora, and THIS PROBE's incremental
phase exploded (candidate fan-out -> shuffle ENOSPC, then a stuck
verify stage) while every dup-storm-shaped GATE stayed green.  The
lane families keep independent bits per seed, so banding math is
unchanged by construction.  The intermediate two-60-bit-lane variant
measured 704.9 s / 351.7 s on this host; the shipped 30-bit family
455.4 s / 177.2 s (PLANS.md r9 has the full ladder).

Usage: python tools/r9_seedmix_probe.py [n_docs]
Prints one JSON line per probe; paste into PLANS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark
from r8b_ops_probe import synth_docs  # same corpus, same dup plant


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("r9-seedmix-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
    )

    tmp = "/tmp/r9_seedmix_probe"
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
            .otherwise(
                F.concat(F.lit("fresh-"), F.col("k"), F.lit("-novel-payload-row"))
            )
            .alias("text"),
        )
        .repartition(cores)
        .write.mode("overwrite")
        .parquet(f"{tmp}/incoming")
    )
    incoming = spark.read.parquet(f"{tmp}/incoming")

    t0 = time.perf_counter()
    build_minhash_index(existing, "doc_id").write.mode("overwrite").parquet(
        f"{tmp}/index"
    )
    t_index = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"r9_seedmix_index_build_{n_docs}",
                "sec": round(t_index, 1),
                "docs_per_sec": int(n_docs / t_index),
                "r8_recipe_sec_at_1M": 578.2,
            }
        ),
        flush=True,
    )

    index = spark.read.parquet(f"{tmp}/index")
    t0 = time.perf_counter()
    out = incremental_minhash_dedup(None, incoming, "doc_id", existing_index=index)
    counts = {
        r["verdict"]: r["n"]
        for r in out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"r9_seedmix_incremental_{n_docs}x{n_inc}",
                "verdicts": counts,
                "sec": round(t, 1),
                "incoming_docs_per_sec": int(n_inc / t),
                "r8_recipe_sec_at_1M": 314.9,
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
