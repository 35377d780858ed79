"""Scale probes for the second r8 operator wave (incremental dedup,
chunking, DSIR, Kneser-Ney) over SYNTHETIC in-plan corpora — measure
wall-clock + output sizes at sizes far above the gate SFs.

Usage: python tools/r8b_ops_probe.py [n_docs]
Prints one JSON line per probe; paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def synth_docs(spark, n_docs, prefix, n_tok=80, vocab=5000):
    """~n_tok-token docs over a bounded vocabulary; 20% exact dups of
    the previous doc (dup storms), deterministic content.  Token choice
    is md5-keyed — an affine stream like (a*doc + b*i) % vocab aliases
    across docs (shifted windows share long runs), which plants ~1M
    unintended genuine near-dup pairs at 50k docs."""
    body = (
        f"array_join(transform(sequence(1, {n_tok}), "
        f"i -> concat('w', CAST(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % {vocab} AS STRING))), ' ')"
    )
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.expr(
                # every 5th doc copies its predecessor's text
                body.replace("doc_id", "(CASE WHEN doc_id % 5 = 0 AND doc_id > 0 "
                             "THEN doc_id - 1 ELSE doc_id END)")
            ).alias("text"),
            (F.col("doc_id") % 4).cast("string").alias("lang"),
        )
        .withColumn("lang", F.concat(F.lit(prefix), F.col("lang")))
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("r8b-ops-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from transcriptomics_data_integration_spark.llmdata.dedup import (
        incremental_minhash_dedup,
    )
    from transcriptomics_data_integration_spark.llmdata.sampling import (
        dsir_logweights,
    )
    from transcriptomics_data_integration_spark.llmdata.text import (
        chunk_documents,
        kneser_ney_logprob,
    )

    # -- incremental dedup: kept corpus n_docs, incoming n_docs/5 with
    # 40% exact copies, 40% near (appended token), 20% new.
    # Corpora are MATERIALIZED to /tmp parquet and read back: in-plan
    # spark.range relations carry near-zero Catalyst size estimates,
    # which mis-plan million-row dims as broadcasts (measured r8:
    # maxResultSize abort at 1 M docs) — parquet scans carry honest
    # stats, like any real deployment.
    import shutil
    tmp = "/tmp/r8b_probe"
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
    # phase 1 (one-time, amortized in production): build + persist the
    # content index of the kept corpus
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        build_minhash_index,
    )
    t0 = time.perf_counter()
    build_minhash_index(existing, "doc_id").write.mode("overwrite").parquet(
        f"{tmp}/index"
    )
    t_index = time.perf_counter() - t0
    index = spark.read.parquet(f"{tmp}/index")
    print(json.dumps({"probe": f"minhash_index_build_{n_docs}",
                      "sec": round(t_index, 1),
                      "docs_per_sec": int(n_docs / t_index)}), flush=True)
    # phase 2 (per crawl batch): dedupe incoming against the stored index
    t0 = time.perf_counter()
    out = incremental_minhash_dedup(
        None, incoming, "doc_id", existing_index=index
    )
    counts = {r["verdict"]: r["n"] for r in
              out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"incremental_dedup_{n_docs}x{n_inc}",
                      "verdicts": counts, "sec": round(t, 1),
                      "incoming_docs_per_sec": int(n_inc / t)}), flush=True)

    # -- chunking at n_docs (80 tokens -> 6 chunks/doc at 16/12)
    t0 = time.perf_counter()
    n_chunks = chunk_documents(existing, "doc_id", chunk_tokens=16, stride=12).count()
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"doc_chunks_{n_docs}", "chunks": n_chunks,
                      "sec": round(t, 1), "docs_per_sec": int(n_docs / t)}), flush=True)

    # -- DSIR at n_docs (target = lang suffix 0, 1024 buckets)
    t0 = time.perf_counter()
    w = dsir_logweights(
        existing.withColumn("_tgt", F.col("lang") == "l0"), "doc_id", "_tgt"
    )
    n_w = w.count()
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"dsir_{n_docs}", "rows": n_w,
                      "sec": round(t, 1), "docs_per_sec": int(n_docs / t)}), flush=True)

    # -- Kneser-Ney at n_docs (bounded vocab -> bounded bigram types)
    t0 = time.perf_counter()
    n_kn = kneser_ney_logprob(existing, "doc_id").count()
    t = time.perf_counter() - t0
    print(json.dumps({"probe": f"kneser_ney_{n_docs}", "rows": n_kn,
                      "sec": round(t, 1), "docs_per_sec": int(n_docs / t)}), flush=True)


if __name__ == "__main__":
    main()
