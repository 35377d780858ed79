"""SimHash star-compression A/B (r8, verdict item 6): drive
simhash_neardup_pairs -> dedup_clusters over a SYNTHETIC in-plan
dup-storm corpus and measure edges + wall time for expand='star'
vs expand='all', plus closure-identity (same cluster map) at a size
where 'all' is still feasible.

Corpus (one row per doc id in [0, N)):
- [0, storm)            one exact-dup storm (identical text)
- next 20% of N         100-member exact-dup cliques
- next 20% of N         near-dup token variants (hamming-close)
- rest                  unique singletons

Usage: python tools/simhash_star_probe.py [N] [storm]
Prints one JSON line per arm; paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.llmdata.dedup import (
    dedup_clusters,
    simhash_neardup_pairs,
)
from transcriptomics_data_integration_spark.session import get_spark


def corpus(spark, n: int, storm: int):
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    c1 = int(n * 0.2)
    c2 = int(n * 0.4)
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") < storm, F.lit("the same storm document text"))
        .when(
            F.col("doc_id") < storm + c1,
            F.concat(F.lit("clique "), ((F.col("doc_id") - storm) / 100).cast("bigint").cast("string"),
                     F.lit(" shared body of tokens here")),
        )
        .when(
            F.col("doc_id") < storm + c2,
            F.concat(
                F.lit("near dup family "),
                ((F.col("doc_id") - storm - c1) / 50).cast("bigint").cast("string"),
                F.lit(" common run of words "),
                (F.col("doc_id") % 3).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("unique doc "), F.col("doc_id").cast("string"))),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    storm = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("simhash-star-probe")
    docs = corpus(spark, n, storm).localCheckpoint(eager=True)
    results = {}
    for mode in ("star", "all"):
        t0 = time.time()
        pairs = simhash_neardup_pairs(docs, "doc_id", max_hamming=3, expand=mode)
        n_edges = pairs.count()
        t_pairs = time.time() - t0
        t0 = time.time()
        cl = dedup_clusters(pairs.select("id_a", "id_b"))
        agg = cl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_id").alias("n_clusters"),
            F.sum(F.expr("hash(doc_id, canonical_id)")).alias("chk"),
        ).collect()[0]
        t_cc = time.time() - t0
        results[mode] = {
            "edges": n_edges,
            "pairs_sec": round(t_pairs, 2),
            "closure_sec": round(t_cc, 2),
            "clustered_docs": agg["n_docs"],
            "clusters": agg["n_clusters"],
            "closure_checksum": int(agg["chk"]),
        }
        print(json.dumps({"mode": mode, "n": n, "storm": storm, **results[mode]}))
    same = (
        results["star"]["closure_checksum"] == results["all"]["closure_checksum"]
        and results["star"]["clustered_docs"] == results["all"]["clustered_docs"]
        and results["star"]["clusters"] == results["all"]["clusters"]
    )
    print(json.dumps({"closure_identical": same,
                      "edge_ratio": round(results["all"]["edges"] / max(1, results["star"]["edges"]), 2)}))


if __name__ == "__main__":
    main()
