"""leakage_safe_split at dedup scale (r6 verdict item 7): the driver
gate's cost is the SimHash-pairs -> CC chain it deliberately re-runs;
the OPERATOR's own claim — cluster-atomic membership at corpus scale —
deserves its own probe.  This drives the split over a PRE-CLUSTERED
50 M-doc corpus shaped like the post-CC state of the r6 cc_chain_probe
(mega-clique + 1000-member exact cliques + 200-member near-dup
clusters + singletons), generated in-plan so no CC re-run is paid,
and verifies:

- atomicity: no cluster_key carries both 'train' and 'val' members
  (one aggregation over the split output);
- determinism: the val fraction matches the md5-keyed expectation at
  the CLUSTER level (hashing is per cluster, so doc-level fraction
  skews toward big clusters' side — that skew is the design, not a
  bug, and is printed);
- rate: docs/s through the join + hash assignment.

Usage: python tools/leakage_split_probe.py [N_docs]
Prints one JSON line per phase; paste into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from transcriptomics_data_integration_spark.llmdata.sampling import leakage_safe_split


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    mega = 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("leakage-split-probe")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_exact = n_docs // 5
    n_near = (n_docs * 2) // 5
    b2 = mega + n_exact
    b3 = mega + n_exact + n_near
    # post-CC cluster table, in-plan (component = min member id):
    # the same clique structure the r6 cc_chain_probe's CC output had
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    clusters = docs.select(
        "doc_id",
        F.expr(
            f"""CASE
            WHEN doc_id < {mega} THEN CAST(0 AS BIGINT)
            WHEN doc_id < {b2} THEN (doc_id DIV 1000) * 1000
            WHEN doc_id < {b3} THEN (doc_id DIV 200) * 200
            ELSE doc_id END"""
        ).alias("canonical_id"),
    )

    t0 = time.perf_counter()
    out = leakage_safe_split(docs, clusters, "doc_id", val_frac=0.1)
    # atomicity + fractions in ONE pass over the split output
    agg = out.groupBy("cluster_key").agg(
        F.countDistinct("split").alias("n_sides"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.when(F.col("split") == "val", 1).otherwise(0)).alias("is_val"),
    )
    row = agg.agg(
        F.max("n_sides").alias("max_sides_per_cluster"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("is_val").alias("n_val_clusters"),
        F.sum(F.when(F.col("is_val") == 1, F.col("n_docs"))).alias("n_val_docs"),
        F.sum("n_docs").alias("n_docs"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"leakage_split_preclustered_{n_docs}",
                "sec": round(sec, 1),
                "docs_per_sec": int(n_docs / sec),
                "max_sides_per_cluster": row["max_sides_per_cluster"],
                "atomic": row["max_sides_per_cluster"] == 1,
                "n_clusters": row["n_clusters"],
                "val_cluster_frac": round(
                    row["n_val_clusters"] / row["n_clusters"], 5
                ),
                "val_doc_frac": round(row["n_val_docs"] / row["n_docs"], 5),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
