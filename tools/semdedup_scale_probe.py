"""SemDeDup scale probe: measured evidence that the cell-bounded
pair sweep stays linear-ish when cells scale with the corpus.

Generates N 64-dim vectors executor-side (deterministic per-id hash
mixing, ~1% planted near-dup twins), runs `semdedup` with n_cells
sized so E[|cell|] stays ~constant, and reports per-phase wall +
shuffle totals from the Spark status API.

Usage: python tools/semdedup_scale_probe.py [n_vecs] [n_cells] [tiers]

``tiers`` is a comma list of jvm, arrow, jvm2, arrow2 (default
"jvm,arrow" — the r5 behavior).  jvm2/arrow2 are the two-level
coarse-quantizer tiers (r6): assignment n*O(sqrt(k))*d instead of
n*k*d, the billion-scale path.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else max(16, n_vecs // 2000)

    from pyspark.sql import functions as F

    from transcriptomics_data_integration_spark.llmdata.similarity import semdedup
    from transcriptomics_data_integration_spark.session import get_spark

    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic 64-dim vectors via md5-free integer mixing (codegen):
    # component d of vector i = fractional hash of (i, d) in [-1, 1)
    base = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> "
            "CAST((pmod(hash(id, d), 10007) - 5003) / 5003.0 AS FLOAT))"
        ).alias("embedding"),
    )
    # ~1% planted twins: ids >= n_vecs are perturbed copies of id % n_vecs
    twins = (
        spark.range(n_vecs // 100)
        .select((F.col("id") * 97 % n_vecs).alias("src"))
        .distinct()
        .select(
            (F.col("src") + n_vecs).alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> "
                "CAST((pmod(hash(src, d), 10007) - 5003) / 5003.0 + 1.0e-4 AS FLOAT))"
            ).alias("embedding"),
        )
    )
    corpus = base.unionByName(twins)

    from transcriptomics_data_integration_spark.llmdata.similarity import (
        semdedup_2level,
        semdedup_arrow,
        semdedup_arrow_2level,
    )

    tier_fns = {
        "jvm": ("jvm_fold", semdedup),
        "arrow": ("arrow_blas", semdedup_arrow),
        "jvm2": ("jvm_2level", semdedup_2level),
        "arrow2": ("arrow_2level", semdedup_arrow_2level),
    }
    tiers = (sys.argv[3] if len(sys.argv) > 3 else "jvm,arrow").split(",")
    for name, fn in (tier_fns[t.strip()] for t in tiers):
        t0 = time.perf_counter()
        out = fn(corpus, n_cells=n_cells, tau=0.95)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "path": name,
                    "n_vecs": agg["n"],
                    "n_cells": n_cells,
                    "kept": agg["kept"],
                    "dropped": agg["n"] - agg["kept"],
                    "wall_sec": round(wall, 2),
                    "vecs_per_sec": int(agg["n"] / wall),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
