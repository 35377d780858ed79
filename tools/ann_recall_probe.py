"""IVF recall-vs-probe-budget sweep (r6, PLANS.md): recall@5 of
`ivf_fixed_topk` against the exact cosine top-5 for n_probe in
{1, 2, 4, 8, 16} — the reproducible source of the PLANS table and the
measurement behind the `ann_recall` driver gate's fixed (16 cells,
2 probes) operating point.

Usage: python tools/ann_recall_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from transcriptomics_data_integration_spark.llmdata.similarity import (
        cosine_topk,
        ivf_fixed_topk,
    )
    from transcriptomics_data_integration_spark.session import get_spark

    spark = get_spark("ann-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 10 == 0)
    n_q = q.count()
    exact = cosine_topk(emb, q, k=5).select("query_id", "cand_id").cache()
    exact.count()
    for n_probe in (1, 2, 4, 8, 16):
        ivf = ivf_fixed_topk(emb, q, k=5, n_cells=16, n_probe=n_probe).select(
            "query_id", "cand_id"
        )
        hits = ivf.join(exact, ["query_id", "cand_id"]).count()
        print(
            json.dumps(
                {
                    "n_probe": n_probe,
                    "n_queries": n_q,
                    "recall_at_5": round(hits / (n_q * 5), 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
