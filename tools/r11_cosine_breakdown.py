"""Stage breakdown of q_cosine_topk at sf0.1 (min-of-3 per stage)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    from transcriptomics_data_integration_spark.llmdata.similarity import (
        _dot,
        _norm2,
    )
    from transcriptomics_data_integration_spark.session import get_spark

    spark = get_spark("r11_cosine_breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def t(label, mk):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            mk().count()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {min(ts):.2f}s  {[round(x,2) for x in ts]}")

    def pairs():
        q = emb.where(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            F.sqrt(_norm2("embedding")).alias("q_norm"),
        )
        c = emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_vec"),
            F.sqrt(_norm2("embedding")).alias("c_norm"),
        )
        return (
            q.where(F.col("q_norm") > 0)
            .crossJoin(c.where(F.col("c_norm") > 0))
            .where(F.col("query_id") != F.col("cand_id"))
        )

    t("pairs only (crossJoin)", pairs)

    def sims():
        return pairs().withColumn(
            "cosine", _dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))
        ).select("query_id", "cand_id", "cosine")

    t("pairs + fold cosine", sims)

    def topk():
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("cand_id")
        )
        return (
            sims()
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
        )

    t("full topk (window)", topk)

    # window input narrowed: project before the exchange (guide §2.3)
    def topk_narrow():
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("cand_id")
        )
        return (
            sims()
            .select("query_id", "cand_id", "cosine")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
        )

    t("topk narrow-projected", topk_narrow)
    spark.stop()


if __name__ == "__main__":
    main()
