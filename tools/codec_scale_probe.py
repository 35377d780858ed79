"""r7 scale probes for the new kernels:

1. Codec throughput (jpeg/gif/mp4/html) over an inflated in-plan doc
   set — these are map-side mapInPandas stages, so the claim to verify
   is LINEAR scaling and a usable docs/s rate, not shuffle shape.
2. temperature_sample forced-bucketed vs single-task A/B at many
   docs — the token_budget_sample-style routing claim for the rank
   window.

Usage: python tools/codec_scale_probe.py [n_docs_codecs] [n_docs_rank]
Prints one JSON line per probe; paste into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def main() -> None:
    n_codec = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_rank = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark("codec-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from transcriptomics_data_integration_spark.suite import QUERIES

    # synthetic documents relation with the columns the gates read
    docs = spark.range(n_codec).select(
        F.col("id").alias("doc_id"),
        F.lit("srcP").alias("source"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), "
            "i -> substr(md5(concat(CAST(id AS STRING), '-', CAST(i AS STRING))), 1, 8)))"
        ).alias("text"),
    )
    tmp = f"/tmp/codec_probe_{n_codec}"
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    for name in ("jpeg_pixels", "gif_pixels", "png_pixels", "mp4_header", "html_extract"):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = QUERIES[name](spark, tmp).count()
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "probe": f"{name}_x{n_codec}",
                    "rows_out": n,
                    "sec": round(sec, 2),
                    "docs_per_sec": int(n_codec / sec),
                }
            ),
            flush=True,
        )

    # temperature_sample routing A/B at n_rank docs, 4 skewed sources
    from transcriptomics_data_integration_spark.llmdata import sampling as S
    from transcriptomics_data_integration_spark.operators import windows as W

    big = spark.range(n_rank).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CASE WHEN id % 100 < 70 THEN 'head' WHEN id % 100 < 90 THEN 'mid' "
            "WHEN id % 100 < 99 THEN 'tail' ELSE 'rare' END"
        ).alias("source"),
    ).localCheckpoint(eager=True)
    total = n_rank // 10
    results = {}
    orig = W.fits_single_task
    for mode, patch in (("single_task", lambda df, **k: True),
                        ("bucketed", lambda df, **k: False)):
        W.fits_single_task = patch
        try:
            t0 = time.perf_counter()
            n = S.temperature_sample(big, "source", "doc_id", total, 0.5).count()
            results[mode] = (n, round(time.perf_counter() - t0, 2))
        finally:
            W.fits_single_task = orig
        print(
            json.dumps(
                {
                    "probe": f"temperature_{mode}_x{n_rank}",
                    "rows_out": results[mode][0],
                    "sec": results[mode][1],
                }
            ),
            flush=True,
        )
    same = results["single_task"][0] == results["bucketed"][0]
    print(json.dumps({"note": "row counts equal across routes", "equal": same}),
          flush=True)


if __name__ == "__main__":
    main()
