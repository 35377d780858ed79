"""web_pipeline composition at scale (r7): drive the five-stage chain
(html_extract -> Gopher keep -> Bloom decontamination -> temperature
mixture -> global shuffle) over a SYNTHETIC in-plan corpus N docs
large, with a 1% eval slice, and measure end-to-end rate + per-stage
attrition.  The components have individual probes
(tools/codec_scale_probe.py); this one proves the COMPOSITION's
wall-clock stays explode-bound (the Bloom stage's pair relation), not
barrier-bound.

Usage: python tools/web_pipeline_probe.py [n_docs]
Prints one JSON line; paste into PLANS.md.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    spark = get_spark("web-pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from transcriptomics_data_integration_spark.llmdata.sampling import (
        global_shuffle,
        temperature_sample,
    )
    from transcriptomics_data_integration_spark.llmdata.text import (
        bloom_contamination,
        gopher_quality,
        html_extract,
    )

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CASE WHEN id % 100 < 70 THEN 'head' WHEN id % 100 < 90 THEN 'mid' "
            "WHEN id % 100 < 99 THEN 'tail' ELSE 'rare' END"
        ).alias("source"),
        # 'x the': after the html h1 line the first raw token glues to
        # the newline ("N\nx"), so the stopword must be the SECOND
        # token to stay standalone for the Gopher stopword rule
        F.expr(
            "concat_ws(' ', 'x', 'the', transform(sequence(1, 40), "
            "i -> substr(md5(concat(CAST(id AS STRING), '-', CAST(i AS STRING))), 1, 8)))"
        ).alias("text"),
    ).localCheckpoint(eager=True)
    train = docs.where(F.col("doc_id") % 97 != 0)
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)

    t0 = time.perf_counter()
    html = train.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><script>var x=1;</script></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    ext = html_extract(html, "doc_id", "html").join(
        train.select("doc_id", "source"), "doc_id"
    )
    kept = (
        gopher_quality(ext).where(F.col("keep"))
        .select("doc_id", "source", "n_tokens")
        .persist()
    )
    n_kept = kept.count()
    t_kept = time.perf_counter()
    raw_kept = train.select("doc_id", "text").join(kept.select("doc_id"), "doc_id")
    screened = bloom_contamination(raw_kept, eval_docs).persist()
    # hex-alphabet shingles overlap massively corpus-wide; take the
    # measured median as the drop threshold so attrition is ~50%
    thr = screened.approxQuantile("n_exact", [0.5], 0.01)[0]
    clean = (
        kept.join(screened.select("doc_id", "n_exact"), "doc_id", "left")
        .where(F.coalesce(F.col("n_exact"), F.lit(0)) <= thr)
        .drop("n_exact")
        .localCheckpoint(eager=True)  # lineage-cut, not just cache
    )
    n_clean = clean.count()
    t_clean = time.perf_counter()
    sampled = temperature_sample(clean, "source", "doc_id", n_docs // 20, 0.5).persist()
    n_sampled = sampled.count()
    t_sampled = time.perf_counter()
    final = global_shuffle(sampled, "doc_id")
    n_final = final.count()
    t_end = time.perf_counter()
    print(
        json.dumps(
            {
                "probe": f"web_pipeline_x{n_docs}",
                "n_train": n_docs - n_docs // 97 - 1,
                "n_kept": n_kept,
                "n_clean": n_clean,
                "n_final": n_final,
                "sec_extract_quality": round(t_kept - t0, 1),
                "sec_bloom": round(t_clean - t_kept, 1),
                "threshold": thr,
                "sec_mixture": round(t_sampled - t_clean, 1),
                "sec_shuffle": round(t_end - t_sampled, 1),
                "sec_total": round(t_end - t0, 1),
                "docs_per_sec": int(n_docs / (t_end - t0)),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
