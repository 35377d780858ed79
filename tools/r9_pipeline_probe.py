"""r9 scale probes for the two r8 compositions that had no 1M-doc row
yet (VERDICT r8 item 6): `curation_pipeline` (C4 clean -> line-span
dedup -> chunk -> NFD pack) and `ingest_pipeline` (WARC -> robots ->
HTML extract -> Gopher).  Same kernel chain as the gates, driven from
a synthetic parquet corpus (honest Catalyst stats), with per-stage
attrition counted so a stage that silently drops or explodes rows is
visible.

Usage: python tools/r9_pipeline_probe.py [n_docs]
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
from r8b_ops_probe import synth_docs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("r9-pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    tmp = "/tmp/r9_pipeline_probe"
    shutil.rmtree(tmp, ignore_errors=True)
    synth_docs(spark, n_docs, "l").repartition(cores).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/docs")
    docs = spark.read.parquet(f"{tmp}/docs")

    # ---- curation_pipeline chain (the gate's kernels, gate formulas) ----
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        dedup_line_spans,
    )
    from transcriptomics_data_integration_spark.llmdata.sampling import (
        pack_bins_nfd,
    )
    from transcriptomics_data_integration_spark.llmdata.text import (
        c4_filter,
        chunk_documents,
    )

    t0 = time.perf_counter()
    toks = F.split(F.trim(F.col("text")), " ")
    lines = F.expr(
        "transform(sequence(1, cast(ceil(size(_t) / 8.0) as int)), i -> "
        "  concat("
        "    array_join(slice(_t, (i - 1) * 8 + 1, 8), ' '),"
        "    CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript' ELSE '' END,"
        "    CASE WHEN (doc_id + i) % 3 = 1 THEN '.'"
        "         WHEN (doc_id + i) % 3 = 2 THEN '!' ELSE '' END))"
    )
    planted = docs.select(F.col("doc_id"), toks.alias("_t")).select(
        "doc_id", F.concat(F.array_join(lines, "\n")).alias("text")
    )
    kept = (
        c4_filter(planted, "doc_id")
        .where(F.col("keep"))
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    kept.write.mode("overwrite").parquet(f"{tmp}/kept")
    kept = spark.read.parquet(f"{tmp}/kept")
    n_kept = kept.count()
    t_c4 = time.perf_counter() - t0

    t0 = time.perf_counter()
    crawls = kept.unionByName(
        kept.select(
            (F.col("doc_id") + 10 * n_docs).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit("\ncopy marker "), F.col("doc_id")
            ).alias("text"),
        )
    )
    sp = dedup_line_spans(crawls, "doc_id", span_lines=3)
    sp.write.mode("overwrite").parquet(f"{tmp}/spans")
    sp = spark.read.parquet(f"{tmp}/spans")
    n_sp = sp.count()
    removed = sp.agg(F.sum("n_removed").alias("r")).collect()[0]["r"]
    t_span = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_chunks = chunk_documents(
        sp.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id", chunk_tokens=16, stride=12,
    ).count()
    t_chunk = time.perf_counter() - t0

    t0 = time.perf_counter()
    tok_counts = sp.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("clean_text")), "\\s+")).alias("n_tokens"),
    )
    packed = pack_bins_nfd(tok_counts, "doc_id", "n_tokens", seq_len=128, n_buckets=8)
    n_bins = packed.agg(
        F.countDistinct("bucket", "bin_in_bucket").alias("b")
    ).collect()[0]["b"]
    t_pack = time.perf_counter() - t0
    total = t_c4 + t_span + t_chunk + t_pack
    print(
        json.dumps(
            {
                "probe": f"curation_pipeline_{n_docs}",
                "stages_sec": {
                    "c4_filter": round(t_c4, 1),
                    "span_dedup_2x": round(t_span, 1),
                    "chunk": round(t_chunk, 1),
                    "pack": round(t_pack, 1),
                },
                "attrition": {
                    "in": n_docs,
                    "c4_kept": n_kept,
                    "span_docs_2x": n_sp,
                    "spans_removed": int(removed or 0),
                    "chunks": n_chunks,
                    "bins": n_bins,
                },
                "sec": round(total, 1),
                "docs_per_sec": int(n_docs / total),
            }
        ),
        flush=True,
    )

    # ---- ingest_pipeline chain (WARC -> robots -> HTML -> Gopher) ------
    import pandas as pd

    from transcriptomics_data_integration_spark.llmdata.text import (
        gopher_quality,
        html_extract,
    )
    from transcriptomics_data_integration_spark.llmdata.urls import (
        parse_robots_rules,
        robots_filter,
    )
    from transcriptomics_data_integration_spark.sources.warc import (
        decode_warc,
        encode_warc,
    )

    t0 = time.perf_counter()
    m = F.col("doc_id") % 7
    path = F.concat(
        F.element_at(
            F.array(
                F.lit("/private/doc"), F.lit("/private/pub/doc"),
                F.lit("/docs/doc"), F.lit("/tmp/doc"), F.lit("/open/doc"),
                F.lit("/download"), F.lit("/download/doc"),
            ),
            (m + 1).cast("int"),
        ),
        F.when(m == 5, F.lit("")).otherwise(F.col("doc_id").cast("string")),
        F.when(m == 4, F.lit("?q=1")).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit(
            '<html><head><title>t</title><script>var x = "drop&amp;me";'
            "</script><style>p { color: red }</style></head><body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        # stopword-bearing tail: synth_docs tokens are md5-keyed w####
        # strings with zero stopwords, which the Gopher battery
        # correctly kills 100% of — the tail makes the quality stage
        # discriminate instead of rejecting the whole corpus
        F.lit(
            " and so the crawl shows that it was here with more of the "
            "usual text for this page."
        ),
        F.lit("</p><div>tail &amp; &#65;&#x42;  end</div></body></html>"),
    )
    staged = docs.select(
        "doc_id",
        F.lit("example.com").alias("domain"),
        path.alias("path"),
        html.alias("html"),
    )

    def warc_op(batches):
        for pdf in batches:
            rows = []
            for did, dom, pth, h in zip(
                pdf["doc_id"], pdf["domain"], pdf["path"], pdf["html"]
            ):
                uri = f"http://{dom}{pth}"
                blob = encode_warc(
                    [
                        {"type": "request", "uri": uri},
                        {
                            "type": "response",
                            "uri": uri,
                            "body": str(h),
                            "http_status": 200,
                            "http_content_type": "text/html",
                        },
                    ]
                )
                recs = decode_warc(blob)
                resp = [r for r in recs if r["type"] == "response"]
                if len(resp) != 1:
                    continue
                rows.append((int(did), str(dom), str(pth), resp[0]["body"]))
            yield pd.DataFrame(rows, columns=["doc_id", "domain", "path", "html"])

    demuxed = staged.mapInPandas(
        warc_op, schema="doc_id long, domain string, path string, html string"
    )
    robots_txt = (
        "User-agent: *\nUser-agent: otherbot\n"
        "Disallow: /private/\nAllow: /private/pub/\n"
        "Disallow: /tmp\nDisallow: /*?\nDisallow: /download$\n"
    )
    rules = parse_robots_rules(
        spark.createDataFrame([("example.com", robots_txt)], ["domain", "robots_txt"])
    )
    allowed = robots_filter(demuxed, rules, "domain", "path").where(
        F.col("allowed")
    )
    extracted = html_extract(
        allowed.select("doc_id", F.col("html")), "doc_id", "html"
    )
    gq = gopher_quality(extracted.select("doc_id", "text"))
    n_pass = gq.where(F.col("keep")).count()
    n_allowed = None  # folded into the one pass above; re-count cheaply:
    n_allowed = allowed.count()
    t = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"ingest_pipeline_{n_docs}",
                "attrition": {
                    "in": n_docs,
                    "robots_allowed": n_allowed,
                    "gopher_pass": n_pass,
                },
                "sec": round(t, 1),
                "docs_per_sec": int(n_docs / t),
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
