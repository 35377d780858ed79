"""Scale probes for the r8 operators (pagerank_fixed,
substring_dedup_spans, bm25_topk) over SYNTHETIC in-plan corpora —
measure wall-clock + output sizes at sizes far above the gate SFs.

Usage: python tools/r8_ops_probe.py [n_nodes] [n_docs]
Prints one JSON line per probe; paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("r8-ops-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from transcriptomics_data_integration_spark.llmdata.graph import pagerank_fixed
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        substring_dedup_spans,
    )
    from transcriptomics_data_integration_spark.llmdata.retrieval import bm25_topk

    # -- pagerank: 3 out-edges per node, power-law-ish hub (node 0
    # receives every node's third edge with prob via modulo clustering)
    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    edges = None
    for m, a in ((5, 1), (7, 3), (11, 4)):
        p = base.select("src", ((F.col("src") * m + a) % n_nodes).alias("dst"))
        edges = p if edges is None else edges.unionByName(p)
    edges = edges.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    top = pagerank_fixed(edges, n_iter=3)
    n_out = top.count()
    t_pr = time.perf_counter() - t0
    print(json.dumps({"probe": f"pagerank3_x{n_nodes}", "nodes": n_out,
                      "edges": 3 * n_nodes, "sec": round(t_pr, 1),
                      "edges_per_sec_per_iter": int(3 * n_nodes * 3 / t_pr)}),
          flush=True)

    # -- substring spans: groups of 4 docs share a 40-token passage,
    # 60 unique tokens around it
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    head = ("transform(sequence(1, CAST(20 + doc_id % 9 AS INT)), "
            "i -> concat('u', CAST(doc_id AS STRING), '_', CAST(i AS STRING)))")
    mid = ("transform(sequence(1, 40), "
           "i -> concat('g', CAST(doc_id DIV 4 AS STRING), '_', CAST(i AS STRING)))")
    tail = ("transform(sequence(1, 40), "
            "i -> concat('t', CAST(doc_id AS STRING), '_', CAST(i AS STRING)))")
    synth = docs.select(
        "doc_id", F.expr(f"array_join(concat({head}, {mid}, {tail}), ' ')").alias("text")
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    spans = substring_dedup_spans(synth, "doc_id", k=8, min_tokens=20)
    n_spans = spans.count()
    t_ss = time.perf_counter() - t0
    print(json.dumps({"probe": f"substring_spans_x{n_docs}", "spans": n_spans,
                      "sec": round(t_ss, 1),
                      "docs_per_sec": int(n_docs / t_ss)}), flush=True)

    # -- bm25 over the synthetic docs (every doc matches the group term
    # family is absent; use unique+shared vocab: query the shared-mid
    # grams of one group plus a universal term)
    t0 = time.perf_counter()
    top = bm25_topk(synth, "doc_id", "text", ["g0_1", "g1_1", "u1_1"], k=100)
    n_top = top.count()
    t_bm = time.perf_counter() - t0
    print(json.dumps({"probe": f"bm25_topk_x{n_docs}", "rows": n_top,
                      "sec": round(t_bm, 1),
                      "docs_per_sec": int(n_docs / t_bm)}), flush=True)


if __name__ == "__main__":
    main()
