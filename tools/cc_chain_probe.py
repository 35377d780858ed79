"""Full LLM-dedup-chain scale probe (r3 verdict item 5): drive
minhash_lsh_pairs(expand='star') -> connected_components ->
keep_best_per_cluster over a SYNTHETIC in-plan corpus with skewed dup
cliques, and MEASURE (not assert) rounds-to-converge and shuffle
bytes per phase.

Corpus shape (one row per doc id in [0, N), generated in-plan — no
files):

- ``[0, mega)``              one exact-dup storm: identical text
                             (the crawl pathologies star mode exists
                             for: quadratic expansion would emit
                             ~mega^2/2 pairs).
- ``[mega, mega + 20% N)``   1000-member exact-dup cliques.
- next 40% of N              near-dup cliques: 4 shingle-level
                             variants x 50 copies per cluster (LSH +
                             Jaccard-verify must connect variants).
- rest                       unique singleton docs.

Shuffle bytes come from the Spark UI REST API (this probe builds its
own session with the UI on); rounds come from connected_components'
``stats`` out-param.

Usage: python tools/cc_chain_probe.py [N_docs] [mega]
Prints one JSON line per phase; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from transcriptomics_data_integration_spark.llmdata.dedup import (
    connected_components,
    dedup_clusters,
    keep_best_per_cluster,
    minhash_lsh_pairs,
)

UI_PORT = 4078


def shuffle_bytes(spark) -> tuple[int, int]:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    data = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in data),
        sum(s.get("shuffleReadBytes", 0) for s in data),
    )


def make_corpus(spark, n_docs: int, mega: int):
    n_exact = n_docs // 5  # 1000-member exact cliques
    n_near = (n_docs * 2) // 5  # 4-variant near-dup cliques
    b1 = mega
    b2 = mega + n_exact
    b3 = mega + n_exact + n_near
    # every body is built from md5-derived pseudo-words so texts that
    # SHOULD be unrelated share no shingles — a shared English template
    # across millions of docs floods the minhash bands with collisions
    # and turns candidate generation quadratic (measured: a 1M-doc
    # probe with templated singletons stalled on one straggler bucket)
    def words(seed: str, n: int) -> str:
        return (
            f"concat_ws(' ', transform(sequence(1, {n}), "
            f"i -> substr(md5(concat({seed}, '-', CAST(i AS STRING))), 1, 10)))"
        )

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""CASE
            WHEN id < {b1} THEN
              {words("'megastorm'", 16)}
            WHEN id < {b2} THEN
              {words("CONCAT('exact', CAST(id DIV 1000 AS STRING))", 16)}
            WHEN id < {b3} THEN
              concat({words("CONCAT('near', CAST(id DIV 200 AS STRING))", 16)},
                     ' ', substr(md5(concat('var', CAST(id % 4 AS STRING))), 1, 10))
            ELSE
              {words("CAST(id AS STRING)", 12)}
            END"""
        ).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cc-chain-probe")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_corpus(spark, n_docs, mega)

    def phase(name, fn):
        w0, r0 = shuffle_bytes(spark)
        t0 = time.perf_counter()
        out = fn()
        w1, r1 = shuffle_bytes(spark)
        rec = {
            "phase": name,
            "sec": round(time.perf_counter() - t0, 1),
            "shuffle_write_gb": round((w1 - w0) / 1e9, 2),
            "shuffle_read_gb": round((r1 - r0) / 1e9, 2),
        }
        rec.update(out)
        print(json.dumps(rec), flush=True)
        return rec

    print(json.dumps({"n_docs": n_docs, "mega_clique": mega, "cpus": cpus}), flush=True)

    # Phase 1: LSH pairs (star mode — the CC-feed scale path)
    pairs_df = minhash_lsh_pairs(docs, "doc_id", expand="star")
    pairs_df = pairs_df.select("id_a", "id_b")
    state = {}

    def p1():
        p = pairs_df.localCheckpoint(eager=True)
        state["pairs"] = p
        return {"n_edges": p.count()}

    phase("minhash_lsh_star", p1)

    # Phase 2: connected components (rounds instrumented)
    def p2():
        st = {}
        cc = connected_components(state["pairs"], stats=st).localCheckpoint(eager=True)
        state["cc"] = cc
        n_nodes = cc.count()
        n_comp = cc.select("component").distinct().count()
        return {"n_nodes": n_nodes, "n_components": n_comp, "cc_rounds": st["rounds"]}

    phase("connected_components", p2)

    # Phase 3: survivor selection over the full corpus
    def p3():
        clusters = state["cc"].select(
            F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
        )
        kept = keep_best_per_cluster(docs, clusters, "doc_id")
        return {"n_survivors": kept.count()}

    phase("keep_best", p3)

    # Reference point: the quadratic expand='all' edge count is
    # analytic (mega^2/2 dominates) — print it for the PLANS.md table
    approx_all = mega * (mega - 1) // 2
    print(json.dumps({"note": "expand=all intra edges (mega clique alone)",
                      "would_be_edges": approx_all}), flush=True)


if __name__ == "__main__":
    main()
