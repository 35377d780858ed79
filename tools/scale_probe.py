"""Scale-up probe: run the heavy operators on synthetically inflated
inputs (sf0.1 unioned with key-shifted copies — no files written) and
check that runtime grows ~linearly and plans hold their shape.

Two inflation axes, because they stress different things:
- ``rows x10`` (same gene cardinality, 10x rows/gene): stresses the
  per-key aggregation and window paths.
- ``keys x10`` (10x gene cardinality, same rows/gene): stresses shuffle
  width, bucket fanout, and the broadcast keep-lists.

Usage: python tools/scale_probe.py  (prints one JSON line per probe)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.llmdata.dedup import minhash_lsh_pairs
from transcriptomics_data_integration_spark.stats.bh import bh_adjust_histogram
from transcriptomics_data_integration_spark.stats.ttest import two_group_ttest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def inflate(df: DataFrame, key_col: str, copies: int, shift_keys: bool) -> DataFrame:
    """Union ``copies`` copies; ``shift_keys`` moves each copy to a
    disjoint key range (keys x N), else keys repeat (rows x N)."""
    parts = []
    for i in range(copies):
        c = df
        if shift_keys and i > 0:
            c = c.withColumn(key_col, F.col(key_col) + F.lit(i * 10_000_000))
        parts.append(c)
    out = parts[0]
    for c in parts[1:]:
        out = out.unionByName(c)
    return out


def probe_de(spark, copies: int, shift: bool) -> dict:
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li, "l_partkey", copies, shift)
    t0 = time.perf_counter()
    tt = two_group_ttest(big, "l_partkey", "l_returnflag", "l_extendedprice", "R", "A")
    adj = bh_adjust_histogram(tt, "p_value", "adj_p", tiebreak_col="l_partkey")
    n = adj.count()
    return {"probe": f"de+bh_{'keys' if shift else 'rows'}x{copies}",
            "rows_out": n, "sec": round(time.perf_counter() - t0, 2)}


def probe_minhash(spark, copies: int) -> dict:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    crawls = inflate(docs.select("doc_id", "text"), "doc_id", copies, shift_keys=True)
    t0 = time.perf_counter()
    n = minhash_lsh_pairs(crawls, "doc_id", threshold=0.8).count()
    return {"probe": f"minhash_crawls_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_qnorm(spark, copies: int) -> dict:
    from transcriptomics_data_integration_spark.stats.quantile_norm import (
        quantile_normalize,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li, "l_suppkey", copies, shift_keys=True)  # x N samples
    cells = big.select(
        F.col("l_partkey").alias("gene_id"),
        F.col("l_suppkey").alias("sample_id"),
        F.col("l_extendedprice").alias("value"),
    )
    t0 = time.perf_counter()
    n = quantile_normalize(cells, "sample_id", "value", "gene_id").count()
    return {"probe": f"qnorm_samples_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_cosine_neardup(spark, copies: int) -> dict:
    from transcriptomics_data_integration_spark.llmdata.similarity import (
        cosine_neardup_pairs,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    big = inflate(emb, "vec_id", copies, shift_keys=True)
    t0 = time.perf_counter()
    n = cosine_neardup_pairs(big, threshold=0.999, n_planes=24, n_bands=2).count()
    return {"probe": f"cosine_neardup_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_connected_components(spark, n_nodes: int, chain_len: int) -> dict:
    """CC scale axes: many small components (clique-ish dup clusters)
    plus ONE chain of ``chain_len`` nodes — the adversarial diameter
    that pointer jumping must collapse in O(log chain_len) rounds."""
    from transcriptomics_data_integration_spark.llmdata.dedup import (
        connected_components,
    )

    pairs = spark.range(n_nodes).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    chain = spark.range(chain_len - 1).select(
        (F.lit(10_000_000) + F.col("id")).alias("id_a"),
        (F.lit(10_000_001) + F.col("id")).alias("id_b"),
    )
    t0 = time.perf_counter()
    cc = connected_components(pairs.unionByName(chain))
    n_comp = cc.groupBy("component").count().count()
    return {"probe": f"cc_{n_nodes}pairs_chain{chain_len}",
            "rows_out": n_comp, "sec": round(time.perf_counter() - t0, 2)}


def probe_contamination(spark, copies: int) -> dict:
    """Decontamination screen under corpus inflation: the eval shingle
    inventory (broadcast side) is fixed; the train side grows xN —
    linear map-side work, no pre-agg shuffle."""
    from transcriptomics_data_integration_spark.llmdata.text import contamination_check

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    train = inflate(docs.where(F.col("doc_id") % 97 != 0), "doc_id", copies, shift_keys=True)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    t0 = time.perf_counter()
    n = contamination_check(train, ev).count()
    return {"probe": f"contamination_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_voom_lowess(spark, copies: int) -> dict:
    """Gene-cardinality inflation for the lowess trend: the per-gene
    aggregate is distributed; the single-batch fit must stay near-flat
    thanks to R's delta interpolation (fits ~ range/delta regardless
    of gene count)."""
    from transcriptomics_data_integration_spark.stats.normalize import (
        voom_weights_lowess,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li, "l_partkey", copies, shift_keys=True)
    counts = big.groupBy(
        F.col("l_partkey").alias("gene_id"), F.col("l_suppkey").alias("sample_id")
    ).agg(F.sum("l_quantity").alias("cnt"))
    t0 = time.perf_counter()
    n = voom_weights_lowess(counts, "gene_id", "sample_id", "cnt").count()
    return {"probe": f"voom_lowess_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_impute_em(spark, copies: int) -> dict:
    """EM imputation under gene-cardinality inflation (fixed 3
    iterations): missing-set materialization + per-iteration aggs all
    scale with the grid."""
    from transcriptomics_data_integration_spark.stats.mlkernels import (
        impute_missing_em,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li.where(F.col("l_partkey") <= 2000), "l_partkey", copies, shift_keys=True)
    cells = big.groupBy(
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 50).alias("sample_id"),
    ).agg(F.sum("l_quantity").alias("value"))
    t0 = time.perf_counter()
    n = impute_missing_em(cells, "gene_id", "sample_id", "value", max_iter=3).count()
    return {"probe": f"impute_em_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_ward_distance(spark, copies: int) -> dict:
    """Ward's distributed phase under gene inflation: the S x S
    distance aggregation sees xN genes; the driver linkage is fixed-S."""
    from transcriptomics_data_integration_spark.stats.hclust import ward_hclust

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li, "l_partkey", copies, shift_keys=True)
    cells = big.groupBy(
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 50).alias("sample_id"),
    ).agg(F.avg("l_extendedprice").alias("value"))
    t0 = time.perf_counter()
    linkage, labels = ward_hclust(cells, "sample_id", "gene_id", "value", k=4)
    n = linkage.count() + labels.count()
    return {"probe": f"ward_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_icc_blockmatrix(spark, copies: int) -> dict:
    """ICC scale path under gene inflation: Arrow vector assembly +
    JVM BlockMatrix gram + posexplode enumeration, G x copies genes."""
    from transcriptomics_data_integration_spark.stats.icc import icc_blockmatrix

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(
        li.where(F.col("l_partkey") <= 200), "l_partkey", copies, shift_keys=True
    )
    cells = big.where(F.col("l_linestatus").isin(["O", "F"])).groupBy(
        F.col("l_linestatus").alias("platform"),
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 50).alias("sample_id"),
    ).agg(F.avg("l_extendedprice").alias("value"))
    t0 = time.perf_counter()
    n = icc_blockmatrix(cells, ["O", "F"], block_size=256).count()
    return {"probe": f"icc_blockmatrix_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_icc_dimsum(spark, copies: int, threshold: float = 0.2) -> dict:
    """ICC approximation tier (r7): same inflated gene set as
    probe_icc_blockmatrix but the gene-gene correlation stage runs
    DIMSUM (`RowMatrix.columnSimilarities(threshold)`) and the shared
    profile stage consumes only the surviving pairs — cost tracks
    kept pairs, not G^2."""
    from transcriptomics_data_integration_spark.stats.icc import icc_dimsum

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(
        li.where(F.col("l_partkey") <= 200), "l_partkey", copies, shift_keys=True
    )
    cells = big.where(F.col("l_linestatus").isin(["O", "F"])).groupBy(
        F.col("l_linestatus").alias("platform"),
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 50).alias("sample_id"),
    ).agg(F.avg("l_extendedprice").alias("value"))
    t0 = time.perf_counter()
    n = icc_dimsum(cells, ["O", "F"], threshold=threshold).count()
    return {"probe": f"icc_dimsum_t{threshold}_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_icc_sampled(spark, copies: int, frac: float = 0.1) -> dict:
    """ICC ORACLED approximation tier (r7): same inflated gene set,
    exact relational kernel with the md5-hashed partner subset —
    pairs shrink G^2 -> G^2*frac before the join, the shape that
    actually cuts work for unit-norm correlation columns."""
    from transcriptomics_data_integration_spark.stats.icc import icc

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(
        li.where(F.col("l_partkey") <= 200), "l_partkey", copies, shift_keys=True
    )
    cells = big.where(F.col("l_linestatus").isin(["O", "F"])).groupBy(
        F.col("l_linestatus").alias("platform"),
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 50).alias("sample_id"),
    ).agg(F.avg("l_extendedprice").alias("value"))
    t0 = time.perf_counter()
    n = icc(cells, ["O", "F"], exact_scale=None, partner_frac=frac).count()
    return {"probe": f"icc_sampled_f{frac}_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_pca_covariance(spark, copies: int) -> dict:
    """M11 distributed phase under SAMPLE inflation (G fixed at 25,
    xN samples): the self-join fanout is G^2 per sample — the axis
    that actually grows at 100 TB."""
    from transcriptomics_data_integration_spark.stats.mlkernels import (
        feature_covariance,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li.where(F.col("l_partkey") <= 25), "l_suppkey", copies,
                  shift_keys=True)
    # shifted suppkeys are disjoint across copies -> xN DISTINCT samples;
    # complete the grid (like the suite query) so the self-join fanout
    # is the dense G^2-per-sample the gate actually executes
    sparse = big.groupBy(
        F.col("l_partkey").alias("gene_id"),
        F.col("l_suppkey").alias("sample_id"),
    ).agg(F.sum("l_extendedprice").alias("value"))
    cells = (
        sparse.select("gene_id").distinct()
        .crossJoin(sparse.select("sample_id").distinct())
        .join(sparse, ["gene_id", "sample_id"], "left")
        .fillna({"value": 0.0})
    )
    t0 = time.perf_counter()
    n = feature_covariance(cells, "gene_id", "sample_id", "value").count()
    return {"probe": f"pca_covariance_samples_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_mds_bmatrix(spark, copies: int) -> dict:
    """M12 distributed phase under gene inflation (S fixed at 20):
    distance self-join sees xN genes, centering relations stay S^2."""
    from transcriptomics_data_integration_spark.stats.mlkernels import mds_bmatrix

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(
        li.where(F.col("l_partkey") <= 300), "l_partkey", copies, shift_keys=True
    )
    cells = big.groupBy(
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % 20).alias("sample_id"),
    ).agg(F.sum("l_quantity").alias("value"))
    t0 = time.perf_counter()
    n = mds_bmatrix(cells, "sample_id", "gene_id", "value").count()
    return {"probe": f"mds_bmatrix_genes_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_kmeans_lloyd(spark, copies: int) -> dict:
    """Fixed-Lloyd k-means under sample inflation (G fixed at 60):
    per-iteration broadcast-join fanout is k x G per sample."""
    from transcriptomics_data_integration_spark.stats.mlkernels import (
        kmeans_lloyd_fixed,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    big = inflate(li.where(F.col("l_partkey") <= 60), "l_suppkey", copies,
                  shift_keys=True)
    cells = big.groupBy(
        F.col("l_partkey").alias("gene_id"),
        (F.col("l_suppkey") % (40 * copies)).alias("sample_id"),
    ).agg(F.sum("l_quantity").alias("value"))
    t0 = time.perf_counter()
    n = kmeans_lloyd_fixed(cells, "sample_id", "gene_id", "value",
                           k=3, n_iter=2).count()
    return {"probe": f"kmeans_lloyd_samples_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_pq_fixed(spark, copies: int) -> dict:
    """PQ encode + ADC sweep under corpus inflation (queries fixed):
    the codes x LUT scan grows linearly in the corpus."""
    from transcriptomics_data_integration_spark.llmdata.similarity import (
        pq_fixed_topk,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    big = inflate(emb, "vec_id", copies, shift_keys=True)
    queries = emb.where(F.col("vec_id") % 10 == 0)
    t0 = time.perf_counter()
    n = pq_fixed_topk(big, queries, k=5).count()
    return {"probe": f"pq_fixed_corpus_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_bpe(spark, copies: int) -> dict:
    """BPE training under corpus inflation: the word-frequency collapse
    means only the first aggregation sees xN text — merge iterations
    run on the (unchanged) vocabulary relation, so wall-clock should
    stay nearly flat."""
    from transcriptomics_data_integration_spark.llmdata.bpe import bpe_train_fixed

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    big = inflate(docs.select("doc_id", "text"), "doc_id", copies, shift_keys=True)
    t0 = time.perf_counter()
    n = bpe_train_fixed(big, "text", n_merges=4).count()
    return {"probe": f"bpe_corpus_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_doc_logprob(spark, copies: int) -> dict:
    """Unigram-LM scoring under corpus inflation: two token-stream
    passes, model relation vocabulary-sized."""
    from transcriptomics_data_integration_spark.llmdata.text import doc_logprob

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    big = inflate(docs.select("doc_id", "text"), "doc_id", copies, shift_keys=True)
    t0 = time.perf_counter()
    n = doc_logprob(big, "doc_id").count()
    return {"probe": f"doc_logprob_corpus_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def probe_rnaseq_binned(spark, copies: int) -> dict:
    """Entry-point-B binned composition under row inflation (same gene
    set, xN observations per gene)."""
    from transcriptomics_data_integration_spark.pipelines.rnaseq import (
        rnaseq_differential_expression,
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    part = spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
    big = inflate(li, "l_partkey", copies, shift_keys=False)
    counts = big.groupBy(
        F.col("l_partkey").alias("gene_id"), F.col("l_suppkey").alias("sample_id")
    ).agg(F.sum("l_quantity").alias("read_count"))
    attrs = part.select(
        F.col("p_partkey").alias("gene_id"), F.col("p_size").alias("gc_content")
    )
    targets = counts.select("sample_id").distinct().withColumn(
        "target", F.when(F.col("sample_id") % 2 == 0, "tumor").otherwise("normal")
    )
    t0 = time.perf_counter()
    n = rnaseq_differential_expression(
        counts, targets, attrs, "tumor", "normal", fidelity="binned"
    ).count()
    return {"probe": f"rnaseq_binned_rows_x{copies}", "rows_out": n,
            "sec": round(time.perf_counter() - t0, 2)}


def main() -> None:
    spark = get_spark("scale-probe")
    # warm codegen at base scale
    probe_de(spark, 1, False)
    for fn, args in [
        (probe_de, (1, False)),
        (probe_de, (5, False)),
        (probe_de, (10, False)),
        (probe_de, (5, True)),
        (probe_de, (10, True)),
        (probe_minhash, (2,)),
        (probe_minhash, (5,)),
        (probe_qnorm, (1,)),
        (probe_qnorm, (10,)),
        (probe_cosine_neardup, (1,)),
        (probe_cosine_neardup, (4,)),
        (probe_connected_components, (10_000, 64)),
        (probe_connected_components, (100_000, 1024)),
        (probe_contamination, (1,)),
        (probe_contamination, (4,)),
        (probe_voom_lowess, (1,)),
        (probe_voom_lowess, (10,)),
        (probe_impute_em, (1,)),
        (probe_impute_em, (10,)),
        (probe_ward_distance, (1,)),
        (probe_ward_distance, (10,)),
        (probe_icc_blockmatrix, (1,)),
        (probe_icc_blockmatrix, (5,)),
        (probe_rnaseq_binned, (1,)),
        (probe_rnaseq_binned, (10,)),
        (probe_pca_covariance, (1,)),
        (probe_pca_covariance, (10,)),
        (probe_mds_bmatrix, (1,)),
        (probe_mds_bmatrix, (10,)),
        (probe_kmeans_lloyd, (1,)),
        (probe_kmeans_lloyd, (10,)),
        (probe_pq_fixed, (1,)),
        (probe_pq_fixed, (4,)),
        (probe_bpe, (1,)),
        (probe_bpe, (10,)),
        (probe_doc_logprob, (1,)),
        (probe_doc_logprob, (10,)),
    ]:
        spark.catalog.clearCache()
        print(json.dumps(fn(spark, *args)), flush=True)


if __name__ == "__main__":
    main()
