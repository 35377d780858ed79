"""Entry-point A step 7 — cross-platform meta-analysis pipeline
(``Meta_analysis.R``, SURVEY.md section 3.1 step 7).

Per platform: two-group DE (M8).  Across platforms: integrative
correlation per gene (A12 `:312-347`), weighted Stouffer combination
(A15 `:1211-1228`, only genes on > 1 platform `:1218`), p-improvement
ratios (A16 `:1267-1284`), optional left join back to per-platform
statistics (J3, ``Bind_Meta2DElists.pl``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.runtime import register_persisted

from transcriptomics_data_integration_spark.stats.icc import icc
from transcriptomics_data_integration_spark.stats.stouffer import p_improvement, stouffer_combine
from transcriptomics_data_integration_spark.stats.ttest import two_group_ttest


def meta_analysis(
    expr: DataFrame,
    targets: DataFrame,
    group_a: str,
    group_b: str,
    gene_col: str = "gene_id",
    sample_col: str = "sample_id",
    platform_col: str = "platform",
    value_col: str = "value",
    group_col: str = "target",
    with_icc: bool = True,
    exact_scale: int | None = None,
) -> DataFrame:
    """Long multi-platform expression + sample sheet -> per-gene meta
    results (avg log2fc, combined z, combined p, icc, n_platforms).

    ``exact_scale`` flows to the per-platform DE moments and the ICC
    pair moments (functions/exact.py scheme) so the composition is
    hash-gateable end-to-end (``q_meta_pipeline``)."""
    # the per-(gene, platform) DE table below feeds four consumers
    # (ICC attach, Stouffer combine, p-improvement join, per-gene icc)
    # — persist it (gene-sized, trivially cacheable) so none of them
    # re-executes the fact aggregation.  `expr` itself (matrix-sized)
    # is left to the caller: caching it was measured slower than the
    # re-scan at bench scale.
    labeled = expr.join(F.broadcast(targets.select(sample_col, group_col)), sample_col)
    de = two_group_ttest(
        labeled,
        [gene_col, platform_col],
        group_col,
        value_col,
        group_a,
        group_b,
        exact_scale=exact_scale,
    ).persist()
    register_persisted(de)
    if with_icc:
        platforms = [r[0] for r in expr.select(platform_col).distinct().collect()]
        cells = expr.select(
            F.col(platform_col).alias("platform"),
            F.col(gene_col).alias("gene_id"),
            F.col(sample_col).alias("sample_id"),
            F.col(value_col).alias("value"),
        )
        gene_icc = icc(cells, sorted(platforms), exact_scale=exact_scale).select(
            F.col("gene_id").alias(gene_col), "icc"
        )
        de = de.join(gene_icc, gene_col, "left").withColumn(
            "icc", F.coalesce(F.col("icc"), F.lit(0.0))
        )
    else:
        de = de.withColumn("icc", F.lit(0.0))
    comb = stouffer_combine(de, gene_col, platform_col, "p_value", "log2fc", "icc")
    improved = p_improvement(
        de.join(comb.select(gene_col, "p_comb"), gene_col), "p_value", "p_comb"
    )
    per_platform_imp = improved.groupBy(gene_col).agg(
        F.avg("p_improvement").alias("avg_p_improvement")
    )
    icc_per_gene = de.groupBy(gene_col).agg(F.first("icc").alias("icc"))
    return (
        comb.join(icc_per_gene, gene_col, "left")
        .join(per_platform_imp, gene_col, "left")
        .orderBy("p_comb", gene_col)
    )
