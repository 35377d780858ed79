"""Duplicate (intra-replicate-block) correlation (SURVEY.md M9).

Reference: limma ``duplicateCorrelation`` feeding ``lmFit``
(`scripts/data_integration/DiffExpression_closedPlatform.R:487-508`,
block renumbering `:494-504`): technical replicates share a block; a
single consensus intra-block correlation is estimated across genes and
used to down-weight replicate pseudo-information.

Closed-form estimator used here (one-way random-effects ANOVA ICC per
gene, Fisher-z consensus — the classical moment version of limma's REML
fit):

    MSW_g  = pooled within-block variance
    MSB_g  = between-block mean square
    n0     = (N - sum n_i^2 / N) / (k - 1)        (unbalanced correction)
    icc_g  = (MSB - MSW) / (MSB + (n0 - 1) MSW)
    consensus = tanh( mean_g atanh(clamp(icc_g)) )

Two grouped aggregations (block level, gene level) + one tiny global
mean — all SQL, one shuffle on gene.

``exact_scale``: with it set, block-level sums are DECIMAL-exact and the
per-block ANOVA terms (each a deterministic scalar function of exact
inputs) are quantized to whole units before the per-gene DECIMAL
accumulation — the whole statistic is then bitwise-reproducible across
engines/partitionings (the sums of squared block totals would otherwise
lose ~4 digits to cancellation and expose summation order, and
fractional rounding itself is engine-dependent near 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLAMP = 0.999999


def per_gene_block_icc(
    df: DataFrame,
    gene_col: str,
    block_col: str,
    value_col: str,
    exact_scale: int | None = None,
) -> DataFrame:
    """Per-gene intra-block ICC from one-way ANOVA moments.

    Returns (gene, k_blocks, n_obs, msw, msb, icc); genes need >= 2
    blocks and more observations than blocks.
    """
    v = F.col(value_col)
    if exact_scale is not None:
        s = exact_scale
        dv = v.cast(f"decimal(18,{s})")
        per_block = df.groupBy(gene_col, block_col).agg(
            F.count(v).alias("n_i"),
            F.sum(dv).alias("s_dec"),
            F.sum((dv * dv).cast(f"decimal(38,{2 * s})")).cast("double").alias("s2_i"),
        )
        s_i = F.col("s_dec").cast("double")
        # per-block scalar terms: deterministic functions of exact inputs,
        # quantized to WHOLE units before the exact decimal accumulation.
        # Integer rounding (not round(x, k>0)) because engines implement
        # fractional rounding via a multiply that goes inexact near 2^53 —
        # the terms here reach ~1e14.  +-0.5 per term is 1e-14 relative.
        w_term = F.round(F.col("s2_i") - s_i * s_i / F.col("n_i"), 0).cast("decimal(28,0)")
        b_term = F.round(s_i * s_i / F.col("n_i"), 0).cast("decimal(28,0)")
        terms = per_block.withColumn("_w", w_term).withColumn("_b", b_term)
        per_gene = (
            terms.groupBy(gene_col)
            .agg(
                F.count(F.lit(1)).alias("k_blocks"),
                F.sum("n_i").alias("n_obs"),
                F.sum("_w").cast("double").alias("ssw"),
                F.sum("_b").cast("double").alias("ssb_part"),
                F.sum("s_dec").cast("double").alias("s_tot"),
                F.sum(F.col("n_i") * F.col("n_i")).alias("sn2"),
            )
            .where((F.col("k_blocks") >= 2) & (F.col("n_obs") > F.col("k_blocks")))
        )
    else:
        per_block = df.groupBy(gene_col, block_col).agg(
            F.count(v).alias("n_i"),
            F.sum(v).alias("s_i"),
            F.sum(v * v).alias("s2_i"),
        )
        per_gene = (
            per_block.groupBy(gene_col)
            .agg(
                F.count(F.lit(1)).alias("k_blocks"),
                F.sum("n_i").alias("n_obs"),
                F.sum(F.col("s2_i") - F.col("s_i") * F.col("s_i") / F.col("n_i")).alias("ssw"),
                F.sum(F.col("s_i") * F.col("s_i") / F.col("n_i")).alias("ssb_part"),
                F.sum("s_i").alias("s_tot"),
                F.sum(F.col("n_i") * F.col("n_i")).alias("sn2"),
            )
            .where((F.col("k_blocks") >= 2) & (F.col("n_obs") > F.col("k_blocks")))
        )
    msw = F.col("ssw") / (F.col("n_obs") - F.col("k_blocks"))
    msb = (
        F.col("ssb_part") - F.col("s_tot") * F.col("s_tot") / F.col("n_obs")
    ) / (F.col("k_blocks") - 1)
    n0 = (F.col("n_obs") - F.col("sn2") / F.col("n_obs")) / (F.col("k_blocks") - 1)
    out = (
        per_gene.withColumn("msw", msw)
        .withColumn("msb", msb)
        .withColumn("_n0", n0)
        .where(F.col("msw") > 0)
        .withColumn(
            "icc",
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("_n0") - 1.0) * F.col("msw")),
        )
    )
    return out.select(gene_col, "k_blocks", "n_obs", "msw", "msb", "icc")


def consensus_correlation(icc_df: DataFrame) -> DataFrame:
    """Fisher-z consensus over genes: tanh(mean(atanh(clamped icc))).
    One-row result (the scalar limma feeds into lmFit)."""
    z = F.expr(
        f"0.5e0 * ln((1.0e0 + least(greatest(icc, -{_CLAMP}), {_CLAMP})) "
        f"/ (1.0e0 - least(greatest(icc, -{_CLAMP}), {_CLAMP})))"
    )
    agg = icc_df.agg(
        F.count(F.lit(1)).alias("n_genes"), F.avg(z).alias("_zbar")
    )
    tanh = "(exp(2.0e0 * _zbar) - 1.0e0) / (exp(2.0e0 * _zbar) + 1.0e0)"
    return agg.withColumn("consensus_corr", F.expr(tanh)).drop("_zbar")
