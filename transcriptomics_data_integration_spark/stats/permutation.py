"""Permutation-based FDR for combined z-scores (SURVEY.md A14).

Reference: GeneMeta ``zScoreFDR(nperm=50)`` at
`scripts/data_integration/Meta_analysis.R:896-956` — class labels are
permuted, the combined statistic recomputed per permutation, and the
FDR for a gene is the average count of permuted statistics at least as
extreme as the observed one.

Determinism: instead of engine-specific RNG (Spark ``rand(seed)`` and
any oracle's RNG can never agree), permutation k reorders samples by
``md5(sample || '#' || k)`` and deals the original label multiset out
in that order.  This is a uniform-ish permutation family that any
engine reproduces bit-for-bit — the property the correctness gate
needs, and seeded-reproducible in production too.

Shape: the K permutations are a (sample x K) dimension table joined
onto the fact — the fact is scanned once; the grouped aggregation runs
on (gene, k) with map-side combine.  K multiplies the shuffle, not the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.runtime import register_persisted


def permuted_labels(
    samples: DataFrame, sample_col: str, group_col: str, n_perm: int
) -> DataFrame:
    """(sample, k, perm_group) for k = 0..n_perm; k = 0 is the identity
    permutation (observed labels)."""
    w_orig = Window.partitionBy("k").orderBy(sample_col)
    w_hash = Window.partitionBy("k").orderBy("h", sample_col)
    labels = (
        samples.select(sample_col, group_col)
        .distinct()
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(n_perm))))
    )
    hashed = labels.withColumn(
        "h", F.md5(F.concat_ws("#", F.col(sample_col), F.col("k")).cast("binary"))
    )
    ordered = hashed.withColumn("slot", F.row_number().over(w_hash)).withColumn(
        "orig_rank", F.row_number().over(w_orig)
    )
    # deal the label multiset (ordered by sample id) to hash-ordered slots
    deal = ordered.select("k", F.col("orig_rank").alias("slot"), F.col(group_col).alias("dealt"))
    permuted = ordered.join(deal, ["k", "slot"]).select(
        sample_col,
        "k",
        F.when(F.col("k") == 0, F.col(group_col)).otherwise(F.col("dealt")).alias("perm_group"),
    )
    return permuted


def permutation_fdr(
    df: DataFrame,
    gene_col: str,
    sample_col: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_perm: int = 20,
    exact_scale: int | None = 2,
) -> DataFrame:
    """Per-gene permutation p for the two-group pooled-t statistic:
    p_perm = (1 + #{k >= 1 : |t_k| >= |t_obs|}) / (n_perm + 1).
    """
    from transcriptomics_data_integration_spark.stats.ttest import two_group_ttest

    perms = permuted_labels(df, sample_col, group_col, n_perm)
    expanded = df.join(perms, sample_col)
    # persisted: (gene x K) rows, bounded — its two consumers (observed
    # split + permuted split) would otherwise each re-execute the
    # K-expanded fact aggregation
    tstats = two_group_ttest(
        expanded, [gene_col, "k"], "perm_group", value_col, group_a, group_b, exact_scale
    ).select(gene_col, "k", "t_statistic").persist()
    register_persisted(tstats)
    obs = tstats.where(F.col("k") == 0).select(
        gene_col, F.col("t_statistic").alias("t_obs")
    )
    perm = tstats.where(F.col("k") > 0)
    joined = perm.join(obs, gene_col)
    return (
        joined.groupBy(gene_col)
        .agg(
            F.first("t_obs").alias("t_obs"),
            F.count(F.lit(1)).alias("n_perm_done"),
            F.sum(
                F.when(F.abs(F.col("t_statistic")) >= F.abs(F.col("t_obs")), 1).otherwise(0)
            ).alias("n_extreme"),
        )
        .withColumn("p_perm", (1 + F.col("n_extreme")) / (F.col("n_perm_done") + 1))
    )
