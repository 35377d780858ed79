"""Quantile normalization (SURVEY.md M1 core / M3 approximation / W6).

Reference: GC-RMA's quantile-normalize step
(`GenExpressionComb_Affy_U133Plus2.R:149-156`, method `README.md:72`)
and lumi RSN, for which the reference itself cites rank-preservation /
QN equivalence (`GenExpressionComb_Illum_HT_12_V3.R:190`).

Semantics: rank values within each sample; the normalized value at rank
r is the mean across samples of each sample's r-th value; values keep
their original sample/gene identity but take the reference
distribution's value at their rank.

Tie handling (SURVEY.md section 7 watch list): R ``normalize.quantiles``
averages over tied ranks.  We expose ``ties="average"`` which assigns
each tied value the mean of the reference values over its tied rank
span (via avg over the rank range), and ``ties="first"`` (row_number)
for the strict permutation form used by the oracle checks.

Spark shape: one shuffle to partition by sample (rank window), one
aggregation by rank (small: one row per rank), broadcast join back.
This is the per-sample stage of the partitioning discipline in
SURVEY.md section 4.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    sample_col: str,
    value_col: str,
    gene_col: str,
    out_col: str = "qn_value",
    ties: str = "first",
) -> DataFrame:
    w = Window.partitionBy(sample_col).orderBy(F.col(value_col).asc(), F.col(gene_col).asc())
    ranked = df.withColumn("_rank", F.row_number().over(w))
    ref = ranked.groupBy("_rank").agg(F.avg(value_col).alias("_ref"))
    if ties == "average":
        # average the reference distribution over each sample's tied span
        tie_w = (
            Window.partitionBy(sample_col, value_col)
        )
        ranked = ranked.withColumn("_tie_min", F.min("_rank").over(tie_w)).withColumn(
            "_tie_max", F.max("_rank").over(tie_w)
        )
        ref_r = ref.withColumnRenamed("_rank", "_ref_rank")
        joined = ranked.join(
            F.broadcast(ref_r),
            (F.col("_ref_rank") >= F.col("_tie_min"))
            & (F.col("_ref_rank") <= F.col("_tie_max")),
        )
        out = (
            joined.groupBy(sample_col, gene_col, value_col)
            .agg(F.avg("_ref").alias(out_col))
        )
        return out
    joined = ranked.join(F.broadcast(ref), "_rank")
    return joined.withColumnRenamed("_ref", out_col).drop("_rank")
