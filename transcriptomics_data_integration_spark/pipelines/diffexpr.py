"""Entry-point A step 6 — differential expression pipeline
(``DiffExpression_closedPlatform.R``, SURVEY.md section 3.1).

Stage order mirrors the reference: ComBat across datasets (M6
`:372-437`), non-specific top-variance filter (F5 `:443-450` — a
SEMANTIC filter, never optimized away), per-gene two-group fit with
eBayes-style moderation (M8 `:474-546`), BH adjustment + topTable
ordering (M10/W3 `:566-600`), and the decideTests sign matrix (`:580`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.operators.filters import nonspecific_filter_topk
from transcriptomics_data_integration_spark.stats.bh import bh_adjust
from transcriptomics_data_integration_spark.stats.combat import check_confounding, combat
from transcriptomics_data_integration_spark.stats.ttest import moderated_t, two_group_ttest


def differential_expression(
    expr: DataFrame,
    targets: DataFrame,
    group_a: str,
    group_b: str,
    gene_col: str = "gene_id",
    sample_col: str = "sample_id",
    value_col: str = "value",
    group_col: str = "target",
    batch_col: str = "dataset",
    top_k_genes: int | None = None,
    batch_correct: bool = True,
    alpha: float = 0.05,
) -> DataFrame:
    """Long expression + sample sheet -> per-gene topTable
    (log2fc, t, moderated t, p, BH-adjusted p, decide sign)."""
    labeled = expr.join(
        F.broadcast(targets.select(sample_col, group_col, batch_col)), sample_col
    )
    if batch_correct and labeled.select(batch_col).distinct().count() > 1:
        if not check_confounding(labeled, batch_col, group_col):
            raise ValueError(
                "batch is confounded with the biological group "
                "(reference guard, DiffExpression_closedPlatform.R:390-418)"
            )
        corrected = combat(labeled, gene_col, sample_col, batch_col, value_col)
        labeled = corrected.join(
            F.broadcast(targets.select(sample_col, group_col)), sample_col
        )
    if top_k_genes:
        labeled = nonspecific_filter_topk(labeled, gene_col, value_col, top_k_genes)
    tt = two_group_ttest(
        labeled, gene_col, group_col, value_col, group_a, group_b, exact_scale=None,
        log_scale_values=True,
    )
    mod = moderated_t(tt)
    adj = bh_adjust(mod, "p_value", "adj_p_value", tiebreak_col=gene_col)
    return adj.withColumn(
        "decide",
        F.when(F.col("adj_p_value") > alpha, 0).otherwise(
            F.signum(F.col("log2fc")).cast("int")
        ),
    ).orderBy("p_value", gene_col)
