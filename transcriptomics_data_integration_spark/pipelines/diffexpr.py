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
    batch_adjust: str = "combat",
    alpha: float = 0.05,
    exact_scale: int | None = None,
) -> DataFrame:
    """Long expression + sample sheet -> per-gene topTable
    (log2fc, t, moderated t, p, BH-adjusted p, decide sign).

    ``batch_adjust``: ``"combat"`` (default — the reference's EB
    solver, iterative) or ``"center"`` — the closed-form location-only
    adjustment ``x - mean(gene, batch) + mean(gene)`` (decimal-exact
    moments), which keeps the WHOLE composition SQL-expressible so the
    end-to-end chain can be hash-gated against a DuckDB oracle (the
    ``q_closed_pipeline`` twin); mirrors ComBat's location step with
    the scale step elided.  ``exact_scale`` flows to the F5 ranking
    and the pooled-t moments for cross-engine bitwise parity.
    """
    if batch_adjust not in ("combat", "center"):
        raise ValueError("batch_adjust must be 'combat' or 'center'")
    labeled = expr.join(
        F.broadcast(targets.select(sample_col, group_col, batch_col)), sample_col
    )
    if batch_correct and labeled.select(batch_col).distinct().count() > 1:
        if not check_confounding(labeled, batch_col, group_col):
            raise ValueError(
                "batch is confounded with the biological group "
                "(reference guard, DiffExpression_closedPlatform.R:390-418)"
            )
        if batch_adjust == "center":
            if exact_scale is not None:
                dv = F.col(value_col).cast(f"decimal(18,{exact_scale})")
            else:
                dv = F.col(value_col)
            per_gb = labeled.groupBy(gene_col, batch_col).agg(
                F.sum(dv).cast("double").alias("_s_gb"),
                F.count(F.lit(1)).alias("_n_gb"),
            )
            per_g = labeled.groupBy(gene_col).agg(
                F.sum(dv).cast("double").alias("_s_g"),
                F.count(F.lit(1)).alias("_n_g"),
            )
            adj = (
                F.col(value_col)
                - F.col("_s_gb") / F.col("_n_gb")
                + F.col("_s_g") / F.col("_n_g")
            )
            if exact_scale is not None:
                # tie-free quantization: the adjusted doubles are
                # bitwise identical across engines, but a later
                # double->DECIMAL cast hits dyadic rounding TIES
                # (x.125 at scale 2) where Spark HALF_UP and other
                # engines' tie rules diverge; floor(x*q + 0.5)/q has
                # no tie rule at all, so the quantized value — and
                # every downstream decimal moment — stays bitwise
                # cross-engine
                q = float(10 ** exact_scale)
                adj = F.floor(adj * q + F.lit(0.5)) / F.lit(q)
            labeled = (
                labeled.join(per_gb, [gene_col, batch_col])
                .join(per_g, gene_col)
                .withColumn(value_col, adj)
                .drop("_s_gb", "_n_gb", "_s_g", "_n_g")
            )
        else:
            corrected = combat(labeled, gene_col, sample_col, batch_col, value_col)
            labeled = corrected.join(
                F.broadcast(targets.select(sample_col, group_col)), sample_col
            )
    if top_k_genes:
        labeled = nonspecific_filter_topk(
            labeled, gene_col, value_col, top_k_genes, exact_scale=exact_scale
        )
    tt = two_group_ttest(
        labeled, gene_col, group_col, value_col, group_a, group_b,
        exact_scale=exact_scale, log_scale_values=True,
    )
    mod = moderated_t(tt)
    adj = bh_adjust(mod, "p_value", "adj_p_value", tiebreak_col=gene_col)
    return adj.withColumn(
        "decide",
        F.when(F.col("adj_p_value") > alpha, 0).otherwise(
            F.signum(F.col("log2fc")).cast("int")
        ),
    ).orderBy("p_value", gene_col)


def normalized_matrix_de(
    expr: DataFrame,
    targets: DataFrame,
    group_a: str,
    group_b: str,
    gene_col: str = "gene_id",
    sample_col: str = "sample_id",
    value_col: str = "value",
    group_col: str = "target",
    restrict_genes: DataFrame | None = None,
    exclude_genes: DataFrame | None = None,
    top_k_genes: int | None = None,
    alpha: float = 0.05,
    exact_scale: int | None = None,
) -> DataFrame:
    """Entry-point C — standalone DE on an already-normalized matrix
    (`DiffExpression_normalisedData.R:96-499`, SURVEY §3.3): optional
    gene-list restriction (semi-join on ``restrict_genes``) and
    exclusion (F2 anti-join on ``exclude_genes``), per-gene MEAN
    imputation of missing cells (M16 closed form,
    `DiffExpression_normalisedData.R:160-170`; swap in
    ``impute_missing_em`` for the Amelia-style fidelity tier), then
    the shared limma chain — F5 top-variance filter, pooled t, eBayes
    moderation, BH, decideTests — with NO batch correction (one
    matrix, no registry: the reference script runs outside the
    combine/registry machinery).

    ``exact_scale`` makes every moment decimal-exact and quantizes
    imputed values tie-free (see ``differential_expression``), so the
    whole composition is SQL-expressible and hash-gateable
    (``q_normalized_de``).
    """
    from transcriptomics_data_integration_spark.stats.mlkernels import impute_missing

    df = expr
    if restrict_genes is not None:
        df = df.join(F.broadcast(restrict_genes), gene_col, "left_semi")
    if exclude_genes is not None:
        df = df.join(F.broadcast(exclude_genes), gene_col, "left_anti")
    if gene_col != "gene_id":
        df = df.withColumnRenamed(gene_col, "gene_id")
    df = impute_missing(df, value_col, strategy="mean", exact_scale=exact_scale)
    if gene_col != "gene_id":
        df = df.withColumnRenamed("gene_id", gene_col)
    if exact_scale is not None:
        # imputed fills are continuous ratios — quantize tie-free
        # before the downstream decimal moments (observed cells are
        # already exact at this scale; the floor form is a no-op on
        # them)
        q = float(10 ** exact_scale)
        df = df.withColumn(
            value_col, F.floor(F.col(value_col) * q + F.lit(0.5)) / F.lit(q)
        )
    labeled = df.join(
        F.broadcast(targets.select(sample_col, group_col)), sample_col
    )
    if top_k_genes:
        labeled = nonspecific_filter_topk(
            labeled, gene_col, value_col, top_k_genes, exact_scale=exact_scale
        )
    tt = two_group_ttest(
        labeled, gene_col, group_col, value_col, group_a, group_b,
        exact_scale=exact_scale, log_scale_values=True,
    )
    mod = moderated_t(tt)
    adj = bh_adjust(mod, "p_value", "adj_p_value", tiebreak_col=gene_col)
    return adj.withColumn(
        "decide",
        F.when(F.col("adj_p_value") > alpha, 0).otherwise(
            F.signum(F.col("log2fc")).cast("int")
        ),
    ).orderBy("p_value", gene_col)
