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

from transcriptomics_data_integration_spark.runtime import register_persisted

from transcriptomics_data_integration_spark.stats.bh import p_adjust
from transcriptomics_data_integration_spark.stats.combat import check_confounding, combat
from transcriptomics_data_integration_spark.stats.ttest import moderated_t, two_group_ttest


def _f5_ttest_single_pass(
    labeled: DataFrame,
    gene_col: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    top_k_genes: int | None,
    exact_scale: int | None,
) -> DataFrame:
    """F5 top-variance filter + pooled t from ONE fact aggregation.

    The per-gene relation below carries both the all-sample moments
    (the F5 sd — identical decimal expressions and tie-break to
    ``nonspecific_filter_topk``) and the per-group moments the pooled
    t consumes, so the fact relation is aggregated exactly once; the
    top-k semi-join then restricts the BOUNDED per-gene relation,
    which is row-for-row what filtering facts first would produce
    (gene-level filter feeding a gene-level aggregation).  Without
    ``top_k_genes`` this is plain :func:`two_group_ttest`.
    """
    from pyspark.sql import Window

    from transcriptomics_data_integration_spark.stats.ttest import (
        ttest_from_group_moments,
    )

    if not top_k_genes:
        return two_group_ttest(
            labeled, gene_col, group_col, value_col, group_a, group_b,
            exact_scale=exact_scale, log_scale_values=True,
        )
    g, v = F.col(group_col), F.col(value_col)
    va = F.when(g == F.lit(group_a), v)
    vb = F.when(g == F.lit(group_b), v)
    if exact_scale is not None:
        s, s2 = exact_scale, 2 * exact_scale
        dall = v.cast(f"decimal(18,{s})")
        ca, cb = va.cast(f"decimal(18,{s})"), vb.cast(f"decimal(18,{s})")
        sum_all = F.sum(dall).cast("double")
        sum2_all = F.sum((dall * dall).cast(f"decimal(38,{s2})")).cast("double")
        sum_a = F.sum(ca).cast("double")
        sum_b = F.sum(cb).cast("double")
        sum2_a = F.sum((ca * ca).cast(f"decimal(38,{s2})")).cast("double")
        sum2_b = F.sum((cb * cb).cast(f"decimal(38,{s2})")).cast("double")
    else:
        sum_all, sum2_all = F.sum(v), F.sum(v * v)
        sum_a, sum_b = F.sum(va), F.sum(vb)
        sum2_a, sum2_b = F.sum(va * va), F.sum(vb * vb)
    # persist the BOUNDED per-gene moment relation: it has two
    # consumers (the F5 ranking and the semi-joined t input), and an
    # unpersisted DAG fork re-executes the whole fact aggregation
    # subtree per consumer — one row per gene is always cacheable,
    # the fact relation never is
    mom = labeled.groupBy(gene_col).agg(
        F.count(F.lit(1)).alias("_n_all"),
        sum_all.alias("_s_all"),
        sum2_all.alias("_s2_all"),
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        sum_a.alias("_sa"),
        sum_b.alias("_sb"),
        sum2_a.alias("_sa2"),
        sum2_b.alias("_sb2"),
    ).persist()
    register_persisted(mom)
    ranked = mom.where(F.col("_n_all") >= 2).withColumn(
        "_sd",
        F.sqrt(
            (F.col("_s2_all") - F.col("_s_all") * F.col("_s_all") / F.col("_n_all"))
            / (F.col("_n_all") - 1)
        ),
    )
    w = Window.orderBy(F.col("_sd").desc(), F.col(gene_col))
    keep = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k_genes)
        .select(gene_col)
    )
    agg = (
        mom.join(F.broadcast(keep), gene_col, "left_semi")
        .where((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .withColumn("mean_a", F.col("_sa") / F.col("n_a"))
        .withColumn("mean_b", F.col("_sb") / F.col("n_b"))
        .withColumn(
            "var_a",
            (F.col("_sa2") - F.col("_sa") * F.col("_sa") / F.col("n_a"))
            / (F.col("n_a") - 1),
        )
        .withColumn(
            "var_b",
            (F.col("_sb2") - F.col("_sb") * F.col("_sb") / F.col("n_b"))
            / (F.col("n_b") - 1),
        )
        .drop("_n_all", "_s_all", "_s2_all", "_sa", "_sb", "_sa2", "_sb2")
    )
    return ttest_from_group_moments(agg, log_scale_values=True)


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
    adjust: str = "BH",
) -> DataFrame:
    """Long expression + sample sheet -> per-gene topTable
    (log2fc, t, moderated t, p, adjusted p, decide sign).  ``adjust``
    is the reference's documented sixth argument
    (`DiffExpression_closedPlatform.R:24`, 'none'/'BH'/'fdr'/'BY'/
    'holm'), dispatched through ``stats.bh.p_adjust`` with R
    ``p.adjust`` semantics.

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
    # batch cardinality + confounding come from the SAMPLE SHEET (the
    # broadcast dim the reference itself checks,
    # DiffExpression_closedPlatform.R:390-418) — not from `labeled`:
    # both were driver actions that re-executed the full fact scan+join
    # before the pipeline even started
    if batch_correct and targets.select(batch_col).distinct().count() > 1:
        if not check_confounding(targets, batch_col, group_col):
            raise ValueError(
                "batch is confounded with the biological group "
                "(reference guard, DiffExpression_closedPlatform.R:390-418)"
            )
        if batch_adjust == "center":
            if exact_scale is not None:
                dv = F.col(value_col).cast(f"decimal(18,{exact_scale})")
            else:
                dv = F.col(value_col)
            # ONE fact aggregation: per-(gene, batch) decimal sums;
            # per-gene totals roll up from the tiny per_gb relation
            # (decimal addition is associative, so the rolled-up sums
            # are bitwise the values a direct fact aggregation yields)
            # instead of re-executing the scan+join subtree
            # persisted: two consumers (per-gene rollup + the adjust
            # join) and one row per (gene, batch) — bounded
            per_gb_dec = labeled.groupBy(gene_col, batch_col).agg(
                F.sum(dv).alias("_sd_gb"),
                F.count(F.lit(1)).alias("_n_gb"),
            ).persist()
            register_persisted(per_gb_dec)
            per_g = per_gb_dec.groupBy(gene_col).agg(
                F.sum("_sd_gb").cast("double").alias("_s_g"),
                F.sum("_n_gb").alias("_n_g"),
            )
            per_gb = per_gb_dec.select(
                gene_col,
                batch_col,
                F.col("_sd_gb").cast("double").alias("_s_gb"),
                "_n_gb",
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
    tt = _f5_ttest_single_pass(
        labeled, gene_col, group_col, value_col, group_a, group_b,
        top_k_genes, exact_scale,
    )
    mod = moderated_t(tt)
    adj = p_adjust(mod, "p_value", "adj_p_value", method=adjust, tiebreak_col=gene_col)
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
    adjust: str = "BH",
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
    tt = _f5_ttest_single_pass(
        labeled, gene_col, group_col, value_col, group_a, group_b,
        top_k_genes, exact_scale,
    )
    mod = moderated_t(tt)
    adj = p_adjust(mod, "p_value", "adj_p_value", method=adjust, tiebreak_col=gene_col)
    return adj.withColumn(
        "decide",
        F.when(F.col("adj_p_value") > alpha, 0).otherwise(
            F.signum(F.col("log2fc")).cast("int")
        ),
    ).orderBy("p_value", gene_col)
