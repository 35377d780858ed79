"""Gene-set enrichment (SURVEY.md A17).

Reference: GO-term Fisher tests on the top p-value decile
(`scripts/data_integration/Meta_analysis.R:1359-1392`, top 500 terms
`:1374`).  Spark SQL lacks ``lgamma`` for an exact hypergeometric, so
the engine uses the chi-square (1 df) test of the same 2x2 contingency
— asymptotically equivalent, closed-form, and expressible with the
shared normal-CDF SQL (chi-square_1 upper tail == two-sided normal tail
of sqrt(x)).  The contingency counts are integers, so the statistic is
exact and the ranking deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.functions.normal import two_sided_p_sql


def enrichment_chi2(
    gene_terms: DataFrame,
    significant: DataFrame,
    gene_col: str,
    term_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Per-term 2x2 chi-square enrichment of ``significant`` genes.

    ``gene_terms``: (gene, term) membership; ``significant``: genes in
    the selected set.  Returns the ``top_k`` terms by statistic.
    """
    universe = gene_terms.select(gene_col).distinct()
    n_total = universe.count()
    n_sig = significant.select(gene_col).distinct().count()

    flagged = gene_terms.join(
        significant.select(gene_col).distinct().withColumn("_sig", F.lit(1)),
        gene_col,
        "left",
    )
    per_term = flagged.groupBy(term_col).agg(
        F.count(F.lit(1)).alias("n_term"),
        F.sum(F.coalesce(F.col("_sig"), F.lit(0))).alias("a"),
    )
    # 2x2 cells: a = sig&term, b = sig&!term, c = !sig&term, d = rest
    cells = (
        per_term.withColumn("b", F.lit(n_sig) - F.col("a"))
        .withColumn("c", F.col("n_term") - F.col("a"))
        .withColumn("d", F.lit(n_total - n_sig) - F.col("c"))
    )
    num = (
        F.lit(n_total).cast("double")
        * (F.col("a") * F.col("d") - F.col("b") * F.col("c")) ** 2
    )
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    ).cast("double")
    scored = cells.where(den > 0).withColumn("chi2", num / den)
    with_p = scored.withColumn(
        "p_value", F.expr(two_sided_p_sql("sqrt(chi2)"))
    )
    return (
        with_p.orderBy(F.col("chi2").desc(), F.col(term_col))
        .limit(top_k)
        .select(term_col, "n_term", "a", "chi2", "p_value")
    )


def fisher_enrichment(
    gene_terms: DataFrame,
    significant: DataFrame,
    gene_col: str,
    term_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Exact one-sided Fisher enrichment (the reference's actual test,
    `Meta_analysis.R:1371-1392`): per term, the upper hypergeometric
    tail P(overlap >= a) over the 2x2 margins.

    The tail is folded entirely in-plan (``aggregate`` over
    ``sequence`` with a Stirling ``lgamma`` per term — see
    `functions/special.py`), so the test stays JVM-side with no Python
    serde; the fold length is bounded by min(n_sig, n_term), i.e. the
    smaller 2x2 margin, independent of the fact-table row count.
    """
    from transcriptomics_data_integration_spark.functions.special import (
        hypergeom_tail_sql,
    )

    universe = gene_terms.select(gene_col).distinct()
    n_total = universe.count()
    n_sig = significant.select(gene_col).distinct().count()

    flagged = gene_terms.join(
        significant.select(gene_col).distinct().withColumn("_sig", F.lit(1)),
        gene_col,
        "left",
    )
    per_term = flagged.groupBy(term_col).agg(
        F.count(F.lit(1)).alias("n_term"),
        F.sum(F.coalesce(F.col("_sig"), F.lit(0))).alias("a"),
    )
    tail = hypergeom_tail_sql(
        "a", str(n_total), "n_term", str(n_sig), dialect="spark"
    )
    with_p = per_term.withColumn("p_fisher", F.expr(tail))
    return (
        with_p.orderBy(F.col("p_fisher").asc(), F.col(term_col))
        .limit(top_k)
        .select(term_col, "n_term", "a", "p_fisher")
    )
