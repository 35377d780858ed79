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


def gsea_enrichment_scores(
    ranked: DataFrame,
    gene_terms: DataFrame,
    gene_col: str,
    term_col: str,
    rank_col: str = "rank",
) -> DataFrame:
    """GSEA enrichment score (Subramanian et al. 2005, public; the
    classic p = 0 "equal weights" form) — one analysis rung above the
    A17 overlap tests: instead of thresholding a significant set, walk
    the FULL ranked gene list and ask where a term's members
    concentrate.  The running sum gains 1/ht at each member ("hit")
    and loses 1/(N - ht) at each non-member; ES is the maximum
    deviation from zero (signed: + = concentrated at the top).

    Exactness: the deviation after the j-th hit (at rank r_j) is

        dev_after  = j/ht - (r_j - j)/(N - ht)
                   = (j*(N - ht) - (r_j - j)*ht) / (ht*(N - ht))

    — an INTEGER numerator over a per-term constant denominator, so
    the arg-max/min and the sign rule compare integers (bit-exact in
    any engine); only the final reported ES divides.  Deviation
    changes only at hits (linear decay between), so extremes occur
    just after a hit (positive side) or just before one (negative
    side, dev_before with j-1 hits at rank r_j - 1); evaluating the
    hit rows alone is complete.

    Plan shape: one equi-join (term members -> ranks), one per-term
    window for the hit index j (partitions = one term's members,
    never the corpus), min/max struct aggregation per term, 1-row
    broadcast N attach onto the TERM dim.  At genome scale the ranked
    list is never materialized per term — only each term's own hits.

    Ties: |max_after| vs |min_before| equal -> positive ES (the
    deterministic convention); rank_at_max is the smallest rank
    achieving the extreme.  Terms with every gene (ht = N) are
    dropped (the miss rate is undefined).

    Output: (term, n_hits, es, es_sign, rank_at_max).
    """
    n_total = ranked.agg(F.count(F.lit(1)).alias("N"))
    hits = gene_terms.join(
        ranked.select(F.col(gene_col), F.col(rank_col).alias("_r")), gene_col
    )
    from pyspark.sql import Window

    w = Window.partitionBy(term_col).orderBy(F.col("_r"))
    idx = hits.withColumn("_j", F.row_number().over(w)).withColumn(
        "_ht", F.count(F.lit(1)).over(Window.partitionBy(term_col))
    )
    scored = (
        idx.join(F.broadcast(n_total))
        .where(F.col("_ht") < F.col("N"))
        .withColumn(
            "_num_after",
            F.col("_j") * (F.col("N") - F.col("_ht"))
            - (F.col("_r") - F.col("_j")) * F.col("_ht"),
        )
        .withColumn(
            "_num_before",
            (F.col("_j") - 1) * (F.col("N") - F.col("_ht"))
            - (F.col("_r") - F.col("_j")) * F.col("_ht"),
        )
    )
    per_term = scored.groupBy(term_col).agg(
        F.max("_ht").alias("n_hits"),
        F.max("N").alias("_N"),
        F.max(F.struct(F.col("_num_after"), (-F.col("_r")).alias("_nr"))).alias("_mx"),
        F.min(F.struct(F.col("_num_before"), F.col("_r"))).alias("_mn"),
    )
    pos_num = F.col("_mx._num_after")
    neg_num = F.col("_mn._num_before")
    take_pos = pos_num >= -neg_num
    denom = (F.col("n_hits") * (F.col("_N") - F.col("n_hits"))).cast("double")
    return per_term.select(
        term_col,
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.when(take_pos, pos_num).otherwise(neg_num).cast("double") / denom).alias("es"),
        F.when(take_pos, F.lit(1)).otherwise(F.lit(-1)).alias("es_sign"),
        F.when(take_pos, -F.col("_mx._nr"))
        .otherwise(F.col("_mn._r"))
        .cast("bigint")
        .alias("rank_at_max"),
    )
