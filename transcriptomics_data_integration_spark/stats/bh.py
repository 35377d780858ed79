"""Benjamini-Hochberg FDR adjustment (SURVEY.md M10).

Reference: ``topTable(adjust="BH")`` sites
(`scripts/data_integration/DiffExpression_closedPlatform.R:184,566,600`).
Semantics pinned to R ``p.adjust(method="BH")``:

    adj_i = min_{j >= i} min(1, p_(j) * n / j)

i.e. rank ascending by p, scale, then reverse cumulative minimum.  Ties
receive identical adjusted values automatically (equal p with different
ranks collapse under the reverse cummin).

Spark shape: two window functions over the same (optional partition,
order-by-p) window — one shuffle if partitioned, single-stage on
post-aggregate relations otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bh_adjust_histogram(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    tiebreak_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact BH without a global sort window — the billion-row scale
    path.  ``bh_adjust``'s unpartitioned ``orderBy(p)`` window moves the
    whole relation to ONE task; fine for post-aggregate gene lists,
    fatal for permutation-scale p-sets.  This variant range-buckets p
    into ``n_buckets`` equi-width bins so every window is partitioned by
    bucket:

    1. histogram pass: per-bucket counts -> cumulative base rank per
       bucket + total n (a <= n_buckets-row relation, broadcast back);
    2. rank pass: global rank = bucket base + row_number within bucket
       (exact, because buckets are value ranges: every p in bucket k
       sorts before every p in bucket k+1, and ties share a bucket);
    3. reverse cumulative min = min(within-bucket reverse cummin,
       suffix-min of higher buckets) — the suffix-min is again computed
       on the tiny per-bucket relation and broadcast.

    Identical output to ``bh_adjust`` (same ``p * n / rank`` expression,
    same tie semantics); the only unpartitioned windows run on
    ``n_buckets`` rows regardless of |df|.  Under a uniform-ish p
    distribution each bucket holds |df|/n_buckets rows; AQE skew-split
    covers spiky nulls at p≈0.
    """
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    rev = [F.col(p_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    with_b = df.withColumn(
        "_bkt",
        F.least(
            F.floor(F.col(p_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
        ),
    )
    hist = with_b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    cum = (
        hist.withColumn("_base", F.coalesce(F.sum("_cnt").over(w_base), F.lit(0)))
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
        .select("_bkt", "_base", "_n")
    )
    w_in = Window.partitionBy("_bkt").orderBy(*order)
    ranked = (
        with_b.join(F.broadcast(cum), "_bkt")
        .withColumn("_rank", F.col("_base") + F.row_number().over(w_in))
        .withColumn(
            "_scaled",
            F.least(F.col(p_col) * F.col("_n") / F.col("_rank"), F.lit(1.0)),
        )
    )
    bmin = ranked.groupBy("_bkt").agg(F.min("_scaled").alias("_bmin"))
    w_suf = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf = bmin.withColumn("_sufmin", F.min("_bmin").over(w_suf)).select(
        "_bkt", "_sufmin"
    )
    w_rev_in = Window.partitionBy("_bkt").orderBy(*rev).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # least() ignores nulls, so the highest bucket (null suffix) falls
    # back to its within-bucket reverse cummin alone
    return (
        ranked.join(F.broadcast(suf), "_bkt")
        .withColumn("_revmin", F.min("_scaled").over(w_rev_in))
        .withColumn(out_col, F.least(F.col("_revmin"), F.col("_sufmin")))
        .drop("_bkt", "_base", "_n", "_rank", "_scaled", "_revmin", "_sufmin")
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    parts = partition_cols or []
    if not parts:
        # adaptive scale guard: an unpartitioned sort window on a
        # relation Catalyst can't prove single-task-small funnels the
        # whole p-set through one task — route it to the bit-identical
        # bucket-partitioned histogram form instead (p in [0,1] by BH's
        # contract, so the equi-width bucketing needs no bounds pass)
        from transcriptomics_data_integration_spark.operators.windows import (
            fits_single_task,
        )

        if not fits_single_task(df):
            return bh_adjust_histogram(
                df, p_col, out_col=out_col, tiebreak_col=tiebreak_col
            )
    order = [F.col(p_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w_rank = Window.partitionBy(*parts).orderBy(*order)
    w_rev = (
        Window.partitionBy(*parts)
        .orderBy(*[c.desc() for c in [F.col(p_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*parts)
    return (
        df.withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_scaled", F.least(F.col(p_col) * F.col("_n") / F.col("_rank"), F.lit(1.0)))
        .withColumn(out_col, F.min("_scaled").over(w_rev))
        .drop("_rank", "_n", "_scaled")
    )
