"""Two-sample Kolmogorov-Smirnov test, fully in-plan.

Reference site: KS test between sample-correlation strata
(`scripts/data_integration/Study_effect.R:805`, ks.test of same-group
vs cross-group correlation distributions).

Shape: per-distinct-value counts (one aggregation) -> running ECDF
window over the ordered distinct values (input = distinct values, not
raw rows) -> global max gap.  The asymptotic Kolmogorov p-value is an
8-term alternating exponential series — plain SQL exp/pow arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    g1,
    g2,
    n_buckets: int | None = 1024,
) -> DataFrame:
    """One-row result: (n1, n2, d_stat, p_approx) for the two-sample KS
    between ``value_col`` distributions of groups g1 and g2.

    Tie handling matches R's ks.test: the ECDF gap is evaluated AT each
    distinct value after accounting for all tied observations (per-value
    aggregation before the cumulative window).  p is the asymptotic
    Kolmogorov series at lambda = sqrt(n1 n2 / (n1 + n2)) * D — R's
    ks.test asymptotic convention (no Stephens/Numerical-Recipes
    small-sample terms), so p matches R whenever R itself uses the
    asymptotic path (it switches to an exact method only for small
    samples without ties).

    Scale: with ``n_buckets`` (default 1024) the running ECDF is the
    bucketed two-pass prefix sum (monotone value-range shards; per-
    shard count totals — a <= n_buckets-row relation — carry the base
    offsets, and the only large window is ``partitionBy(bucket)``).
    Integer-count sums make the two-pass form bit-identical to the
    single global window, which remains available via
    ``n_buckets=None`` (and is the automatic fallback for non-numeric
    value types).
    """
    from pyspark.sql.types import NumericType

    tagged = df.where(F.col(group_col).isin([g1, g2])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == g1, 1).otherwise(0).alias("is1"),
    )
    per_value = tagged.groupBy("v").agg(
        F.sum("is1").alias("c1"),
        F.sum(1 - F.col("is1")).alias("c2"),
    )
    from transcriptomics_data_integration_spark.operators.windows import (
        fits_single_task,
        monotone_range_buckets,
    )

    # adaptive physical choice: below the single-task size estimate the
    # global window beats the two-pass shape's extra stages (identical
    # counts either way — integer sums, no FP reassociation)
    if (
        n_buckets
        and isinstance(df.schema[value_col].dataType, NumericType)
        and not fits_single_task(per_value)
    ):

        bucketed = monotone_range_buckets(per_value, "v", n_buckets=n_buckets)
        totals = bucketed.groupBy("_bkt").agg(
            F.sum("c1").alias("_t1"), F.sum("c2").alias("_t2")
        )
        w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
        base = totals.select(
            "_bkt",
            F.coalesce(F.sum("_t1").over(w_base), F.lit(0)).alias("_b1"),
            F.coalesce(F.sum("_t2").over(w_base), F.lit(0)).alias("_b2"),
        )
        w_in = (
            Window.partitionBy("_bkt")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        gaps = bucketed.join(F.broadcast(base), "_bkt").select(
            (F.col("_b1") + F.sum("c1").over(w_in)).alias("cum1"),
            (F.col("_b2") + F.sum("c2").over(w_in)).alias("cum2"),
        )
    else:
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        gaps = per_value.select(
            F.sum("c1").over(w).alias("cum1"),
            F.sum("c2").over(w).alias("cum2"),
        )
    # group sizes via a 1-row broadcast attach (deliberate bounded
    # BNLJ, same shape as monotone_range_buckets' bounds) — not a
    # second full-relation window
    tot = per_value.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    agg = (
        gaps.join(F.broadcast(tot))
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(
                F.abs(F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2"))
            ).alias("d_stat"),
        )
    )
    n1, n2, d = F.col("n1"), F.col("n2"), F.col("d_stat")
    ne = n1 * n2 / (n1 + n2)
    lam = F.sqrt(ne) * d
    series = None
    for k in range(1, 9):
        term = F.lit(2.0 * (-1.0) ** (k - 1)) * F.exp(F.lit(-2.0 * k * k) * lam * lam)
        series = term if series is None else series + term
    # the alternating series is only convergent-in-practice for
    # non-tiny lambda; below the cutoff the true Q is 1 to machine
    # precision (Numerical Recipes probks convention)
    p = F.when(lam < 0.2, F.lit(1.0)).otherwise(
        F.least(F.greatest(series, F.lit(0.0)), F.lit(1.0))
    )
    return agg.select("n1", "n2", "d_stat", p.alias("p_approx"))
