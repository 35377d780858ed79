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


def bh_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    parts = partition_cols or []
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
