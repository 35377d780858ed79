"""Window / ranking operators (SURVEY.md section 2.6, W1-W7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_by(df: DataFrame, order_col: str, k: int, tiebreak_col: str, desc: bool = True) -> DataFrame:
    """W1/W4 — global top-k rows by ``order_col`` with deterministic
    tie-break.

    Reference: ``order(...)[1:k]`` (`DiffExpression_closedPlatform.R:448-450`),
    top-500 GO terms (`Meta_analysis.R:1374`).

    Scale: a global row_number over an unpartitioned window funnels all
    rows through one task — fine for the post-aggregate relations it is
    used on here (one row per gene/term).  For raw-fact top-k use
    ``df.orderBy(...).limit(k)`` which Spark executes as per-partition
    top-k + merge (TakeOrderedAndProject).
    """
    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.orderBy(oc, F.col(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")
