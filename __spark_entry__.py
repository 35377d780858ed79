"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``transcriptomics_data_integration_spark.suite``, the declared query
inventory (SURVEY.md section 2 operators on the driver's synthetic
tables, each with a DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from transcriptomics_data_integration_spark.suite import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the closed-platform DE
    pipeline analogue (pooled t + BH over the expression fact)."""
    return QUERIES["diff_expression"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
