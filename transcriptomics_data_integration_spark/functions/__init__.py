"""Scalar function library.

``normal`` holds the normal-distribution inverse CDF / CDF used by the
meta-analysis kernels (reference ``Meta_analysis.R:82`` ``qnorm``,
``:1226`` ``pnorm``).  They are emitted as portable SQL expression text so
the identical arithmetic runs on the Spark side (via ``F.expr``) and in
the DuckDB correctness oracle — no Python UDF in the hot path.
"""

from transcriptomics_data_integration_spark.functions.normal import norm_cdf_sql, norm_ppf_sql

__all__ = ["norm_cdf_sql", "norm_ppf_sql"]
