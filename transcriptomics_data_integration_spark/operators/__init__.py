"""Relational operator library (SURVEY.md section 2).

Generic ``DataFrame -> DataFrame`` combinators, parameterized by column
names, mirroring the reference's per-script dataflow operators.  All are
built-in Spark SQL (whole-stage codegen, Catalyst-optimizable); none use
Python UDFs.
"""

from transcriptomics_data_integration_spark.operators.filters import (
    exclude_ids,
    keep_ids,
    low_value_floor,
    nonspecific_filter_topk,
    remove_outlier_samples,
    reliability_filter,
    zero_repair,
    zero_variance_filter,
)
from transcriptomics_data_integration_spark.operators.joins import interval_join, left_merge
from transcriptomics_data_integration_spark.operators.aggregates import (
    argmax_dedup,
    bitmask_venn,
    frequency_table,
    group_stats,
    library_size,
    set_compare,
)
from transcriptomics_data_integration_spark.operators.windows import top_k_by

__all__ = [
    "argmax_dedup",
    "bitmask_venn",
    "exclude_ids",
    "frequency_table",
    "group_stats",
    "interval_join",
    "keep_ids",
    "left_merge",
    "library_size",
    "low_value_floor",
    "nonspecific_filter_topk",
    "reliability_filter",
    "remove_outlier_samples",
    "set_compare",
    "top_k_by",
    "zero_repair",
    "zero_variance_filter",
]
