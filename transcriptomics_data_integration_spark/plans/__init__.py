"""Plan introspection utilities (SURVEY.md §4 discipline checks)."""

from transcriptomics_data_integration_spark.plans.inspect import (
    explain_formatted,
    plan_report,
)

__all__ = ["explain_formatted", "plan_report"]
