"""Entry-point pipelines (SURVEY.md section 3): each reference script
chain re-expressed as a composition of lazy DataFrame transforms.  The
IR between stages is the Catalyst plan; only declared boundary outputs
(registry, .exp matrices, topTables) persist.
"""

from transcriptomics_data_integration_spark.pipelines.expression import build_expression_matrix
from transcriptomics_data_integration_spark.pipelines.diffexpr import differential_expression
from transcriptomics_data_integration_spark.pipelines.meta import meta_analysis

__all__ = [
    "build_expression_matrix",
    "differential_expression",
    "meta_analysis",
]
