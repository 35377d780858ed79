"""Sources & sinks (SURVEY.md section 2.1).

The reference's IR is tab-separated gene x sample matrices plus small
registry/target sheets; the engine's canonical interchange is parquet
in long form, with these adapters at the edges:

- ``tsv_matrix``: S1/S2 — wide TSV <-> long DataFrame (melt/pivot)
- ``htseq``: S5 — per-sample (gene, count) files, __-summary filtering
- ``registry``: S9 — idempotent dataset-registry upsert
"""

from transcriptomics_data_integration_spark.sources.tsv_matrix import (
    melt_wide,
    pivot_long,
    read_matrix_tsv,
    write_matrix_tsv,
)
from transcriptomics_data_integration_spark.sources.htseq import read_htseq_counts
from transcriptomics_data_integration_spark.sources.registry import registry_upsert

__all__ = [
    "melt_wide",
    "pivot_long",
    "read_htseq_counts",
    "read_matrix_tsv",
    "registry_upsert",
    "write_matrix_tsv",
]
