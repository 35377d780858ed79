"""S9 — idempotent dataset-registry upsert.

Reference: ``GenExpression_InputFiles.txt`` gains a row iff the
DatasetName is absent (`scripts/rna-seq_data_processing/
GenExpression_RNAseq.pl:104-131`; `QC_Affy_U133Plus2.R:90-104`).

Spark shape: left-anti join of the incoming rows against the existing
registry on the key, then union — the Delta-style MERGE emulation for
plain parquet (append of the anti-joined delta + downstream
``dropDuplicates`` on the key gives the same at-least-once contract for
concurrent writers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def registry_upsert(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Rows of ``incoming`` whose ``key`` is absent from ``existing``
    are appended; existing rows win (first-write semantics, matching
    the reference's append-iff-absent)."""
    fresh = incoming.join(existing.select(key).distinct(), key, "left_anti").dropDuplicates(
        [key]
    )
    return existing.unionByName(fresh)


def registry_append_delta(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """The delta to append for a parquet-backed registry (what a
    MERGE-less object store write needs)."""
    return incoming.join(existing.select(key).distinct(), key, "left_anti").dropDuplicates([key])
