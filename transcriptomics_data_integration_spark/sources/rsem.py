"""S6 — RSEM ``.results`` adapter.

Reference: ``Convert_RSEMprocessed.pl:68-124`` — remap gene symbols to
Ensembl ids via the gene-info dimension, DROPPING rows without a
mapping (`:117-121`), and emit per-sample count files.

Spark: inner broadcast join (unmapped rows fall out, exactly the
reference's drop) + rounding of RSEM's fractional expected counts to
integer read counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convert_rsem(
    rsem: DataFrame,
    gene_info: DataFrame,
    symbol_col: str = "gene_symbol",
    id_col: str = "ensembl_id",
    count_col: str = "expected_count",
) -> DataFrame:
    """(gene_symbol, sample_id, expected_count) + gene_info ->
    (gene_id, sample_id, read_count).  Symbols mapping to multiple ids
    keep the lexicographically first id (deterministic; the reference
    takes the hash-iteration first, which is unstable — this is the
    reproducible tightening of the same contract)."""
    mapping = (
        gene_info.select(symbol_col, id_col)
        .groupBy(symbol_col)
        .agg(F.min(id_col).alias("gene_id"))
    )
    return (
        rsem.join(F.broadcast(mapping), symbol_col, "inner")
        .select(
            "gene_id",
            "sample_id",
            F.round(F.col(count_col)).cast("long").alias("read_count"),
        )
    )
