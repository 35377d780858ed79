"""S5 — HTSeq count-file source.

Reference: one 2-column (gene, count) TSV per sample; rows whose gene
starts with ``__`` are htseq summary lines and are dropped
(`scripts/rna-seq_data_processing/GenExpressionComb_RNAseq.pl:184-202`,
filter at `:191`); the sample id is the file name.

Spark shape: one distributed CSV scan over a glob of files,
``input_file_name()`` recovers the per-sample identity — no per-file
driver loop (the reference streams file-by-file; here the file set IS
the partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

COUNT_SCHEMA = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("read_count", T.LongType(), True),
    ]
)


def drop_summary_rows(df: DataFrame, gene_col: str = "gene_id") -> DataFrame:
    """Drop htseq's ``__no_feature`` / ``__ambiguous`` / ``__too_low_aQual``
    summary lines (`GenExpressionComb_RNAseq.pl:191`) — shared by the
    file scan below and the gated ``htseq_scan`` suite query."""
    return df.where(~F.col(gene_col).startswith("__"))


def read_htseq_counts(spark: SparkSession, glob_path: str) -> DataFrame:
    """Read a directory/glob of htseq count files into long
    ``(gene_id, sample_id, read_count)``."""
    raw = spark.read.csv(glob_path, sep="\t", schema=COUNT_SCHEMA)
    with_file = raw.withColumn("_file", F.input_file_name())
    sample = F.regexp_replace(
        F.element_at(F.split(F.col("_file"), "/"), -1), r"\.(txt|tsv|counts)$", ""
    )
    return (
        drop_summary_rows(with_file)
        .withColumn("sample_id", sample)
        .select("gene_id", "sample_id", "read_count")
    )


def counts_to_matrix(long_counts: DataFrame, all_genes: DataFrame | None = None) -> DataFrame:
    """Long counts -> dense long (missing (gene, sample) combinations
    fill with 0, mirroring `GenExpressionComb_RNAseq.pl:232-238`)."""
    genes = all_genes if all_genes is not None else long_counts.select("gene_id").distinct()
    samples = long_counts.select("sample_id").distinct()
    dense = genes.crossJoin(samples)
    return (
        dense.join(long_counts, ["gene_id", "sample_id"], "left")
        .withColumn("read_count", F.coalesce(F.col("read_count"), F.lit(0)))
    )
