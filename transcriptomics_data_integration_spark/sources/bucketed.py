"""Bucketed storage for co-located joins (SURVEY.md §4 partitioning
discipline; PLANS.md "bucketing for co-located joins").

The expression fact and its per-gene companion relations (annotation
maps, DE results, meta-analysis outputs) are all keyed by gene.  Writing
them bucketed by the gene key lets every downstream gene-keyed
equi-join and aggregation run WITHOUT an exchange: Spark trusts the
on-disk hash distribution (``HashPartitioning`` reported by the scan),
so joins between same-bucketed tables are zipper joins of pre-sorted
buckets.  At 100 TB this converts the dominant repeated shuffle of the
pipeline (gene-keyed join after gene-keyed join) into none.

Bucket count guidance: ~2-4x the expected executor-core count, fixed at
write time; all co-joining tables MUST share (key, bucket count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: str | None = None,
) -> None:
    """Hive-style partitioned parquet layout (``col=value/`` dirs) —
    the lake layout for 100 TB facts: a filter on a partition column
    prunes whole directories at planning time (PartitionFilters in the
    scan, zero IO for pruned partitions), vs parquet row-group skipping
    which still opens files.

    Partition by LOW-cardinality query-sliced columns (date, lang,
    platform, source); never by high-cardinality keys (gene, doc) —
    small-file explosion.  ``sort_within`` sorts rows inside each file
    for row-group min/max locality on a second column.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*partition_cols, sort_within)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
