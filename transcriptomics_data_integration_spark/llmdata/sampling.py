"""Deterministic sampling for training-data pipelines.

`rand()`-based sampling is not reproducible across retries, partitions,
or engines; at 100 TB a failed stage re-rolls its rows.  Both operators
here key the decision on a content hash (md5-derived 60-bit integer,
the same primitive as the dedup family), so the sample is a pure
function of the data: stable under retries, re-partitioning, engine
swap (DuckDB computes the identical hash), and incremental reruns.

- ``hash_sample``: Bernoulli p-sampling — keep rows whose hash falls
  under p * 2^60.  One scan, no shuffle, no state.
- ``stratified_sample_exact``: exactly n rows per group — rank rows
  within each group by hash (deterministic tie-break on the key) and
  keep the first n.  One shuffle on the group key; the rank window
  input is the group's rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.llmdata.dedup import _md5_60bit

_HASH_SPACE = float(1 << 60)


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with
    md5_60bit(key) < rate * 2^60.  The hash is uniform on [0, 2^60), so
    the kept fraction converges to ``rate``; membership is decided by
    the key alone."""
    return df.where(_md5_60bit(F.col(key_col).cast("string")) < int(rate * _HASH_SPACE))


def stratified_sample_exact(
    df: DataFrame, group_col: str, key_col: str, n_per_group: int
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group (fewer if the group is
    smaller), chosen by hash order — a deterministic "shuffle" that
    needs no seed bookkeeping.  The classic balance step (equal docs
    per language / per source) of a corpus-construction pipeline."""
    w = Window.partitionBy(group_col).orderBy(
        _md5_60bit(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )
