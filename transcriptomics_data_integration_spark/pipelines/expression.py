"""Entry-point A step 4 — combine+normalize pipeline
(``GenExpressionComb_*``, SURVEY.md section 7 step 1).

Contract (reference `GenExpressionComb_Affy_U133Plus2.R:110-189`):
union the per-study target sheets, drop QC-flagged outlier samples
(F3 `:115-129`), keep reliable probes (F12/J4 `:182` via the ``.flat``
map), quantile-normalize (M1 `:151`), collapse multi-probe genes to
the max-variance probe (A4 `:184`, policy `README.md:74`), emit the
long gene x sample matrix (S2 `:189`).

Partitioning discipline (SURVEY.md section 4.1): the per-sample rank
stage (quantile norm) shuffles by sample; everything after groups by
probe/gene — one re-shuffle total, and the final relation arrives
hash-distributed by gene for downstream per-gene model stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.operators.aggregates import argmax_dedup
from transcriptomics_data_integration_spark.operators.filters import (
    keep_ids,
    remove_outlier_samples,
    zero_variance_filter,
)
from transcriptomics_data_integration_spark.stats.quantile_norm import quantile_normalize


def build_expression_matrix(
    intensities: DataFrame,
    targets: DataFrame,
    outliers: DataFrame,
    probe_map: DataFrame,
    probe_col: str = "probe",
    sample_col: str = "sample_id",
    gene_col: str = "gene_id",
    value_col: str = "value",
    normalize: bool = True,
    detection_keep: DataFrame | None = None,
) -> DataFrame:
    """(probe, sample, value) + dims -> long (gene, sample, value).

    ``targets``: sample sheet (keeps only listed samples, F1);
    ``outliers``: packed exclusion sheet (F3, column ``samples2exclude``);
    ``probe_map``: reliable probe -> gene (the ``.flat`` relation, J4);
    ``detection_keep``: optional F12 feed — probes that pass the
    negative-control detection filter
    (`sources/idat.py:detection_keep_list`, the
    ``lumiR(detectionTh=0.01)`` seam) — semi-joined before the gene
    map so undetected probes never reach normalization.
    """
    kept = keep_ids(intensities, targets.select(sample_col), sample_col)
    kept = remove_outlier_samples(kept, outliers, "samples2exclude", sample_col)
    if detection_keep is not None:
        kept = kept.join(
            F.broadcast(detection_keep.select(probe_col)), probe_col, "left_semi"
        )
    mapped = kept.join(F.broadcast(probe_map.select(probe_col, gene_col)), probe_col)
    if normalize:
        mapped = quantile_normalize(mapped, sample_col, value_col, probe_col).withColumn(
            value_col, F.col("qn_value")
        )
    # one value per (probe, sample) expected; collapse probes per gene by
    # max variance across samples (one-probe-one-gene)
    probe_var = mapped.groupBy(probe_col, gene_col).agg(
        F.var_samp(value_col).alias("_var")
    )
    best_probe = argmax_dedup(probe_var, gene_col, "_var", probe_col).select(
        probe_col, gene_col
    )
    collapsed = mapped.join(F.broadcast(best_probe), [probe_col, gene_col], "left_semi")
    out = collapsed.select(gene_col, sample_col, value_col)
    return zero_variance_filter(out, gene_col, value_col)
