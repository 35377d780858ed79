"""Count-data normalization kernels (SURVEY.md M4, M5, M7, M18).

- ``log2_cpm``: counts -> log2 counts-per-million with the voom
  half-count offset (`DiffExpression_openPlatform.R:427-442`).
- ``voom_weights`` (M5): mean-variance trend -> per-observation
  precision weights.  The lowess trend is replaced by quantile-binned
  medians (piecewise-constant trend) — same shape, closed form, and
  oracle-checkable; weights = trend_sqrt_sd^-4 exactly as voom.
- ``cqn_simplified`` (M4): conditional-quantile normalization reduced
  to its bias-removal core (`GenExpressionComb_RNAseq.R:183-201`,
  method `README.md:101`): per GC-content (and length) bin, subtract
  the bin-median log2-CPM offset relative to the global median.
- ``array_weights`` (M7): per-sample quality weights
  (`DiffExpression_closedPlatform.R:456-464`): inverse mean squared
  residual from per-gene means, normalized to mean 1 — the one-step
  closed form of limma's iterated heuristic.
- ``qc_sample_metrics`` (M18): per-sample distribution summaries
  (quartiles, IQR; the data behind aqm boxplots/RLE,
  `QC_Affy_U133Plus2.R:122-138`).

All pure SQL; trends/medians use exact percentiles (linear
interpolation matches across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def log2_cpm(
    df: DataFrame, sample_col: str, count_col: str, out_col: str = "lcpm"
) -> DataFrame:
    """log2( (count + 0.5) / (libsize + 1) * 1e6 ) — voom's transform."""
    lib = df.groupBy(sample_col).agg(F.sum(count_col).alias("_lib"))
    return (
        df.join(F.broadcast(lib), sample_col)
        .withColumn(
            out_col,
            F.log2(
                (F.col(count_col) + 0.5) / (F.col("_lib") + 1.0) * 1.0e6
            ),
        )
        .drop("_lib")
    )


def voom_weights(
    df: DataFrame,
    gene_col: str,
    sample_col: str,
    count_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Per-gene mean-variance trend on the log2-CPM scale and the voom
    precision weight trend^-4.  Returns one row per gene: mean_lcpm,
    sqrt_sd, trend_bin, trend_sqrt_sd, weight."""
    lcpm = log2_cpm(df, sample_col, count_col)
    per_gene = lcpm.groupBy(gene_col).agg(
        F.avg("lcpm").alias("mean_lcpm"),
        F.sqrt(F.sqrt(F.var_samp("lcpm"))).alias("sqrt_sd"),
        F.count(F.lit(1)).alias("n_obs"),
    ).where(F.col("sqrt_sd").isNotNull() & (F.col("sqrt_sd") > 0))
    # order by the ROUNDED mean for binning: engines' avg() can differ in
    # the last ulp (summation order), and a bin-boundary flip would move a
    # gene between trend bins; rounding to 9 decimals collapses the ulp
    # noise into a deterministic tie broken by gene id
    binned = per_gene.withColumn(
        "trend_bin",
        F.ntile(n_bins).over(
            Window.orderBy(F.round(F.col("mean_lcpm"), 9).asc(), F.col(gene_col).asc())
        ),
    )
    # per-bin median as a WINDOW aggregate: one shuffle by bin and the
    # upstream (lib-size join + per-gene agg + ntile) executes ONCE —
    # the agg+join-back form re-ran that whole subtree as the probe side
    return (
        binned.withColumn(
            "trend_sqrt_sd",
            F.percentile("sqrt_sd", F.lit(0.5)).over(Window.partitionBy("trend_bin")),
        )
        .withColumn("weight", F.pow(F.col("trend_sqrt_sd"), -4.0))
        .select(gene_col, "mean_lcpm", "sqrt_sd", "n_obs", "trend_bin", "trend_sqrt_sd", "weight")
    )


def cqn_simplified(
    df: DataFrame,
    gene_col: str,
    sample_col: str,
    count_col: str,
    gene_attrs: DataFrame,
    gc_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Bias-removal CQN core: log2-CPM, then subtract the GC-bin median
    offset (bin median - global median).  ``gene_attrs``: (gene, gc)."""
    lcpm = log2_cpm(df, sample_col, count_col)
    w = Window.orderBy(F.col(gc_col).asc(), F.col(gene_col).asc())
    bins = gene_attrs.withColumn("gc_bin", F.ntile(n_bins).over(w)).select(gene_col, "gc_bin")
    with_bin = lcpm.join(F.broadcast(bins), gene_col)
    global_med = with_bin.agg(F.percentile("lcpm", F.lit(0.5)).alias("gmed"))
    bin_med = with_bin.groupBy("gc_bin").agg(
        F.percentile("lcpm", F.lit(0.5)).alias("bmed")
    )
    return (
        with_bin.join(F.broadcast(bin_med), "gc_bin")
        .crossJoin(F.broadcast(global_med))
        .withColumn("lcpm_cqn", F.col("lcpm") - (F.col("bmed") - F.col("gmed")))
        .select(gene_col, sample_col, "gc_bin", "lcpm", "lcpm_cqn")
    )


def array_weights(
    df: DataFrame, gene_col: str, sample_col: str, value_col: str
) -> DataFrame:
    """Per-sample quality weight: 1 / mean((x_gs - mean_g)^2),
    normalized so the mean weight is 1."""
    gm = df.groupBy(gene_col).agg(F.avg(value_col).alias("_gm"))
    resid = df.join(F.broadcast(gm), gene_col).withColumn(
        "_r2", (F.col(value_col) - F.col("_gm")) ** 2
    )
    per_sample = resid.groupBy(sample_col).agg(
        (F.sum("_r2") / F.count(F.lit(1))).alias("msr"),
        F.count(F.lit(1)).alias("n_obs"),
    ).where(F.col("msr") > 0)
    inv = per_sample.withColumn("raw_w", 1.0 / F.col("msr"))
    # normalize via a window over the PER-SAMPLE relation (bounded by
    # sample count) — the 1-row agg + crossJoin form re-executed the
    # residual pass as the probe side
    return (
        inv.withColumn("weight", F.col("raw_w") / F.avg("raw_w").over(Window.partitionBy()))
        .select(sample_col, "n_obs", "msr", "weight")
    )


def qc_sample_metrics(df: DataFrame, sample_col: str, value_col: str) -> DataFrame:
    """M18 summary: per-sample quartiles, IQR, mean, count — the data
    behind the reference's QC boxplots/density panels."""
    return df.groupBy(sample_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.percentile(value_col, F.lit(0.25)).alias("q25"),
        F.percentile(value_col, F.lit(0.5)).alias("median"),
        F.percentile(value_col, F.lit(0.75)).alias("q75"),
        (
            F.percentile(value_col, F.lit(0.75)) - F.percentile(value_col, F.lit(0.25))
        ).alias("iqr"),
    )
