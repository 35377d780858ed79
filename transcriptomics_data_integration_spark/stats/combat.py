"""ComBat empirical-Bayes batch correction (SURVEY.md M6), after
Johnson, Li & Rabinovic 2007 (public algorithm; the reference drives it
via sva at `scripts/data_integration/DiffExpression_closedPlatform.R:368-437`
with a numerically-stabilized nonparametric prior `:108-156`).

Spark decomposition (the 100 TB shape):

1. **Standardization** — per-(gene, batch) and per-gene moments are two
   hash aggregations over the raw rows (partial+final, one shuffle on
   gene); grand mean is the n_i-weighted batch-mean average and
   var_pooled the per-gene mean squared residual, exactly as sva.
2. **EB priors + iterative solve** — operates on the per-(gene, batch)
   moment table (|genes| x |batches| rows, tiny next to the data).
   Runs per batch in ``applyInPandas`` (vectorized numpy; the sva
   ``it.sol`` fixed-point: gamma* posterior-mean update, delta*
   inverse-gamma update, to tolerance).  No raw data touches Python.
3. **Adjustment** — broadcast-join gamma*/delta* back and apply the
   closed-form correction; pure column math.

Confounding guard: like the reference's check (`:390-418`), refuse a
batch that is perfectly confounded with the biological group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EB_SCHEMA = (
    "gene_id string, batch string, gamma_star double, delta_star double"
)


def check_confounding(df: DataFrame, batch_col: str, group_col: str) -> bool:
    """True if every batch contains more than one biological group
    (reference confound check, `DiffExpression_closedPlatform.R:390-418`)."""
    per_batch = df.groupBy(batch_col).agg(
        F.countDistinct(group_col).alias("n_groups")
    )
    return per_batch.where(F.col("n_groups") < 2).count() == 0


def _eb_solver(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch parametric EB fixed point (sva's it.sol), vectorized
    over genes.  Input columns: gene_id, batch, n, g_hat (per-batch
    standardized mean), d_hat (per-batch standardized sample var),
    s_sum, s_sum2 (standardized sums for the sum2 update)."""
    import numpy as np

    g_hat = pdf["g_hat"].to_numpy()
    d_hat = pdf["d_hat"].to_numpy()
    n = pdf["n"].to_numpy().astype(float)
    s_sum = pdf["s_sum"].to_numpy()
    s_sum2 = pdf["s_sum2"].to_numpy()

    gamma_bar = g_hat.mean()
    t2 = g_hat.var(ddof=1) if len(g_hat) > 1 else 1.0
    m = d_hat.mean()
    v = d_hat.var(ddof=1) if len(d_hat) > 1 else 1.0
    # inverse-gamma method-of-moments priors (sva aprior/bprior)
    aprior = (2.0 * v + m * m) / v if v > 0 else 2.0
    bprior = (m * v + m**3) / v if v > 0 else m

    g_new = g_hat.copy()
    d_new = d_hat.copy()
    for _ in range(100):
        g_old, d_old = g_new, d_new
        g_new = (n * t2 * g_hat + d_old * gamma_bar) / (n * t2 + d_old)
        # sum2 = sum_j (s_j - gamma)^2 = s_sum2 - 2 gamma s_sum + n gamma^2
        sum2 = s_sum2 - 2.0 * g_new * s_sum + n * g_new * g_new
        d_new = (0.5 * sum2 + bprior) / (n / 2.0 + aprior - 1.0)
        if max(
            float(abs(g_new - g_old).max() / (abs(g_old).max() + 1e-12)),
            float(abs(d_new - d_old).max() / (abs(d_old).max() + 1e-12)),
        ) < 1e-8:
            break
    return pd.DataFrame(
        {
            "gene_id": pdf["gene_id"],
            "batch": pdf["batch"],
            "gamma_star": g_new,
            "delta_star": d_new,
        }
    )


def _eb_solver_nonparametric(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch NONPARAMETRIC EB posterior — the reference's patched
    ``int.eprior`` (`DiffExpression_closedPlatform.R:108-156`, injected
    into the sva namespace at `:169`): for each gene, the posterior
    (gamma*, delta*) is the likelihood-weighted mean of every OTHER
    gene's (g_hat, d_hat), with the log-sum-exp max-shift the reference
    added for numerical stability (`:135-147`).

    The per-gene Gaussian log-likelihood needs only this gene's
    standardized moments:  sum_k (x_k - g_j)^2
    = s_sum2 - 2 g_j s_sum + n g_j^2, so the whole batch solves as a
    G x G matrix — evaluated in row blocks to bound memory (a 10k-gene
    post-F5 batch is 100M doubles unblocked).
    """
    import numpy as np

    g_hat = pdf["g_hat"].to_numpy()
    d_hat = pdf["d_hat"].to_numpy()
    n = pdf["n"].to_numpy().astype(float)
    s_sum = pdf["s_sum"].to_numpy()
    s_sum2 = pdf["s_sum2"].to_numpy()
    G = len(g_hat)
    if G < 2:
        return pd.DataFrame(
            {
                "gene_id": pdf["gene_id"],
                "batch": pdf["batch"],
                "gamma_star": g_hat,
                "delta_star": d_hat,
            }
        )
    log_norm = -0.5 * np.log(2.0 * np.pi * d_hat)  # per candidate j
    g_star = np.empty(G)
    d_star = np.empty(G)
    block = 1024
    for lo in range(0, G, block):
        hi = min(lo + block, G)
        # ss[i, j] = sum_k (x_ik - g_j)^2 from moments
        ss = (
            s_sum2[lo:hi, None]
            - 2.0 * s_sum[lo:hi, None] * g_hat[None, :]
            + n[lo:hi, None] * g_hat[None, :] ** 2
        )
        ll = n[lo:hi, None] * log_norm[None, :] - ss / (2.0 * d_hat[None, :])
        idx = np.arange(lo, hi)
        ll[idx - lo, idx] = -np.inf  # leave-one-out: drop gene i itself
        m = ll.max(axis=1, keepdims=True)
        w = np.exp(ll - m)
        denom = w.sum(axis=1)
        g_star[lo:hi] = (w @ g_hat) / denom
        d_star[lo:hi] = (w @ d_hat) / denom
    return pd.DataFrame(
        {
            "gene_id": pdf["gene_id"],
            "batch": pdf["batch"],
            "gamma_star": g_star,
            "delta_star": d_star,
        }
    )


def combat(
    df: DataFrame,
    gene_col: str,
    sample_col: str,
    batch_col: str,
    value_col: str,
    prior: str = "parametric",
) -> DataFrame:
    """EB batch correction of a long expression relation.  Returns the
    input columns with ``value_col`` replaced by the adjusted value.
    ``prior``: "parametric" (sva default, iterative fixed point) or
    "nonparametric" (the reference's log-sum-exp ``int.eprior``).
    """
    g, b, v = F.col(gene_col), F.col(batch_col), F.col(value_col)

    # --- step 1: moments (two shuffles on gene, map-side combined) ---
    per_gb = df.groupBy(gene_col, batch_col).agg(
        F.count(v).alias("n_gb"), F.avg(v).alias("mean_gb")
    )
    per_g = (
        per_gb.groupBy(gene_col)
        .agg(
            F.sum(F.col("n_gb") * F.col("mean_gb")).alias("_wsum"),
            F.sum("n_gb").alias("n_g"),
        )
        .withColumn("grand_mean", F.col("_wsum") / F.col("n_g"))
        .drop("_wsum")
    )
    with_fit = (
        df.join(F.broadcast(per_gb), [gene_col, batch_col])
        .join(F.broadcast(per_g), gene_col)
    )
    var_pooled = (
        with_fit.groupBy(gene_col)
        .agg(
            (F.sum((v - F.col("mean_gb")) ** 2) / F.first("n_g")).alias("var_pooled")
        )
        .where(F.col("var_pooled") > 0)
    )

    # --- step 2: standardized moments per (gene, batch) ---
    std = (
        with_fit.join(F.broadcast(var_pooled), gene_col)
        .withColumn("s", (v - F.col("grand_mean")) / F.sqrt(F.col("var_pooled")))
    )
    s_moments = std.groupBy(gene_col, batch_col).agg(
        F.count("s").alias("n"),
        F.avg("s").alias("g_hat"),
        F.var_samp("s").alias("d_hat"),
        F.sum("s").alias("s_sum"),
        F.sum(F.col("s") * F.col("s")).alias("s_sum2"),
    ).where(F.col("d_hat").isNotNull() & (F.col("d_hat") > 0))

    eb_in = s_moments.select(
        F.col(gene_col).cast("string").alias("gene_id"),
        F.col(batch_col).cast("string").alias("batch"),
        "n",
        "g_hat",
        "d_hat",
        "s_sum",
        "s_sum2",
    )
    solver = _eb_solver if prior == "parametric" else _eb_solver_nonparametric
    eb = eb_in.groupBy("batch").applyInPandas(solver, schema=EB_SCHEMA)

    # --- step 3: adjust ---
    adjusted = (
        std.join(
            F.broadcast(
                eb.select(
                    F.col("gene_id").alias("_g"),
                    F.col("batch").alias("_b"),
                    "gamma_star",
                    "delta_star",
                )
            ),
            (g.cast("string") == F.col("_g")) & (b.cast("string") == F.col("_b")),
        )
        .withColumn(
            value_col,
            (F.col("s") - F.col("gamma_star"))
            / F.sqrt(F.col("delta_star"))
            * F.sqrt(F.col("var_pooled"))
            + F.col("grand_mean"),
        )
    )
    return adjusted.select(gene_col, sample_col, batch_col, value_col)


def batch_mean_center(
    df: DataFrame, gene_col: str, batch_col: str, value_col: str
) -> DataFrame:
    """Location-only batch adjustment (the closed-form core of ComBat
    without EB scale moderation): x - batch_mean_g + grand_mean_g with
    the n-weighted grand mean.  Pure SQL; oracle-checkable."""
    per_gb = df.groupBy(gene_col, batch_col).agg(
        F.count(value_col).alias("n_gb"), F.avg(value_col).alias("mean_gb")
    )
    per_g = (
        per_gb.groupBy(gene_col)
        .agg(
            (F.sum(F.col("n_gb") * F.col("mean_gb")) / F.sum("n_gb")).alias("grand_mean")
        )
    )
    return (
        df.join(F.broadcast(per_gb.select(gene_col, batch_col, "mean_gb")), [gene_col, batch_col])
        .join(F.broadcast(per_g), gene_col)
        .withColumn(value_col, F.col(value_col) - F.col("mean_gb") + F.col("grand_mean"))
        .drop("mean_gb", "grand_mean", "n_gb")
    )
