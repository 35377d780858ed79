"""EM imputation under the two-way additive model (M16 full
fidelity, stats/mlkernels.py:impute_missing_em)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.stats.mlkernels import (
    impute_missing,
    impute_missing_em,
)


def _collect_cells(df):
    return {(r["gene_id"], r["sample_id"]): r["value"] for r in df.collect()}


def test_em_degenerates_to_mean_fill_without_sample_effects(spark):
    """Data with NO sample effect and balanced missingness: the EM
    fill equals the per-gene observed mean (the VERDICT property —
    mean fill is the fixed point when b_s = 0)."""
    rows = []
    for g in range(8):
        for s in range(6):
            if (g + s) % 6 == 0:  # one hole per gene, rotating sample
                continue
            rows.append((g, s, float(10 * g)))  # constant per gene
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    out = _collect_cells(impute_missing_em(df, "gene_id", "sample_id", "value", max_iter=5))
    assert len(out) == 48
    for g in range(8):
        for s in range(6):
            assert out[(g, s)] == pytest.approx(10.0 * g, abs=1e-9)


def test_em_recovers_exact_additive_structure(spark):
    """x = mu + a_g + b_s exactly, some cells deleted: EM converges to
    the true values (identifiable for a connected missing pattern)."""
    mu, a, b = 100.0, [0.0, 5.0, -3.0, 8.0, -10.0], [0.0, 2.0, -1.0, 4.0]
    holes = {(0, 1), (2, 3), (4, 0), (1, 2)}
    rows = [
        (g, s, mu + a[g] + b[s])
        for g in range(5) for s in range(4) if (g, s) not in holes
    ]
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    out = _collect_cells(
        impute_missing_em(df, "gene_id", "sample_id", "value", max_iter=50, tol=1e-12)
    )
    for (g, s) in holes:
        assert out[(g, s)] == pytest.approx(mu + a[g] + b[s], abs=1e-6)


def test_em_beats_mean_fill_with_sample_effects(spark):
    """With real sample effects, EM reconstruction error on held-out
    cells is far below plain per-gene mean fill."""
    rng = np.random.RandomState(11)
    mu = 50.0
    a = rng.randn(20) * 5
    b = rng.randn(8) * 4
    truth = {(g, s): float(mu + a[g] + b[s]) for g in range(20) for s in range(8)}
    holes = {(g, int(rng.randint(8))) for g in range(20)}
    rows = [(g, s, v) for (g, s), v in truth.items() if (g, s) not in holes]
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])

    em = _collect_cells(impute_missing_em(df, "gene_id", "sample_id", "value", max_iter=30))
    dense = spark.createDataFrame(
        [(g, s, truth[(g, s)] if (g, s) not in holes else None)
         for g in range(20) for s in range(8)],
        "gene_id long, sample_id long, value double",
    )
    mean_fill = _collect_cells(impute_missing(dense, "value"))

    err_em = max(abs(em[h] - truth[h]) for h in holes)
    err_mean = max(abs(mean_fill[h] - truth[h]) for h in holes)
    assert err_em < err_mean / 3


def test_em_observed_cells_untouched(spark):
    rows = [(g, s, float(g * 7 + s * 3 + (g * s) % 5))
            for g in range(6) for s in range(5) if (g * 3 + s) % 7 != 0]
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    out = _collect_cells(impute_missing_em(df, "gene_id", "sample_id", "value", max_iter=3))
    for g, s, v in rows:
        assert out[(g, s)] == v
    # and every grid cell is present afterwards
    assert len(out) == 30
