"""Plan-discipline guards + median-polish golden test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.plans import plan_report
from transcriptomics_data_integration_spark.stats.medianpolish import (
    _median_polish_matrix,
    median_polish_summarize,
)


def test_plan_report_counts_broadcast_and_pruning(spark, tmp_path):
    big = spark.range(10000).select(
        F.col("id"), (F.col("id") % 50).alias("k"), F.rand(7).alias("v"), F.lit("x").alias("unused")
    )
    p = str(tmp_path / "big.parquet")
    big.write.mode("overwrite").parquet(p)
    fact = spark.read.parquet(p)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(50)], ["k", "name"])
    q = (
        fact.where(F.col("id") > 100)
        .join(F.broadcast(dim), "k")
        .groupBy("name")
        .agg(F.sum("v").alias("s"))
    )
    rep = plan_report(q)
    # AQE formatted output can list the join in both the initial and
    # final plans
    assert rep.n_broadcast_joins >= 1
    assert rep.n_nested_loop_joins == 0
    assert rep.pushed_filters  # id > 100 reached the scan
    assert "unused" not in rep.read_columns()  # column pruning held


def test_median_polish_additive_matrix_exact():
    # purely additive matrix: x_ij = mu + r_i + c_j -> residuals 0,
    # summarized expression = mu + c_j
    import numpy as np

    mu, r, c = 5.0, np.array([0.0, 1.0, -1.0]), np.array([0.0, 2.0, 4.0, 6.0])
    mat = mu + r[:, None] + c[None, :]
    overall, row_eff, col_eff = _median_polish_matrix(mat.copy())
    est = overall + col_eff
    assert np.allclose(est, mu + c, atol=1e-9)


def test_median_polish_summarize_spark(spark):
    rows = []
    for ps, base in [("ps1", 5.0), ("ps2", 8.0)]:
        for p in range(3):
            for s, c in [("sA", 0.0), ("sB", 2.0)]:
                rows.append((ps, f"{ps}_p{p}", s, base + 0.5 * p + c))
    df = spark.createDataFrame(rows, ["probeset", "probe", "sample_id", "value"])
    out = median_polish_summarize(df, "probeset", "probe", "sample_id", "value")
    got = {(r["probeset"], r["sample"]): r["expression"] for r in out.collect()}
    # additive structure: expression difference between samples == 2.0
    assert got[("ps1", "sB")] - got[("ps1", "sA")] == pytest.approx(2.0, abs=1e-9)
    assert got[("ps2", "sB")] - got[("ps2", "sA")] == pytest.approx(2.0, abs=1e-9)
    # probeset levels preserved (median probe effect folds into overall)
    assert got[("ps2", "sA")] - got[("ps1", "sA")] == pytest.approx(3.0, abs=1e-9)
