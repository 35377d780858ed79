"""Accuracy of the portable normal-distribution SQL (functions/normal.py)
evaluated through Spark, pinned against published table values."""

from __future__ import annotations

import pytest

from transcriptomics_data_integration_spark.functions.normal import (
    norm_cdf_sql,
    norm_ppf_sql,
    two_sided_p_sql,
)


def _eval(spark, expr: str) -> float:
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


@pytest.mark.parametrize(
    ("p", "expected"),
    [
        (0.001, -3.0902323061678132),
        (0.025, -1.9599639845400545),
        (0.5, 0.0),
        (0.975, 1.9599639845400545),
        (0.999, 3.0902323061678132),
    ],
)
def test_norm_ppf(spark, p, expected):
    got = _eval(spark, norm_ppf_sql(f"{p:.17e}"))
    assert got == pytest.approx(expected, abs=5e-9)


@pytest.mark.parametrize(
    ("x", "expected"),
    [
        (-1.96, 0.024997895148220435),
        (0.0, 0.5),
        (1.6448536269514722, 0.95),
        (3.0, 0.9986501019683699),
    ],
)
def test_norm_cdf(spark, x, expected):
    got = _eval(spark, norm_cdf_sql(f"{x:.17e}"))
    assert got == pytest.approx(expected, abs=1e-7)


def test_two_sided_p(spark):
    # 2 * P(Z > 1.96) = 0.05
    got = _eval(spark, two_sided_p_sql(f"{1.959963984540054:.17e}"))
    assert got == pytest.approx(0.05, abs=1e-6)
    # never exactly zero, even for huge statistics (ANSI log safety)
    got = _eval(spark, two_sided_p_sql("250.0e0"))
    assert got > 0
