"""Median-polish probeset summarization (SURVEY.md M2).

Reference: RMA/PLM's probe-level model fit per probeset
(`GenExpressionComb_Affy_HuEx1ST.R:223-230`; the classical RMA
summarization is Tukey median polish of the log2 probe x sample matrix,
keeping the column (sample) effects + overall as the probeset
expression).

Spark shape: grouped-map over probesets (``applyInPandas``) — each
probeset's matrix is tiny (O(4-40) probes x O(10-1000) samples), the
probeset dimension is the parallel axis, Arrow carries the batches.
This is the canonical "(b) Pandas-UDF-backed" custom-operator tier:
iterative row/column median sweeps have no closed SQL form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _median_polish_matrix(mat, max_iter: int = 10, tol: float = 1e-6):
    import numpy as np

    overall = 0.0
    row_eff = np.zeros(mat.shape[0])
    col_eff = np.zeros(mat.shape[1])
    resid = mat.astype(float).copy()
    for _ in range(max_iter):
        row_med = np.median(resid, axis=1)
        resid -= row_med[:, None]
        row_eff += row_med
        col_med_of_row = np.median(row_eff)
        row_eff -= col_med_of_row
        overall += col_med_of_row

        col_med = np.median(resid, axis=0)
        resid -= col_med[None, :]
        col_eff += col_med
        row_med_of_col = np.median(col_eff)
        col_eff -= row_med_of_col
        overall += row_med_of_col
        if max(np.abs(row_med).max(initial=0), np.abs(col_med).max(initial=0)) < tol:
            break
    return overall, row_eff, col_eff


def median_polish_summarize(
    df: DataFrame,
    probeset_col: str,
    probe_col: str,
    sample_col: str,
    value_col: str,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> DataFrame:
    """(probeset, probe, sample, value) -> (probeset, sample, expression)
    with expression = overall + column effect (RMA contract).

    ``tol=0`` forces exactly ``max_iter`` sweep pairs — the
    fixed-iteration form is closed over medians/subtractions, so (on
    integer-valued input, where every intermediate is an exactly-
    representable dyadic rational) it admits a SQL oracle
    (`median_polish_fixed` in the suite)."""
    import numpy as np

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pivot = pdf.pivot_table(
            index="probe", columns="sample", values="value", aggfunc="first"
        ).sort_index(axis=0).sort_index(axis=1)
        mat = pivot.to_numpy()
        if np.isnan(mat).any():
            # fill missing cells with the probe median (rare edge)
            row_med = np.nanmedian(mat, axis=1)
            idx = np.where(np.isnan(mat))
            mat[idx] = np.take(row_med, idx[0])
        overall, _, col_eff = _median_polish_matrix(mat, max_iter=max_iter, tol=tol)
        return pd.DataFrame(
            {
                "probeset": pdf["probeset"].iloc[0],
                "sample": pivot.columns,
                "expression": overall + col_eff,
            }
        )

    prepped = df.selectExpr(
        f"CAST({probeset_col} AS STRING) AS probeset",
        f"CAST({probe_col} AS STRING) AS probe",
        f"CAST({sample_col} AS STRING) AS sample",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return prepped.groupBy("probeset").applyInPandas(
        fit, schema="probeset string, sample string, expression double"
    )
