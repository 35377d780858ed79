"""Golden/property tests for the R-faithful lowess port
(stats/lowess.py) — the M5 voom trend engine."""

from __future__ import annotations

import numpy as np
import pytest

from transcriptomics_data_integration_spark.stats.lowess import (
    approx_rule2,
    lowess,
    lowess_sorted,
)


def _direct_fit(x, y, xs, ns, rw=None):
    """Independent reference: tricube-weighted linear fit at xs over
    the ns nearest neighbours, computed straight from the Cleveland
    (1979) definition with numpy normal equations."""
    d = np.abs(x - xs)
    idx = np.argsort(d, kind="stable")[:ns]
    h = d[idx].max()
    w = np.zeros(len(x))
    r = d[idx]
    wloc = np.where(r <= 0.001 * h, 1.0, (1 - np.clip(r / h, 0, 1) ** 3) ** 3)
    wloc[r > 0.999 * h] = np.where(
        (r[r > 0.999 * h] <= h), wloc[r > 0.999 * h], 0.0
    )
    w[idx] = wloc
    if rw is not None:
        w *= rw
    w = w / w.sum()
    xm = np.dot(w, x)
    c = np.dot(w, (x - xm) ** 2)
    if np.sqrt(c) > 0.001 * (x.max() - x.min()):
        b = np.dot(w, (x - xm) * y) / c
        a = np.dot(w, y)
        return a + b * (xs - xm)
    return np.dot(w, y)


def test_exact_line_is_reproduced():
    x = np.linspace(0, 10, 50)
    y = 2.0 * x + 1.0
    xf, yf = lowess(x, y, f=0.5, iter=3)
    assert np.allclose(yf, 2.0 * xf + 1.0, atol=1e-10)


def test_matches_direct_tricube_fit_no_robustness():
    rng = np.random.RandomState(7)
    x = np.sort(rng.uniform(0, 1, 40))
    y = np.sin(3 * x) + 0.1 * rng.randn(40)
    ns = max(2, min(40, int(0.5 * 40 + 1e-7)))
    got = lowess_sorted(x, y, f=0.5, iter=0, delta=0.0)
    want = np.array([_direct_fit(x, y, xi, ns) for xi in x])
    assert np.allclose(got, want, atol=1e-9)


def test_robustness_downweights_outlier():
    x = np.linspace(0, 1, 30)
    y = x.copy()
    y[15] = 10.0  # gross outlier
    fit0 = lowess_sorted(x, y, f=0.7, iter=0, delta=0.0)
    fit3 = lowess_sorted(x, y, f=0.7, iter=3, delta=0.0)
    # robust fit should sit far closer to the true line at the outlier
    assert abs(fit3[15] - x[15]) < abs(fit0[15] - x[15]) / 3


def test_delta_interpolation_close_to_exact():
    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(0, 5, 200))
    y = np.cos(x) + 0.05 * rng.randn(200)
    exact = lowess_sorted(x, y, f=0.3, iter=2, delta=0.0)
    fast = lowess_sorted(x, y, f=0.3, iter=2, delta=None)  # R default 1% range
    assert np.max(np.abs(exact - fast)) < 0.02


def test_tied_x_share_fit():
    x = np.array([0.0, 1.0, 1.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 1.0, 2.0, 3.0, 2.0, 3.0])
    got = lowess_sorted(x, y, f=0.8, iter=0, delta=0.5)
    assert got[1] == got[2] == got[3]


def test_approx_rule2_clamps_and_averages_ties():
    xf = np.array([0.0, 1.0, 1.0, 2.0])
    yf = np.array([0.0, 1.0, 3.0, 4.0])
    out = approx_rule2(np.array([-1.0, 0.5, 1.0, 3.0]), xf, yf)
    assert out[0] == 0.0  # clamped left
    assert out[3] == 4.0  # clamped right
    assert out[2] == pytest.approx(2.0)  # tie at x=1 -> mean(1,3)
    assert out[1] == pytest.approx(1.0)  # interp 0 -> (1, mean=2): 0.5*2


def test_unsorted_input_sorted_stably():
    x = np.array([3.0, 1.0, 2.0, 0.0])
    y = 2 * x
    xf, yf = lowess(x, y, f=1.0, iter=0)
    assert np.all(np.diff(xf) >= 0)
    assert np.allclose(yf, 2 * xf, atol=1e-10)
