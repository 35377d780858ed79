"""R-faithful ``lowess`` (Cleveland 1979) in pure numpy.

The reference fits the voom mean-variance trend with R's
``lowess(sx, sy, f=0.5)`` (`DiffExpression_openPlatform.R:442` via
``limma::voom``) and uses ``approxfun(lo, rule=2)`` to evaluate the
trend at arbitrary abscissae.  This module reimplements the exact
algorithm of R's ``stats::lowess`` (C source ``lowess.c:clowess``):

- nearest-``ns`` neighbour window with ``ns = max(2, min(n, floor(f*n
  + 1e-7)))``,
- tricube weights ``(1 - (r/h)^3)^3`` with the 0.001/0.999 h
  boundary handling,
- local weighted LINEAR fit (falls back to the weighted mean when the
  x-spread within the window is degenerate),
- ``delta`` interpolation skipping (R default ``0.01 * range(x)``),
- ``iter`` robustifying passes with bisquare weights off
  ``6 * median(|residual|)``.

Driver/executor-side only: callers feed it bounded relations (the
per-gene (mean, sqrt_sd) aggregate — gene count is O(10^4..10^6),
documented in SURVEY §2.5 M5) inside an Arrow-batched applyInPandas,
never row-at-a-time.
"""

from __future__ import annotations

import numpy as np


def _lowest(x: np.ndarray, y: np.ndarray, xs: float, nleft: int, nright: int,
            rw: np.ndarray | None) -> tuple[float, bool]:
    """One local fit at ``xs`` over the window [nleft, nright]
    (mirrors ``lowess.c:lowest``). Returns (fitted, ok)."""
    n = len(x)
    rng = x[n - 1] - x[0]
    h = max(xs - x[nleft], x[nright] - xs)
    h9 = 0.999 * h
    h1 = 0.001 * h

    # weights over [nleft, j_max]; R scans past nright while r <= h9
    j = np.arange(nleft, n)
    r = np.abs(x[j] - xs)
    # points beyond the first x[j] > xs with r > h9 are excluded: R
    # breaks at the first such j.  Find the scan end.
    beyond = (r > h9) & (x[j] > xs)
    end = int(np.argmax(beyond)) if beyond.any() else len(j)
    j = j[:end]
    r = r[:end]
    w = np.zeros(len(j))
    inside = r <= h9
    big = inside & (r > h1)
    w[big] = (1.0 - (r[big] / h) ** 3) ** 3
    w[inside & ~big] = 1.0
    if rw is not None:
        w[inside] *= rw[j[inside]]
    a = w.sum()
    if a <= 0:
        return 0.0, False
    w = w / a
    if h > 0:
        # weighted linear fit evaluated at xs
        xm = float(np.dot(w, x[j]))
        b = xs - xm
        c = float(np.dot(w, (x[j] - xm) ** 2))
        if np.sqrt(c) > 0.001 * rng:
            b = b / c
            coef = w * (b * (x[j] - xm) + 1.0)
            return float(np.dot(coef, y[j])), True
    return float(np.dot(w, y[j])), True


def lowess_sorted(x: np.ndarray, y: np.ndarray, f: float = 2.0 / 3.0,
                  iter: int = 3, delta: float | None = None) -> np.ndarray:
    """Fitted values at each (already sorted, tie-stable) ``x``.
    Exact port of ``clowess``; ``delta=None`` applies R's default
    ``0.01 * range(x)``."""
    n = len(x)
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if n < 2:
        return y.copy()
    ns = max(2, min(n, int(f * n + 1e-7)))
    if delta is None:
        delta = 0.01 * (x[n - 1] - x[0])
    ys = np.zeros(n)
    rw: np.ndarray | None = None

    for iteration in range(iter + 1):
        nleft, nright = 0, ns - 1
        last = -1
        i = 0
        while True:
            if nright < n - 1:
                # move the ns-point window right while it gets closer to x[i]
                while nright < n - 1:
                    d1 = x[i] - x[nleft]
                    d2 = x[nright + 1] - x[i]
                    if d1 <= d2:
                        break
                    nleft += 1
                    nright += 1
            fit, ok = _lowest(x, y, float(x[i]), nleft, nright, rw)
            ys[i] = fit if ok else y[i]
            # interpolate skipped points in (last, i)
            if last < i - 1:
                denom = x[i] - x[last]
                for jj in range(last + 1, i):
                    alpha = (x[jj] - x[last]) / denom if denom > 0 else 1.0
                    ys[jj] = alpha * ys[i] + (1.0 - alpha) * ys[last]
            last = i
            cut = x[last] + delta
            i = last + 1
            while i < n:
                if x[i] > cut:
                    break
                if x[i] == x[last]:
                    ys[i] = ys[last]
                    last = i
                i += 1
            i = max(last + 1, i - 1)
            if last >= n - 1:
                break
        if iteration == iter:
            break
        # bisquare robustness weights off 6 * median |residual|
        res = y - ys
        ares = np.abs(res)
        m1 = float(np.median(ares))
        # R: cmad = 6 * (rw[m1] + rw[m2]) / 2 for even n (median of sorted)
        cmad = 6.0 * m1
        if cmad < 1e-7 * np.mean(ares + 1e-300) or cmad == 0.0:
            break  # essentially exact fit — R breaks out early
        c9 = 0.999 * cmad
        c1 = 0.001 * cmad
        rw = np.zeros(n)
        small = ares <= c1
        mid = (ares > c1) & (ares <= c9)
        rw[small] = 1.0
        rw[mid] = (1.0 - (ares[mid] / cmad) ** 2) ** 2
    return ys


def lowess(x: np.ndarray, y: np.ndarray, f: float = 2.0 / 3.0,
           iter: int = 3, delta: float | None = None
           ) -> tuple[np.ndarray, np.ndarray]:
    """R ``lowess``: sorts by x (stable — ties keep input order, like
    R's ``sort`` with index return) and returns (x_sorted, fitted)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    order = np.argsort(x, kind="stable")
    xs = x[order]
    ysrt = y[order]
    return xs, lowess_sorted(xs, ysrt, f=f, iter=iter, delta=delta)


def approx_rule2(xout: np.ndarray, xf: np.ndarray, yf: np.ndarray) -> np.ndarray:
    """R ``approxfun(x, y, rule=2, ties=mean)``: linear interpolation
    with endpoint clamping; duplicate x collapse to their mean y."""
    xf = np.asarray(xf, dtype=float)
    yf = np.asarray(yf, dtype=float)
    if len(xf) > 1:
        ux, inv = np.unique(xf, return_inverse=True)
        if len(ux) < len(xf):
            sums = np.zeros(len(ux))
            cnts = np.zeros(len(ux))
            np.add.at(sums, inv, yf)
            np.add.at(cnts, inv, 1.0)
            xf, yf = ux, sums / cnts
    return np.interp(np.asarray(xout, dtype=float), xf, yf)
