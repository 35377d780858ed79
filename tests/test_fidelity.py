"""Full-fidelity M4/M5 kernels: voom lowess trend and CQN robust
spline (VERDICT round-1 items 5-6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.stats.lowess import approx_rule2, lowess
from transcriptomics_data_integration_spark.stats.normalize import (
    _natural_spline_basis,
    cqn_spline,
    log2_cpm,
    voom_weights_lowess,
)


def _toy_counts(spark, n_genes=40, n_samples=4):
    rows = []
    for s in range(n_samples):
        for g in range(n_genes):
            rows.append((g, s, float(10 + g * 5 + (s * 3 + g) % 7)))
    return spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])


def test_voom_lowess_matches_local_reference(spark):
    """The Spark pipeline (distributed agg -> Arrow lowess -> interp)
    must equal computing voom's trend locally from the same lcpm."""
    df = _toy_counts(spark)
    out = {r["gene_id"]: r for r in voom_weights_lowess(
        df, "gene_id", "sample_id", "cnt", f=0.5, iter=3
    ).collect()}

    # local reference from first principles
    pdf = log2_cpm(df, "sample_id", "cnt").toPandas()
    per_gene = pdf.groupby("gene_id")["lcpm"].agg(["mean", "var", "count"])
    sx = per_gene["mean"].to_numpy()
    sy = np.sqrt(np.sqrt(per_gene["var"].to_numpy()))
    xf, yf = lowess(sx, sy, f=0.5, iter=3)
    trend = approx_rule2(sx, xf, yf)

    assert len(out) == len(per_gene)
    for gid, m, sd, tr in zip(per_gene.index, sx, sy, trend):
        r = out[gid]
        assert r["mean_lcpm"] == pytest.approx(m, rel=1e-9)
        assert r["sqrt_sd"] == pytest.approx(sd, rel=1e-9)
        assert r["trend_sqrt_sd"] == pytest.approx(tr, rel=1e-9)
        assert r["weight"] == pytest.approx(tr ** -4.0, rel=1e-9)


def test_voom_lowess_weight_shape(spark):
    """Genes on the high-variance side of the trend get LOWER weights;
    weights positive and finite everywhere."""
    df = _toy_counts(spark, n_genes=60)
    rows = voom_weights_lowess(df, "gene_id", "sample_id", "cnt").collect()
    ws = [r["weight"] for r in rows]
    assert all(np.isfinite(w) and w > 0 for w in ws)
    for r in rows:
        assert r["weight"] == pytest.approx(r["trend_sqrt_sd"] ** -4.0, rel=1e-12)


def test_natural_spline_basis_spans_line_and_is_linear_beyond_boundary():
    x = np.linspace(0, 1, 50)
    knots = np.quantile(x, [0, 0.25, 0.5, 0.75, 1])
    X = _natural_spline_basis(x, knots)
    # exact representation of a line
    beta, *_ = np.linalg.lstsq(X, 3 * x + 2, rcond=None)
    assert np.allclose(X @ beta, 3 * x + 2, atol=1e-10)
    # natural constraint: second differences vanish outside the boundary
    xe = np.array([1.5, 2.0, 2.5, 3.0])
    Xe = _natural_spline_basis(xe, knots)
    rng = np.random.RandomState(0)
    b = rng.randn(X.shape[1])
    ye = Xe @ b
    second_diff = ye[2:] - 2 * ye[1:-1] + ye[:-2]
    assert np.allclose(second_diff, 0.0, atol=1e-8)


def test_cqn_spline_removes_smooth_gc_bias(spark):
    """lcpm constructed with an exact linear GC bias -> the spline fit
    recovers it exactly (Huber converges to OLS on clean data) and
    lcpm_cqn is flat in GC, with the per-sample median level kept."""
    rows, attrs = [], []
    for g in range(60):
        gc = 0.30 + 0.006 * g
        attrs.append((g, gc))
        for s in range(3):
            # counts = 2^(a + b*gc) scaled per sample -> lcpm linear in gc
            rows.append((g, s, float(2 ** (4 + 6 * gc) * (1 + s))))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])
    ga = spark.createDataFrame(attrs, ["gene_id", "gc"])
    out = cqn_spline(df, "gene_id", "sample_id", "cnt", ga, "gc").toPandas()

    for s, grp in out.groupby("sample_id"):
        # raw lcpm strongly correlated with gc; corrected ~ flat
        raw_r = np.corrcoef(grp["gc"], grp["lcpm"])[0, 1]
        # the +0.5/lib+1 offsets make lcpm only approximately linear in
        # gc, so allow a tiny residual trend
        slope = np.polyfit(grp["gc"], grp["lcpm_cqn"], 1)[0]
        raw_slope = np.polyfit(grp["gc"], grp["lcpm"], 1)[0]
        assert abs(raw_r) > 0.99
        assert abs(slope) < abs(raw_slope) / 100
        # exact invariant: the subtracted bias is median-centered, so
        # the overall library level shifts by (at most) a hair
        bias = grp["lcpm"] - grp["lcpm_cqn"]
        assert np.median(bias) == pytest.approx(0.0, abs=1e-9)
        assert np.median(grp["lcpm_cqn"]) == pytest.approx(
            np.median(grp["lcpm"]), abs=1e-3
        )


def test_cqn_spline_robust_to_outlier_genes(spark):
    """A handful of wild outlier genes must not bend the bias curve:
    corrected values of NON-outlier genes stay close to the clean-data
    correction."""
    rows, attrs = [], []
    for g in range(60):
        gc = 0.30 + 0.006 * g
        attrs.append((g, gc))
        rows.append((g, 0, float(2 ** (4 + 6 * gc))))
    clean_df = spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])
    ga = spark.createDataFrame(attrs, ["gene_id", "gc"])
    clean = (
        cqn_spline(clean_df, "gene_id", "sample_id", "cnt", ga, "gc")
        .toPandas().set_index("gene_id")["fit"]
    )

    dirty_rows = [
        (g, s, c * (5000.0 if g in (10, 30, 50) else 1.0)) for g, s, c in rows
    ]
    dirty_df = spark.createDataFrame(dirty_rows, ["gene_id", "sample_id", "cnt"])
    dirty = (
        cqn_spline(dirty_df, "gene_id", "sample_id", "cnt", ga, "gc")
        .toPandas().set_index("gene_id")["fit"]
    )
    keep = [g for g in clean.index if g not in (10, 30, 50)]
    # fit curves are compared up to their own median (the correction
    # only uses fit - median(fit))
    c = clean[keep] - np.median(clean[keep])
    d = dirty[keep] - np.median(dirty[keep])
    assert float(np.max(np.abs(c - d))) < 0.25


def test_kernel_edge_cases(spark):
    """Degenerate inputs: single-point lowess, 1-sample Ward, EM with
    nothing missing, spline CQN with constant GC."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.hclust import ward_hclust
    from transcriptomics_data_integration_spark.stats.lowess import lowess_sorted
    from transcriptomics_data_integration_spark.stats.mlkernels import impute_missing_em

    # lowess with n < 2 returns input unchanged
    assert lowess_sorted(np.array([1.0]), np.array([3.0])).tolist() == [3.0]

    # Ward with a single sample: empty linkage, one cluster label
    one = spark.createDataFrame(
        [(0, g, float(g)) for g in range(5)], ["sample_id", "gene_id", "value"]
    )
    linkage, labels = ward_hclust(one, "sample_id", "gene_id", "value", k=2)
    assert linkage.count() == 0
    assert [r["cluster"] for r in labels.collect()] in ([], [1])

    # EM with a complete grid: output equals input exactly
    full = spark.createDataFrame(
        [(g, s, float(g * 3 + s)) for g in range(4) for s in range(3)],
        ["gene_id", "sample_id", "value"],
    )
    out = {(r["gene_id"], r["sample_id"]): r["value"]
           for r in impute_missing_em(full, "gene_id", "sample_id", "value").collect()}
    assert len(out) == 12
    for g in range(4):
        for s in range(3):
            assert out[(g, s)] == g * 3 + s


def test_voom_lowess_design_residual_sd(spark):
    """With a ~0+group design, sy must be the pooled WITHIN-group
    residual quarter-root SD (limma: sqrt(fit$sigma)), not the raw
    per-gene SD — for genes with real group differences the raw SD is
    inflated (round-2 ADVICE item)."""
    rng = np.random.RandomState(3)
    n_s, n_g = 6, 30
    rows = []
    vals = {}
    for g in range(n_g):
        shift = 200.0 * (g % 3)  # strong group effect for most genes
        for s in range(n_s):
            grp = "a" if s < 3 else "b"
            v = float(50 + 10 * g + (shift if grp == "b" else 0.0) + rng.randint(0, 5))
            rows.append((g, s, v))
            vals[(g, s)] = v
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])
    targets = spark.createDataFrame(
        [(s, "a" if s < 3 else "b") for s in range(n_s)], ["sample_id", "target"]
    )
    out = {r["gene_id"]: r for r in voom_weights_lowess(
        df, "gene_id", "sample_id", "cnt", targets=targets, group_col="target"
    ).collect()}

    # local reference: residual SD about group means on the same lcpm
    pdf = log2_cpm(df, "sample_id", "cnt").toPandas()
    pdf["grp"] = np.where(pdf["sample_id"] < 3, "a", "b")
    for g, sub in pdf.groupby("gene_id"):
        ss = 0.0
        for _, gg in sub.groupby("grp"):
            ss += float(((gg["lcpm"] - gg["lcpm"].mean()) ** 2).sum())
        sigma2 = ss / (len(sub) - 2)
        if sigma2 <= 0:
            assert g not in out
            continue
        r = out[g]
        assert r["sqrt_sd"] == pytest.approx(sigma2 ** 0.25, rel=1e-9)
        assert r["mean_lcpm"] == pytest.approx(float(sub["lcpm"].mean()), rel=1e-9)
    # and the design-aware sy is NOT the raw SD for group-shifted genes
    raw = pdf.groupby("gene_id")["lcpm"].var()
    shifted = [g for g in range(n_g) if g % 3 and g in out]
    assert any(
        abs(out[g]["sqrt_sd"] - float(raw[g]) ** 0.25) > 1e-6 for g in shifted
    )


def test_cqn_irls2_twin_tracks_spline_kernel(spark):
    """The fixed 2-step IRLS twin must land near the free-run spline
    kernel on clean data (same basis family, same Huber objective):
    bias curves within 15% RMS of each other, and both must remove
    most of a planted monotone GC bias."""
    import math
    import random

    from pyspark.sql import functions as F

    from transcriptomics_data_integration_spark.stats.fixed_twins import (
        cqn_irls2_fixed,
    )
    from transcriptomics_data_integration_spark.stats.normalize import cqn_spline

    rnd = random.Random(5)
    rows, attrs = [], []
    for g in range(150):
        gc = 20 + (g % 50)
        attrs.append((g, float(gc)))
        for s in range(6):
            # counts rise with gc: a planted exponential bias
            lam = math.exp(3.0 + 0.04 * gc + rnd.gauss(0, 0.1))
            rows.append((g, s, float(max(1, int(lam)))))
    counts = spark.createDataFrame(rows, "gene_id long, sample_id long, cnt double")
    gattrs = spark.createDataFrame(attrs, "gene_id long, gc double")

    twin = cqn_irls2_fixed(counts, "gene_id", "sample_id", "cnt", gattrs, "gc")
    full = cqn_spline(counts, "gene_id", "sample_id", "cnt", gattrs, "gc")
    t = {(r["gene_id"], r["sample_id"]): r for r in twin.collect()}
    f = {(r["gene_id"], r["sample_id"]): r for r in full.collect()}
    assert set(t) == set(f)
    # planted bias magnitude on the lcpm scale across the gc range
    raw_spread = 0.04 * 49 / math.log(2)  # ~2.8 log2 units
    diffs = []
    for k in t:
        tb = t[k]["lcpm"] - t[k]["lcpm_cqn"]
        fb = f[k]["lcpm"] - f[k]["lcpm_cqn"]
        diffs.append((tb - fb) ** 2)
    rms = (sum(diffs) / len(diffs)) ** 0.5
    assert rms < 0.15 * raw_spread, rms
    # the twin removes the planted bias: residual gc correlation of
    # corrected values far below the raw one
    cells = twin.drop("gc").join(gattrs, "gene_id")
    raw_corr = cells.agg(F.corr("gc", "lcpm")).first()[0]
    cqn_corr = cells.agg(F.corr("gc", "lcpm_cqn")).first()[0]
    assert abs(raw_corr) > 0.8
    assert abs(cqn_corr) < 0.25 * abs(raw_corr)


def test_voom_loess_fixed_tracks_r_lowess(spark):
    """The binned tricube local-linear twin must track the R-exact
    lowess trend it gates (same smoother family): trend values within
    10% relative on a smooth mean-variance relation."""
    import random

    from transcriptomics_data_integration_spark.stats.fixed_twins import (
        voom_loess_fixed,
    )
    from transcriptomics_data_integration_spark.stats.normalize import (
        voom_weights_lowess,
    )

    rnd = random.Random(11)
    rows = []
    for g in range(400):
        base = 10 + g * 5
        for s in range(8):
            noise = 1 + 0.5 * rnd.random()
            rows.append((g, s, float(int(base * noise))))
    counts = spark.createDataFrame(rows, "gene_id long, sample_id long, cnt double")
    twin = {r["gene_id"]: r for r in voom_loess_fixed(
        counts, "gene_id", "sample_id", "cnt", n_bins=32).collect()}
    full = {r["gene_id"]: r for r in voom_weights_lowess(
        counts, "gene_id", "sample_id", "cnt").collect()}
    shared = set(twin) & set(full)
    assert len(shared) > 350
    rel = [
        abs(twin[g]["trend_sqrt_sd"] - full[g]["trend_sqrt_sd"])
        / full[g]["trend_sqrt_sd"]
        for g in shared
    ]
    assert sum(rel) / len(rel) < 0.05, sum(rel) / len(rel)
    assert max(rel) < 0.2, max(rel)


def test_voom_loess_robust_downweights_outlier(spark):
    """The 1-robustifying-step twin (r4 verdict item 7): on clean data
    it stays close to the 0-step twin, and an injected outlier gene
    perturbs the robust trend at its neighbors LESS than the 0-step
    trend — the bisquare reweighting is doing its job."""
    import random

    from transcriptomics_data_integration_spark.stats.fixed_twins import (
        voom_loess_fixed,
        voom_loess_robust_fixed,
    )

    rnd = random.Random(17)
    rows = []
    for g in range(300):
        base = 10 + g * 5
        for s in range(8):
            noise = 1 + 0.5 * rnd.random()
            rows.append((g, s, float(int(base * noise))))
    # outlier gene: wildly inflated variance in the middle of the axis
    for s in range(8):
        rows.append((1000, s, 800.0 if s % 2 == 0 else 80000.0))
    clean = spark.createDataFrame(
        [r for r in rows if r[0] != 1000],
        "gene_id long, sample_id long, cnt double",
    )
    dirty = spark.createDataFrame(rows, "gene_id long, sample_id long, cnt double")

    def trends(fn, df):
        return {
            r["gene_id"]: r["trend_sqrt_sd"]
            for r in fn(df, "gene_id", "sample_id", "cnt", n_bins=32).collect()
        }

    t0_clean = trends(voom_loess_fixed, clean)
    t1_clean = trends(voom_loess_robust_fixed, clean)
    shared = set(t0_clean) & set(t1_clean)
    assert len(shared) > 250
    rel = [abs(t1_clean[g] - t0_clean[g]) / t0_clean[g] for g in shared]
    assert sum(rel) / len(rel) < 0.05, sum(rel) / len(rel)

    t0_dirty = trends(voom_loess_fixed, dirty)
    t1_dirty = trends(voom_loess_robust_fixed, dirty)
    move0 = sum(
        abs(t0_dirty[g] - t0_clean[g]) for g in shared if g in t0_dirty
    )
    move1 = sum(
        abs(t1_dirty[g] - t1_clean[g]) for g in shared if g in t1_dirty
    )
    assert move1 < move0, (move1, move0)
