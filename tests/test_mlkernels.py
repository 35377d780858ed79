"""Tests for the MLlib-backed kernels (M11-M14, M16, M17 family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.stats.mlkernels import (
    impute_missing,
    kmeans_clusters,
    logistic_per_gene,
    pca_embedding,
    sample_vectors,
)


def _long_df(spark):
    """Two well-separated sample groups in gene space."""
    rows = []
    for s in range(8):
        grp_shift = 0.0 if s < 4 else 50.0
        for g in range(5):
            rows.append((f"g{g}", f"s{s}", grp_shift + g + 0.1 * ((s * 3 + g) % 4)))
    return spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])


def test_sample_vectors_shape(spark):
    df = _long_df(spark)
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", [f"g{i}" for i in range(5)])
    assert vecs.count() == 8
    assert vecs.select("features").first()["features"].size == 5


def test_pca_separates_groups(spark):
    df = _long_df(spark)
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", [f"g{i}" for i in range(5)])
    emb, ev = pca_embedding(vecs, "sample_id", k=2)
    assert len(ev) == 2
    assert ev[0] > 0.5  # the group shift dominates
    pc1 = {r["sample_id"]: r["pcs"][0] for r in emb.collect()}
    lo = [pc1[f"s{i}"] for i in range(4)]
    hi = [pc1[f"s{i}"] for i in range(4, 8)]
    assert max(lo) < min(hi) or min(lo) > max(hi)


def test_kmeans_two_clusters(spark):
    df = _long_df(spark)
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", [f"g{i}" for i in range(5)])
    out = {r["sample_id"]: r["cluster"] for r in kmeans_clusters(vecs, "sample_id", 2).collect()}
    assert len({out[f"s{i}"] for i in range(4)}) == 1
    assert len({out[f"s{i}"] for i in range(4, 8)}) == 1
    assert out["s0"] != out["s7"]


def test_logistic_per_gene_sign(spark):
    rows = []
    for s in range(20):
        y = "T" if s < 10 else "N"
        rows.append(("up", y, (5.0 if y == "T" else 1.0) + 0.01 * (s % 5)))
        rows.append(("flat", y, 3.0 + 0.01 * (s % 5)))
    df = spark.createDataFrame(rows, ["gene_id", "grp", "value"])
    out = {r["gene_id"]: r for r in logistic_per_gene(df, "gene_id", "grp", "value", "T").collect()}
    assert out["up"]["coef"] > 0
    assert abs(out["up"]["coef"]) > abs(out["flat"]["coef"])


def test_impute_missing_mean(spark):
    df = spark.createDataFrame(
        [("g1", "s1", 1.0), ("g1", "s2", None), ("g1", "s3", 3.0), ("g2", "s1", 7.0)],
        ["gene_id", "sample_id", "value"],
    )
    out = {
        (r["gene_id"], r["sample_id"]): r["value"]
        for r in impute_missing(df, "value").collect()
    }
    assert out[("g1", "s2")] == pytest.approx(2.0)
    assert out[("g2", "s1")] == 7.0


def test_bisecting_clusters_separates_groups(spark):
    from transcriptomics_data_integration_spark.stats.mlkernels import (
        bisecting_clusters,
        sample_vectors,
    )

    rows = []
    for s in range(8):
        base = 0.0 if s < 4 else 50.0
        for g in range(5):
            rows.append((f"g{g}", f"s{s}", base + g))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", [f"g{g}" for g in range(5)])
    out = {r["sample_id"]: r["cluster"] for r in bisecting_clusters(vecs, "sample_id", k=2).collect()}
    lo = {out[f"s{s}"] for s in range(4)}
    hi = {out[f"s{s}"] for s in range(4, 8)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_mds_embedding_preserves_distances(spark):
    """Classical MDS on a long relation: pairwise embedding distances
    reproduce the original euclidean distances (exact for points in a
    2-D subspace), up to sign/rotation which distances are invariant
    to."""
    import itertools
    import math

    from transcriptomics_data_integration_spark.stats.mlkernels import mds_embedding

    # 4 samples over 3 "genes": values place them at known 2-D geometry
    pts = {"s1": [0.0, 0.0, 5.0], "s2": [3.0, 0.0, 5.0],
           "s3": [0.0, 4.0, 5.0], "s4": [3.0, 4.0, 5.0]}
    rows = [(s, f"g{i}", v) for s, vs in pts.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "sample_id string, gene_id string, value double")
    emb = {r["sample_id"]: r["mds"] for r in mds_embedding(df, "sample_id", "gene_id", "value").collect()}
    for x, y in itertools.combinations(pts, 2):
        orig = math.dist(pts[x], pts[y])
        got = math.dist(emb[x], emb[y])
        assert abs(got - orig) < 1e-9, (x, y, orig, got)


def test_logistic_fixed_matches_local_reference_and_adaptive_sign(spark):
    """logistic_per_gene_fixed: exact replay of the 2-step centered
    IRLS in plain numpy; slope sign/direction agrees with the
    fully-converged adaptive fit."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import (
        logistic_per_gene,
        logistic_per_gene_fixed,
    )

    rng = np.random.RandomState(4)
    rows = []
    for g in ("up", "down"):
        for i in range(60):
            x = float(rng.uniform(0, 10))
            p = 1 / (1 + np.exp(-(x - 5) if g == "up" else (x - 5)))
            y = "R" if rng.uniform() < p else "A"
            rows.append((g, y, x))
    df = spark.createDataFrame(rows, "gene string, flag string, x double")

    fixed = {r["gene_id"]: r for r in logistic_per_gene_fixed(
        df, "gene", "flag", "x", "R").collect()}
    assert fixed["up"]["coef"] > 0 > fixed["down"]["coef"]

    # local replay for one gene
    pts = [(x, 1.0 if y == "R" else 0.0) for g, y, x in rows if g == "up"]
    x = np.array([p[0] for p in pts]); y = np.array([p[1] for p in pts])
    xc = x - x.mean()
    b0 = b1 = 0.0
    for it in range(2):
        if it == 0:
            w = np.full_like(xc, 0.25); z = 4.0 * (y - 0.5)
        else:
            eta = b0 + b1 * xc
            mu = 1 / (1 + np.exp(-np.clip(eta, -30, 30)))
            w = np.maximum(mu * (1 - mu), 1e-9)
            z = eta + (y - mu) / w
        s0, s1, s2 = w.sum(), (w * xc).sum(), (w * xc * xc).sum()
        t0, t1 = (w * z).sum(), (w * xc * z).sum()
        det = s0 * s2 - s1 * s1
        b0, b1 = (s2 * t0 - s1 * t1) / det, (s0 * t1 - s1 * t0) / det
    assert fixed["up"]["coef"] == pytest.approx(b1, rel=1e-9)
    assert fixed["up"]["intercept_at_mean"] == pytest.approx(b0, rel=1e-9)

    adaptive = {r["gene_id"]: r for r in logistic_per_gene(
        df, "gene", "flag", "x", "R").collect()}
    assert np.sign(adaptive["up"]["coef"]) == np.sign(fixed["up"]["coef"])


def test_pca_space_outliers_matches_numpy_and_flags_planted(spark):
    """M17 PCA-space Mahalanobis (ArrayOutliers pc2use=1:3 analogue):
    d2 must equal the numpy PCA reference on the same standardized
    matrix, and a planted extreme sample must be the top distance."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import (
        pca_space_outliers,
        sample_vectors,
    )

    rng = np.random.RandomState(7)
    n_s, n_g = 25, 12
    X = rng.randn(n_s, n_g)
    # structure so the top PCs carry signal
    X[:, 0] += np.linspace(0, 5, n_s)
    X[:, 1] -= np.linspace(0, 3, n_s)
    X[24] += 12.0  # planted outlier
    rows = [
        (f"s{s:02d}", f"g{g:02d}", float(X[s, g]))
        for s in range(n_s) for g in range(n_g)
    ]
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    genes = [f"g{g:02d}" for g in range(n_g)]
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", genes)
    out = {r["sample_id"]: r for r in pca_space_outliers(vecs, "sample_id").collect()}

    # numpy reference: standardize (ddof=1 like ml StandardScaler),
    # PCA via SVD, Mahalanobis over top-3 score columns
    Z = (X - X.mean(axis=0)) / X.std(axis=0, ddof=1)
    _u, _s, vt = np.linalg.svd(Z, full_matrices=False)
    scores = Z @ vt[:3].T
    sc = scores - scores.mean(axis=0)
    d2 = (sc ** 2 / scores.var(axis=0, ddof=1)).sum(axis=1)
    for s in range(n_s):
        assert out[f"s{s:02d}"]["d2"] == pytest.approx(float(d2[s]), rel=1e-6)
    top = max(out.values(), key=lambda r: r["d2"])
    assert top["sample_id"] == "s24"
    # chi2_3 tail sanity: the planted outlier's p is the smallest and
    # the flag threshold behaves (sf(16.266) ~ 0.001 for df=3)
    assert top["chi2_p"] == min(r["chi2_p"] for r in out.values())
    assert all(
        (r["chi2_p"] < 0.001) == bool(r["is_outlier"]) for r in out.values()
    )


def test_pca_space_outliers_long_matches_mllib_path(spark):
    """The covariance-route rewrite (feature_covariance + driver eigh)
    must reproduce the MLlib scaler+PCA path's d2 to machine precision
    on the same completed grid — including a constant gene, which
    StandardScaler maps to zero contribution."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import (
        pca_space_outliers,
        pca_space_outliers_long,
        sample_vectors,
    )

    rng = np.random.RandomState(11)
    n_s, n_g = 18, 9
    X = rng.randn(n_s, n_g)
    X[:, 0] += np.linspace(0, 4, n_s)
    X[:, 3] = 7.5  # constant gene: sd = 0
    X[17] += 9.0  # planted outlier
    rows = [
        (f"s{s:02d}", f"g{g:02d}", float(X[s, g]))
        for s in range(n_s) for g in range(n_g)
    ]
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    genes = [f"g{g:02d}" for g in range(n_g)]
    vecs = sample_vectors(df, "gene_id", "sample_id", "value", genes)
    ml = {r["sample_id"]: r for r in pca_space_outliers(vecs, "sample_id").collect()}
    cov = {
        r["sample_id"]: r
        for r in pca_space_outliers_long(
            df, "sample_id", "gene_id", "value"
        ).collect()
    }
    assert set(ml) == set(cov)
    for s, r in cov.items():
        assert r["d2"] == pytest.approx(ml[s]["d2"], rel=1e-9)
        assert r["chi2_p"] == pytest.approx(ml[s]["chi2_p"], rel=1e-9)
        assert r["is_outlier"] == ml[s]["is_outlier"]


def test_feature_covariance_matches_numpy(spark):
    """pca_covariance's kernel: gene-gene Pearson (standardize) and
    sample covariance (raw) against numpy on a dense grid."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import (
        feature_covariance,
    )

    rng = np.random.default_rng(3)
    G, S = 6, 15
    X = np.round(rng.normal(100.0, 10.0, (G, S)), 2)  # genes x samples
    rows = [
        (f"g{g}", f"s{s:02d}", float(X[g, s])) for g in range(G) for s in range(S)
    ]
    df = spark.createDataFrame(rows, "gene_id string, sample_id string, value double")

    corr = {
        (r["ga"], r["gb"]): r["stat"]
        for r in feature_covariance(
            df, "gene_id", "sample_id", "value", standardize=True
        ).collect()
    }
    cov = {
        (r["ga"], r["gb"]): r["stat"]
        for r in feature_covariance(
            df, "gene_id", "sample_id", "value", standardize=False
        ).collect()
    }
    C = np.corrcoef(X)
    V = np.cov(X, ddof=1)
    for a in range(G):
        for b in range(a, G):
            key = (f"g{a}", f"g{b}")
            assert corr[key] == pytest.approx(float(C[a, b]), rel=1e-9)
            assert cov[key] == pytest.approx(float(V[a, b]), rel=1e-9)


def test_mds_bmatrix_matches_numpy_double_centering(spark):
    """mds_bmatrix == -1/2 J D^2 J computed densely in numpy, and its
    eigendecomposition reproduces mds_embedding's coordinate geometry."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import mds_bmatrix

    rng = np.random.default_rng(11)
    G, S = 8, 10
    X = np.round(rng.normal(0.0, 5.0, (S, G)), 2)  # samples x genes
    rows = [
        (f"s{s:02d}", f"g{g}", float(X[s, g])) for s in range(S) for g in range(G)
    ]
    df = spark.createDataFrame(rows, "sample_id string, gene_id string, value double")

    out = {
        (r["sa"], r["sb"]): (r["d2"], r["b_centered"])
        for r in mds_bmatrix(df, "sample_id", "gene_id", "value").collect()
    }
    D2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    J = np.eye(S) - np.ones((S, S)) / S
    B = -0.5 * J @ D2 @ J
    assert len(out) == S * S  # ordered pairs incl. diagonal
    for i in range(S):
        for j in range(S):
            d2, b = out[(f"s{i:02d}", f"s{j:02d}")]
            assert d2 == pytest.approx(float(D2[i, j]), rel=1e-9, abs=1e-9)
            assert b == pytest.approx(float(B[i, j]), rel=1e-9, abs=1e-6)


def test_kmeans_lloyd_fixed_matches_local_lloyd(spark):
    """kmeans_lloyd_fixed == a dense numpy Lloyd run with the same
    init (k smallest sample ids) and tie rule (smallest cluster id)."""
    import numpy as np

    from transcriptomics_data_integration_spark.stats.mlkernels import (
        kmeans_lloyd_fixed,
    )

    rng = np.random.default_rng(5)
    S, G, K, IT = 12, 7, 3, 2
    X = rng.integers(0, 200, (S, G)).astype(float)
    rows = [
        (f"s{s:02d}", f"g{g}", float(X[s, g])) for s in range(S) for g in range(G)
    ]
    df = spark.createDataFrame(rows, "sample_id string, gene_id string, value double")
    got = {
        r["sample_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_lloyd_fixed(
            df, "sample_id", "gene_id", "value", k=K, n_iter=IT
        ).collect()
    }

    # local reference in exact integer arithmetic (rational centroids)
    sums = {j: X[j].copy() for j in range(K)}  # init: k smallest ids
    cnts = {j: 1 for j in range(K)}
    for _ in range(IT):
        assign = {}
        for s in range(S):
            best = None
            for j in sorted(sums):
                n = cnts[j]
                num = ((n * X[s] - sums[j]) ** 2).sum()
                d = float(num) / float(n * n)
                if best is None or d < best[1]:
                    best = (j, d)
            assign[s] = best
        sums, cnts = {}, {}
        for s, (j, _) in assign.items():
            sums.setdefault(j, np.zeros(G))
            sums[j] += X[s]
            cnts[j] = cnts.get(j, 0) + 1
    for s in range(S):
        j, d = assign[s]
        assert got[f"s{s:02d}"][0] == j
        assert got[f"s{s:02d}"][1] == pytest.approx(d, rel=1e-12)
