"""Ward hierarchical clustering (M13 full fidelity, stats/hclust.py)."""

from __future__ import annotations

import numpy as np
import pytest

from transcriptomics_data_integration_spark.stats.hclust import (
    cut_tree_labels,
    sample_distance_matrix,
    ward_hclust,
    ward_linkage_local,
)


def test_ward_linkage_hand_computed_1d():
    """Points 0, 2, 6, 7 on a line.  Hand-run of the Lance-Williams
    recurrence (ward.D2 convention):

      step 0: merge {2}, {3}  d2=1     -> height 1
      step 1: merge {0}, {1}  d2=4     -> height 2
      step 2: merge u4, u5    d2=60.5  -> height sqrt(60.5)
              (cross-check: 2*nA*nB/(nA+nB) * ||cA-cB||^2
               = 2 * (6.5-1)^2 = 60.5)
    """
    pts = [0.0, 2.0, 6.0, 7.0]
    d2 = {
        (i, j): (pts[i] - pts[j]) ** 2
        for i in range(4) for j in range(i + 1, 4)
    }
    merges = ward_linkage_local(list(range(4)), d2)
    assert [(m[1], m[2]) for m in merges] == [(2, 3), (0, 1), (4, 5)]
    heights = [m[3] for m in merges]
    assert heights[0] == pytest.approx(1.0)
    assert heights[1] == pytest.approx(2.0)
    assert heights[2] == pytest.approx(np.sqrt(60.5))
    assert [m[4] for m in merges] == [2, 2, 4]
    # heights monotone (guaranteed for Ward)
    assert heights == sorted(heights)


def test_cutree_numbering_first_appearance():
    pts = [0.0, 2.0, 6.0, 7.0]
    d2 = {
        (i, j): (pts[i] - pts[j]) ** 2
        for i in range(4) for j in range(i + 1, 4)
    }
    merges = ward_linkage_local(list(range(4)), d2)
    assert cut_tree_labels(merges, 4, 2).tolist() == [1, 1, 2, 2]
    assert cut_tree_labels(merges, 4, 4).tolist() == [1, 2, 3, 4]
    assert cut_tree_labels(merges, 4, 1).tolist() == [1, 1, 1, 1]


def test_ward_singleton_merge_height_is_euclidean_distance():
    rng = np.random.RandomState(5)
    X = rng.randn(6, 3)
    d2 = {
        (i, j): float(((X[i] - X[j]) ** 2).sum())
        for i in range(6) for j in range(i + 1, 6)
    }
    merges = ward_linkage_local(list(range(6)), d2)
    step0 = merges[0]
    i, j = step0[1], step0[2]
    assert step0[3] == pytest.approx(np.linalg.norm(X[i] - X[j]))
    # monotone heights across all merges
    hs = [m[3] for m in merges]
    assert all(a <= b + 1e-12 for a, b in zip(hs, hs[1:]))


def test_ward_hclust_spark_end_to_end(spark):
    """Two tight sample groups in gene space -> the k=2 cut separates
    them; distance matrix is computed distributed."""
    rows = []
    for s in range(6):
        base = 0.0 if s < 3 else 50.0
        for g in range(10):
            rows.append((s, g, base + g + 0.1 * s))
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    d2 = sample_distance_matrix(df, "sample_id", "gene_id", "value")
    assert d2.count() == 15  # 6 choose 2
    linkage, labels = ward_hclust(df, "sample_id", "gene_id", "value", k=2)
    merges = linkage.orderBy("step").collect()
    assert len(merges) == 5
    hs = [m["height"] for m in merges]
    assert all(a <= b + 1e-9 for a, b in zip(hs, hs[1:]))
    lab = {r["sample_id"]: r["cluster"] for r in labels.collect()}
    assert lab[0] == lab[1] == lab[2] == 1
    assert lab[3] == lab[4] == lab[5] == 2


def test_correlation_distance_matches_numpy(spark):
    rng = np.random.RandomState(9)
    X = rng.randn(4, 12)  # 4 samples x 12 genes
    rows = [
        (s, g, float(X[s, g])) for s in range(4) for g in range(12)
    ]
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    got = {
        (r["sa"], r["sb"]): r["d2"]
        for r in sample_distance_matrix(
            df, "sample_id", "gene_id", "value", metric="correlation"
        ).collect()
    }
    C = np.corrcoef(X)
    for i in range(4):
        for j in range(i + 1, 4):
            assert got[(i, j)] == pytest.approx((1 - C[i, j]) ** 2, rel=1e-9)


def test_ward_correlation_metric_groups_by_shape_not_level(spark):
    """Correlation distance clusters by expression PROFILE: two groups
    with identical shapes at wildly different levels cluster by shape,
    where euclidean would cluster by level."""
    base = np.linspace(0.0, 11.0, 12)
    rows = []
    for s in range(4):
        if s < 2:
            prof = base  # increasing profile
        else:
            prof = base[::-1]  # decreasing profile
        level = 0.0 if s % 2 == 0 else 100.0  # level cross-cuts shape
        for g in range(12):
            rows.append((s, g, float(prof[g] + level)))
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    _, lab_c = ward_hclust(df, "sample_id", "gene_id", "value", k=2, metric="correlation")
    lc = {r["sample_id"]: r["cluster"] for r in lab_c.collect()}
    assert lc[0] == lc[1] and lc[2] == lc[3] and lc[0] != lc[2]
    _, lab_e = ward_hclust(df, "sample_id", "gene_id", "value", k=2, metric="euclidean")
    le = {r["sample_id"]: r["cluster"] for r in lab_e.collect()}
    assert le[0] == le[2] and le[1] == le[3] and le[0] != le[1]


def test_ward_hclust_genes_clusters_coexpressed(spark):
    """Gene-mode clustering on 1-Pearson: two co-expression modules
    (one tracking a rising sample trend, one falling) separate at k=2."""
    rows = []
    for g in range(8):
        for s in range(6):
            trend = s if g < 4 else (5 - s)
            rows.append((g, s, float(10 * trend + g)))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    from transcriptomics_data_integration_spark.stats.hclust import ward_hclust_genes

    linkage, labels = ward_hclust_genes(df, "gene_id", "sample_id", "value", k=2)
    lab = {r["gene_id"]: r["cluster"] for r in labels.collect()}
    assert len({lab[g] for g in range(4)}) == 1
    assert len({lab[g] for g in range(4, 8)}) == 1
    assert lab[0] != lab[7]
    assert linkage.count() == 7


def test_ward_d_hand_computed_1d():
    """R ``method="ward"`` (ward.D): recurrence on UNSQUARED distances.
    Points 0, 2, 6, 7:

      step 0: merge {2},{3}  d=1  -> height 1
      step 1: merge {0},{1}  d=2  -> height 2
      step 2: d(u4,0)=(2*6+2*7-1)/3=25/3, d(u4,1)=(2*4+2*5-1)/3=17/3,
              d(u5,u4)=(3*25/3+3*17/3-2*2)/4=9.5 -> height 9.5
    """
    pts = [0.0, 2.0, 6.0, 7.0]
    d = {
        (i, j): abs(pts[i] - pts[j])
        for i in range(4) for j in range(i + 1, 4)
    }
    merges = ward_linkage_local(list(range(4)), d, squared=False)
    assert [(m[1], m[2]) for m in merges] == [(2, 3), (0, 1), (4, 5)]
    heights = [m[3] for m in merges]
    assert heights[0] == pytest.approx(1.0)
    assert heights[1] == pytest.approx(2.0)
    assert heights[2] == pytest.approx(9.5)


def test_ward_linkage_incomplete_matrix_raises():
    d2 = {(0, 1): 1.0, (0, 2): 4.0}  # (1, 2) missing
    with pytest.raises(ValueError, match="complete distance matrix"):
        ward_linkage_local([0, 1, 2], d2)


def test_ward_linkage_nonfinite_distance_raises():
    d2 = {(0, 1): 1.0, (0, 2): float("nan"), (1, 2): 2.0}
    with pytest.raises(ValueError, match="non-finite"):
        ward_linkage_local([0, 1, 2], d2)
    d2 = {(0, 1): 1.0, (0, 2): float("inf"), (1, 2): 2.0}
    with pytest.raises(ValueError, match="non-finite"):
        ward_linkage_local([0, 1, 2], d2)


def test_ward_hclust_missing_pair_raises(spark):
    """Samples 0 and 2 share no genes -> missing pair must raise, not
    silently produce NaN heights (round-2 bench regression)."""
    rows = [(0, "a", 1.0), (0, "b", 2.0), (1, "a", 1.5), (1, "c", 3.0),
            (2, "c", 2.5)]
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    with pytest.raises(ValueError, match="complete distance matrix"):
        ward_hclust(df, "sample_id", "gene_id", "value", k=2)


def test_ward_d_spark_end_to_end_matches_local(spark):
    """algo='ward.D' end-to-end equals the local recurrence on the
    unsquared Euclidean distances of the same matrix."""
    rng = np.random.RandomState(11)
    X = rng.randn(5, 7)
    rows = [(s, g, float(X[s, g])) for s in range(5) for g in range(7)]
    df = spark.createDataFrame(rows, ["sample_id", "gene_id", "value"])
    linkage, _ = ward_hclust(df, "sample_id", "gene_id", "value", k=2, algo="ward.D")
    got = [
        (m["step"], m["cluster_a"], m["cluster_b"], m["height"], m["size"])
        for m in linkage.orderBy("step").collect()
    ]
    d = {
        (i, j): float(np.linalg.norm(X[i] - X[j]))
        for i in range(5) for j in range(i + 1, 5)
    }
    want = ward_linkage_local(list(range(5)), d, squared=False)
    assert [(g[1], g[2]) for g in got] == [(w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-9)
