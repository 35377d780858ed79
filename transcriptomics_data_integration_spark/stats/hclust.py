"""M13 — Ward hierarchical clustering of samples (full fidelity).

Reference: ``hclust(dist(t(data)), method="ward")`` +
``cutree``/dendrogram (`DiffExpression_closedPlatform.R:645-646`,
`Study_effect.R:500-531`).

Execution split (SURVEY §2.5 M12/M13, same contract as MDS): the
S x S squared-Euclidean distance matrix is computed DISTRIBUTED — a
gene-keyed self-join + aggregation over the long relation (the gene
dimension can be billions of rows at 100 TB; it never leaves the
cluster).  The linkage itself is O(S^3) on an S x S matrix with
S = O(10..1000) samples, so it runs on the driver in numpy —
exactly where R runs hclust — via the Lance-Williams recurrence:

    d2(u,k) = ((n_i+n_k) d2(i,k) + (n_j+n_k) d2(j,k) - n_k d2(i,j))
              / (n_i + n_j + n_k)

Two linkage conventions are supported (``algo``):

- ``"ward.D2"`` (default, scipy convention): the recurrence runs on
  SQUARED distances and the merge height is the Euclidean (unsquared)
  cluster distance — heights monotone non-decreasing.
- ``"ward.D"``: R's ``hclust(..., method="ward")`` — the reference's
  actual call (`DiffExpression_closedPlatform.R:645-646`).  The same
  Lance-Williams recurrence runs on the UNSQUARED dissimilarity and
  the height is that dissimilarity directly.  For the 1-Pearson
  metric the two are NOT equivalent (ward.D2 on (1-corr)^2 differs
  from ward.D on 1-corr), so reference parity requires ward.D.

Ties break deterministically on (height, smaller cluster id, larger
cluster id).

Outputs are Spark DataFrames so downstream suite queries stay in the
engine: a linkage table (one row per merge: step, cluster_a,
cluster_b, height, size) and a ``cutree``-style label table for a
requested k (clusters renumbered 1..k by first appearance in sample
order, matching R ``cutree``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# driver-side linkage guard: Lance-Williams is O(S^3) with an S x S
# matrix in driver memory — ample for the sample dimension (O(10-1000))
# and for F5-bounded gene subsets, a hard error beyond
_MAX_LEAVES = 5000


def sample_distance_matrix(
    long_df: DataFrame,
    sample_col: str,
    gene_col: str,
    value_col: str,
    metric: str = "euclidean",
) -> DataFrame:
    """Distributed upper-triangle SQUARED distances between samples
    over the shared-gene slice (missing genes contribute 0, i.e.
    distances use genes present in both samples — R ``dist`` on a
    complete matrix sees all genes; feed a completed matrix for exact
    parity, e.g. after impute_missing).

    ``metric="euclidean"``: squared Euclidean (``dist``,
    `DiffExpression_closedPlatform.R:645`).
    ``metric="correlation"``: (1 - Pearson)^2 — the
    ``as.dist(1 - cor(data))`` convention of `Study_effect.R:828-829`,
    squared so the Lance-Williams recurrence (ward.D2) consumes it
    like any other squared distance; the reported heights come back on
    the 1-corr scale.  Pearson is computed from exact pairwise moments
    in the same single aggregation."""
    a = long_df.select(
        F.col(sample_col).alias("sa"), F.col(gene_col).alias("g"),
        F.col(value_col).alias("x"),
    )
    b = long_df.select(
        F.col(sample_col).alias("sb"), F.col(gene_col).alias("g"),
        F.col(value_col).alias("y"),
    )
    pairs = a.join(b, "g").where(F.col("sa") < F.col("sb"))
    if metric == "euclidean":
        return pairs.groupBy("sa", "sb").agg(
            F.sum((F.col("x") - F.col("y")) ** 2).alias("d2")
        )
    if metric != "correlation":
        raise ValueError("metric must be 'euclidean' or 'correlation'")
    mom = pairs.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    corr = cov / F.sqrt(vx * vy)
    return mom.select(
        "sa", "sb", ((F.lit(1.0) - corr) ** 2).alias("d2")
    )


def ward_linkage_local(
    samples: list, d2_pairs: dict, squared: bool = True
) -> list[tuple]:
    """Driver-side Ward linkage.  ``samples``: ordered sample ids
    (index = leaf id 0..S-1); ``d2_pairs``: {(i, j) i<j: squared
    distance} (unsquared dissimilarity when ``squared=False`` —
    ward.D).  Returns merge rows (step, cluster_a, cluster_b, height,
    size) with new clusters numbered S, S+1, ... like scipy.

    The input must be a COMPLETE, finite distance matrix: every
    unordered pair of leaves present, no NaN/inf.  A missing or
    non-finite pair would make ``inf - inf`` / NaN propagate silently
    through the Lance-Williams update (arbitrary merge order, NaN
    heights), so it raises instead."""
    n = len(samples)
    if n < 2:
        return []
    if len(d2_pairs) != n * (n - 1) // 2:
        raise ValueError(
            f"ward linkage needs a complete distance matrix: expected "
            f"{n * (n - 1) // 2} pairs for {n} leaves, got {len(d2_pairs)} "
            f"(disjoint gene support between some sample pair? complete "
            f"the matrix, e.g. impute_missing, before clustering)"
        )
    bad = [(i, j) for (i, j), v in d2_pairs.items() if not np.isfinite(v)]
    if bad:
        raise ValueError(
            f"ward linkage got {len(bad)} non-finite distances (first: "
            f"pair {bad[0]}); zero-variance leaves under "
            f"metric='correlation' produce NaN — drop them first (F4)"
        )
    INF = float("inf")
    D2 = np.full((2 * n - 1, 2 * n - 1), INF)
    for (i, j), v in d2_pairs.items():
        D2[i, j] = D2[j, i] = float(v)
    size = np.zeros(2 * n - 1, dtype=np.int64)
    size[:n] = 1
    active = set(range(n))
    merges = []
    for step in range(n - 1):
        # min pair, vectorized; ties break to the lexicographically
        # smallest (i, j) because argmin returns the FIRST minimum and
        # triu_indices enumerates pairs in row-major (i, j) order
        act = np.array(sorted(active))
        sub = D2[np.ix_(act, act)]
        iu = np.triu_indices(len(act), 1)
        flat = sub[iu]
        m = int(np.argmin(flat))
        d2min = float(flat[m])
        if not np.isfinite(d2min):
            raise ValueError(
                f"ward linkage: non-finite minimum cluster distance at "
                f"step {step} — distance matrix was not complete/finite"
            )
        i = int(act[iu[0][m]])
        j = int(act[iu[1][m]])
        u = n + step
        ni, nj = size[i], size[j]
        ks = act[(act != i) & (act != j)]
        if len(ks):
            nk = size[ks].astype(float)
            D2[u, ks] = (
                (ni + nk) * D2[i, ks] + (nj + nk) * D2[j, ks] - nk * d2min
            ) / (ni + nj + nk)
            D2[ks, u] = D2[u, ks]
        size[u] = ni + nj
        active.discard(i)
        active.discard(j)
        active.add(u)
        height = float(np.sqrt(max(d2min, 0.0))) if squared else d2min
        merges.append((step, int(i), int(j), height, int(size[u])))
    return merges


def cut_tree_labels(merges: list[tuple], n: int, k: int) -> np.ndarray:
    """R ``cutree``-style labels for k clusters: stop the merge
    sequence after n-k merges, number clusters 1..k by first
    appearance in leaf order."""
    parent = np.arange(2 * n - 1)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for step, i, j, _h, _sz in merges[: max(0, n - k)]:
        u = n + step
        parent[find(i)] = u
        parent[find(j)] = u
    roots = [find(i) for i in range(n)]
    label_of: dict[int, int] = {}
    labels = np.zeros(n, dtype=np.int64)
    for i, r in enumerate(roots):
        if r not in label_of:
            label_of[r] = len(label_of) + 1
        labels[i] = label_of[r]
    return labels


def ward_hclust(
    long_df: DataFrame,
    sample_col: str,
    gene_col: str,
    value_col: str,
    k: int = 2,
    metric: str = "euclidean",
    algo: str = "ward.D2",
) -> tuple[DataFrame, DataFrame]:
    """Full Ward pipeline: distributed distance matrix -> driver
    linkage -> (linkage_df, labels_df).

    ``algo="ward.D2"`` (scipy default) or ``"ward.D"`` (R
    ``method="ward"`` — the reference's call, see module docstring).

    linkage_df: (step, cluster_a, cluster_b, height, size) — the
    dendrogram merge table (cluster ids < S are leaves in sorted
    sample order; ids >= S are merge products, like scipy linkage).
    labels_df: (sample, cluster) for the k-cut, R cutree numbering.
    """
    if algo not in ("ward.D", "ward.D2"):
        raise ValueError("algo must be 'ward.D' or 'ward.D2'")
    # leaf guard BEFORE materializing the O(S^2) pair relation on the
    # driver: count distinct leaves with an early-out limit
    n_leaves = (
        long_df.select(F.col(sample_col)).distinct().limit(_MAX_LEAVES + 1).count()
    )
    if n_leaves > _MAX_LEAVES:
        raise ValueError(
            f"ward_hclust linkage is driver-side O(S^3); got more than "
            f"{_MAX_LEAVES} leaves — cluster a bounded subset (F5 top-k)"
        )
    d2_df = sample_distance_matrix(
        long_df, sample_col, gene_col, value_col, metric=metric
    )
    if algo == "ward.D":
        # recurrence runs on the unsquared dissimilarity: Euclidean
        # distance, or 1-Pearson directly (sqrt undoes the ward.D2
        # squaring; both metrics emit non-negative d2)
        d2_df = d2_df.select("sa", "sb", F.sqrt("d2").alias("d2"))
    rows = d2_df.collect()
    samples = sorted({r["sa"] for r in rows} | {r["sb"] for r in rows})
    idx = {s: i for i, s in enumerate(samples)}
    d2 = {
        (min(idx[r["sa"]], idx[r["sb"]]), max(idx[r["sa"]], idx[r["sb"]])): r["d2"]
        for r in rows
    }
    merges = ward_linkage_local(samples, d2, squared=(algo == "ward.D2"))
    labels = cut_tree_labels(merges, len(samples), min(k, max(len(samples), 1)))
    spark = long_df.sparkSession
    sample_t = dict(long_df.select(F.col(sample_col)).dtypes)[sample_col]
    linkage_df = spark.createDataFrame(
        merges or [], "step int, cluster_a int, cluster_b int, height double, size int"
    )
    labels_df = spark.createDataFrame(
        [(s, int(labels[idx[s]])) for s in samples],
        f"{sample_col} {sample_t}, cluster int",
    )
    return linkage_df, labels_df


def ward_hclust_genes(
    long_df: DataFrame,
    gene_col: str,
    sample_col: str,
    value_col: str,
    k: int = 2,
    metric: str = "correlation",
    algo: str = "ward.D2",
) -> tuple[DataFrame, DataFrame]:
    """Gene-mode Ward clustering — the heatmap ROW dendrogram over the
    top DE genes (`DiffExpression_closedPlatform.R:675-677`,
    ``hclust`` of the gene x gene distance; `Study_effect.R:828-829`
    uses 1 - Pearson).  Identical machinery with the roles swapped:
    genes are the leaves, samples the coordinates.  The caller must
    bound the gene set first (F5 top-k / top DE) — the driver-side
    linkage guard enforces <= 5000 leaves."""
    return ward_hclust(
        long_df, sample_col=gene_col, gene_col=sample_col,
        value_col=value_col, k=k, metric=metric, algo=algo,
    )
