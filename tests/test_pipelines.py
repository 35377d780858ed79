"""End-to-end pipeline tests on synthetic fixtures shaped like
FIXTURES.md sections 1-4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.pipelines import (
    build_expression_matrix,
    differential_expression,
    meta_analysis,
)
from transcriptomics_data_integration_spark.stats.normalize import (
    array_weights,
    cqn_simplified,
    log2_cpm,
    voom_weights,
)


def test_build_expression_matrix(spark):
    # probes p1/p2 -> gene gA (p2 higher variance, wins A4); p3 -> gB;
    # p4 unreliable (absent from map); sample s3 is an outlier; s4 not
    # in the target sheet
    inten = []
    for s, off in [("s1", 0.0), ("s2", 1.0), ("s3", 99.0), ("s4", -7.0)]:
        inten += [
            ("p1", s, 5.0 + 0.1 * off),
            ("p2", s, 5.0 + 1.0 * off),
            ("p3", s, 2.0 + 0.5 * off),
            ("p4", s, 1.0),
        ]
    intensities = spark.createDataFrame(inten, ["probe", "sample_id", "value"])
    targets = spark.createDataFrame([("s1",), ("s2",), ("s3",)], ["sample_id"])
    outliers = spark.createDataFrame([("ds1", "s3")], ["dataset", "samples2exclude"])
    probe_map = spark.createDataFrame(
        [("p1", "gA"), ("p2", "gA"), ("p3", "gB")], ["probe", "gene_id"]
    )
    out = build_expression_matrix(
        intensities, targets, outliers, probe_map, normalize=False
    ).collect()
    genes = {r["gene_id"] for r in out}
    samples = {r["sample_id"] for r in out}
    assert genes == {"gA", "gB"}
    assert samples == {"s1", "s2"}
    assert len(out) == 4  # 2 genes x 2 samples, one probe per gene


def _two_platform_fixture(spark, shift=4.0):
    rows, trows = [], []
    for plat in ("P1", "P2"):
        for d, (ds, b_off) in enumerate([("dsA", 0.0), ("dsB", 2.0)]):
            for j in range(6):
                s = f"{plat}_{ds}_s{j}"
                grp = "T" if j < 3 else "N"
                trows.append((s, grp, ds))
                for g in range(8):
                    hot = shift if (g == 0 and grp == "T") else 0.0
                    noise = 0.3 * ((j * 7 + g * 3 + d) % 5)
                    rows.append((f"g{g}", s, plat, 8.0 + g + b_off + hot + noise))
    expr = spark.createDataFrame(rows, ["gene_id", "sample_id", "platform", "value"])
    targets = spark.createDataFrame(trows, ["sample_id", "target", "dataset"])
    return expr, targets


def test_differential_expression_finds_hot_gene(spark):
    expr, targets = _two_platform_fixture(spark)
    out = differential_expression(
        expr.where(F.col("platform") == "P1").drop("platform"),
        targets,
        "T",
        "N",
        batch_correct=True,
    ).collect()
    assert out[0]["gene_id"] == "g0"
    assert out[0]["adj_p_value"] < 0.01
    assert out[0]["decide"] == 1
    others = [r for r in out if r["gene_id"] != "g0"]
    assert all(r["adj_p_value"] > 0.05 for r in others)


def test_differential_expression_confounding_guard(spark):
    expr, targets = _two_platform_fixture(spark)
    # make dataset == group (perfect confound)
    bad_targets = targets.withColumn(
        "dataset", F.when(F.col("target") == "T", "dsA").otherwise("dsB")
    )
    with pytest.raises(ValueError, match="confounded"):
        differential_expression(
            expr.where(F.col("platform") == "P1").drop("platform"),
            bad_targets,
            "T",
            "N",
        )


def test_meta_analysis_combines_platforms(spark):
    expr, targets = _two_platform_fixture(spark)
    out = meta_analysis(expr, targets, "T", "N").collect()
    assert out[0]["l_gene" if False else "gene_id"] == "g0"
    assert out[0]["n_platforms"] == 2
    assert out[0]["p_comb"] < 0.01
    # combined p should beat (or match) both single-platform p's for g0
    assert out[0]["avg_p_improvement"] is not None


def test_log2_cpm_and_voom_weights(spark):
    rows = []
    for s in range(4):
        for g in range(30):
            rows.append((f"g{g}", f"s{s}", float(10 + g * 5 + (s * 3 + g) % 7)))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])
    lc = log2_cpm(df, "sample_id", "cnt")
    assert lc.where(F.col("lcpm").isNull()).count() == 0
    vw = voom_weights(df, "gene_id", "sample_id", "cnt", n_bins=5)
    got = vw.collect()
    assert len(got) == 30
    for r in got:
        assert r["weight"] == pytest.approx(r["trend_sqrt_sd"] ** -4, rel=1e-9)


def test_cqn_removes_gc_bias(spark):
    rows, attrs = [], []
    for g in range(40):
        gc = 0.3 + 0.01 * g
        attrs.append((f"g{g}", gc))
        for s in range(4):
            # counts strongly increasing with gc -> bias
            rows.append((f"g{g}", f"s{s}", float(10 + g * 20 + s)))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "cnt"])
    ga = spark.createDataFrame(attrs, ["gene_id", "gc"])
    out = cqn_simplified(df, "gene_id", "sample_id", "cnt", ga, "gc", n_bins=4)
    by_bin = (
        out.groupBy("gc_bin")
        .agg(F.avg("lcpm").alias("raw"), F.avg("lcpm_cqn").alias("adj"))
        .collect()
    )
    raw_spread = max(r["raw"] for r in by_bin) - min(r["raw"] for r in by_bin)
    adj_spread = max(r["adj"] for r in by_bin) - min(r["adj"] for r in by_bin)
    assert adj_spread < raw_spread / 2


def test_array_weights_flags_noisy_sample(spark):
    rows = []
    for s, noise in [("good1", 0.1), ("good2", 0.1), ("bad", 5.0)]:
        for g in range(20):
            rows.append((f"g{g}", s, 10.0 + g + noise * ((g * 13 + len(s)) % 7 - 3)))
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    w = {r["sample_id"]: r["weight"] for r in array_weights(df, "gene_id", "sample_id", "value").collect()}
    assert w["bad"] < w["good1"]
    assert w["bad"] < 0.5


def test_rnaseq_de_pipeline_end_to_end(spark):
    """Entry-point B composition: counts -> CQN offsets -> floor ->
    voom weights -> weighted moderated DE.  A gene with a real group
    shift ranks above null genes; BH monotone."""
    import random

    from transcriptomics_data_integration_spark.pipelines.rnaseq import (
        rnaseq_differential_expression,
    )

    rnd = random.Random(3)
    samples = [(f"s{i}", "tumor" if i < 4 else "normal") for i in range(8)]
    rows = []
    for g in range(30):
        for s, grp in samples:
            base = 200 + 10 * g
            shift = 500 if (g == 0 and grp == "tumor") else 0
            rows.append((f"g{g}", s, base + shift + rnd.randrange(0, 30)))
    counts = spark.createDataFrame(rows, "gene_id string, sample_id string, read_count long")
    targets = spark.createDataFrame(samples, "sample_id string, target string")
    attrs = spark.createDataFrame(
        [(f"g{g}", 0.3 + 0.01 * g) for g in range(30)], "gene_id string, gc_content double"
    )
    out = rnaseq_differential_expression(
        counts, targets, attrs, "tumor", "normal"
    ).collect()
    by_gene = {r["gene_id"]: r for r in out}
    assert len(by_gene) == 30
    shifted_p = by_gene["g0"]["adj_p_value"]
    assert shifted_p == min(r["adj_p_value"] for r in out)
    assert all(r["adj_p_value"] >= r["p_value"] - 1e-15 for r in out)
    assert by_gene["g0"]["log2fc"] > 0

    # full-fidelity path (spline CQN + lowess voom) agrees on the call
    out_lo = rnaseq_differential_expression(
        counts, targets, attrs, "tumor", "normal", fidelity="lowess"
    ).collect()
    by_gene_lo = {r["gene_id"]: r for r in out_lo}
    assert len(by_gene_lo) == 30
    assert by_gene_lo["g0"]["adj_p_value"] == min(r["adj_p_value"] for r in out_lo)
    assert by_gene_lo["g0"]["log2fc"] > 0


def test_differential_expression_center_mode_finds_hot_gene(spark):
    """batch_adjust='center' (the closed-form, oracle-gateable tier)
    removes the additive batch offset and finds the same hot gene as
    the ComBat tier; centering leaves per-gene grand means intact."""
    expr, targets = _two_platform_fixture(spark)
    p1 = expr.where(F.col("platform") == "P1").drop("platform")
    out = differential_expression(
        p1, targets, "T", "N", batch_adjust="center", exact_scale=2
    ).collect()
    assert out[0]["gene_id"] == "g0"
    assert out[0]["decide"] == 1
    assert all(r["adj_p_value"] > 0.05 for r in out if r["gene_id"] != "g0")

    # invariant: location-centering preserves the per-gene grand mean
    # (up to the scale-2 quantization the oracle tier applies)
    from transcriptomics_data_integration_spark.pipelines.diffexpr import (
        differential_expression as de,
    )
    import pytest as _pt

    labeled = p1.join(targets, "sample_id")
    per_gb = labeled.groupBy("gene_id", "dataset").agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_g = labeled.groupBy("gene_id").agg(
        F.sum("value").alias("sg"), F.count(F.lit(1)).alias("ng")
    )
    adj = (
        labeled.join(per_gb, ["gene_id", "dataset"]).join(per_g, "gene_id")
        .withColumn("v2", F.col("value") - F.col("s") / F.col("n") + F.col("sg") / F.col("ng"))
    )
    chk = adj.groupBy("gene_id").agg(
        F.avg("v2").alias("m2"), (F.sum("sg") / F.sum("ng")).alias("m1")
    ).collect()
    for r in chk:
        assert r["m2"] == _pt.approx(r["m1"], rel=1e-9)


def test_normalized_matrix_de_imputes_and_restricts(spark):
    """Entry-point C: missing cells are mean-filled per gene, excluded
    genes never appear, and the hot gene still tops the table."""
    from transcriptomics_data_integration_spark.pipelines.diffexpr import (
        normalized_matrix_de,
    )

    expr, targets = _two_platform_fixture(spark)
    p1 = expr.where(F.col("platform") == "P1").drop("platform")
    # plant missing cells on one non-hot gene
    holed = p1.withColumn(
        "value",
        F.when(
            (F.col("gene_id") == "g3") & (F.col("sample_id").endswith("s1")),
            F.lit(None),
        ).otherwise(F.col("value")),
    )
    restrict = spark.createDataFrame(
        [(f"g{i}",) for i in range(7)], ["gene_id"]  # drops g7
    )
    out = normalized_matrix_de(
        holed, targets, "T", "N", restrict_genes=restrict, exact_scale=2
    ).collect()
    genes = {r["gene_id"] for r in out}
    assert "g7" not in genes and "g3" in genes
    assert out[0]["gene_id"] == "g0" and out[0]["decide"] == 1
