

def test_gsea_enrichment_scores_match_python_replay(spark):
    """gsea_enrichment_scores (r8): ES, sign, and argmax rank match a
    literal running-sum replay; a top-concentrated set scores positive,
    a bottom-concentrated set negative."""
    from transcriptomics_data_integration_spark.stats.enrichment import (
        gsea_enrichment_scores,
    )

    N = 12
    ranked = spark.createDataFrame(
        [(g, g) for g in range(1, N + 1)], "gene long, rank long"
    )
    terms = spark.createDataFrame(
        [(1, "top"), (2, "top"), (3, "top"),
         (10, "bot"), (11, "bot"), (12, "bot"),
         (2, "mix"), (7, "mix"), (11, "mix")],
        "gene long, term string",
    )
    got = {
        r["term"]: r
        for r in gsea_enrichment_scores(ranked, terms, "gene", "term").collect()
    }

    def replay(members):
        ht = len(members)
        dev, best, best_rank = 0.0, 0.0, None
        for r in range(1, N + 1):
            dev_prev = dev
            if r in members:
                dev += 1.0 / ht
            else:
                dev -= 1.0 / (N - ht)
            for d, at in ((dev, r), (dev_prev, r - 1)):
                if abs(d) > abs(best) or (abs(d) == abs(best) and d > best):
                    best, best_rank = d, at
        return best

    for term, members in (
        ("top", {1, 2, 3}), ("bot", {10, 11, 12}), ("mix", {2, 7, 11})
    ):
        assert abs(got[term]["es"] - replay(members)) < 1e-9, term
    assert got["top"]["es_sign"] == 1 and got["top"]["rank_at_max"] == 3
    assert got["bot"]["es_sign"] == -1
    assert got["bot"]["es"] == -got["top"]["es"]
