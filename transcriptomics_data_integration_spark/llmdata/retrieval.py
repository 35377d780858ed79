"""Text-retrieval scoring for corpus curation (r8): BM25 — the
standard lexical relevance function (Robertson/Sparck Jones; the
Lucene/Elasticsearch default) — used in training-data pipelines for
query-targeted subcorpus extraction ("find the docs about X"), seed
expansion, and retrieval-based decontamination audits.

Spark-first shape: document length is computed MAP-SIDE from the
token split (no explode), the token explode is filtered to the query
vocabulary BEFORE any shuffle (the posting relation never carries
non-query terms), per-term tf becomes conditional aggregates over the
FIXED query term list, and corpus statistics (N, per-term df, avgdl)
ride one 1-row broadcast attach.  The per-doc score is an explicit
literal-coefficient expression over the pivoted tf columns — no
order-sensitive float accumulation (the rna_degradation discipline),
so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a fixed query term list.

    idf uses the Lucene form ``ln(1 + (N - df + 0.5) / (df + 0.5))``
    (always positive — the classic form goes negative past df > N/2
    and breaks monotonicity).  Only documents matching at least one
    query term are returned (score > 0), with ``dl`` (token count)
    kept for audit.

    Scale: one filtered-explode aggregation (posting rows only for
    query terms), one 1-row stats attach, map-side score expression.
    The whole plan is a single doc-keyed shuffle at any corpus size.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    toks = F.split(F.trim(F.col(text_col)), " ")
    base = df.select(F.col(id_col), F.size(toks).alias("dl"), toks.alias("_t"))
    posting = base.select(
        id_col, "dl", F.explode("_t").alias("term")
    ).where(F.col("term").isin(terms))
    per_doc = posting.groupBy(id_col, "dl").agg(
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    # corpus stats: N + avgdl over ALL docs (map-side dl, no explode);
    # df per query term from the filtered posting relation.  Two tiny
    # aggregates fused into one 1-row broadcast attach.
    stats = base.select(
        F.count(F.lit(1)).alias("N"),
        F.avg("dl").alias("avgdl"),
    )
    dfs = posting.select(
        *[
            F.countDistinct(
                F.when(F.col("term") == t, F.col(id_col))
            ).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ]
    )
    scored = per_doc.join(F.broadcast(stats)).join(F.broadcast(dfs))
    score = None
    for i, _t in enumerate(terms):
        idf = F.log(
            F.lit(1.0)
            + (F.col("N") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}")
        sat = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        part = idf * sat
        score = part if score is None else score + part
    return scored.select(
        id_col,
        "dl",
        *[F.col(f"tf_{i}").alias(f"tf_{i}") for i in range(len(terms))],
        score.alias("score"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-k keywords by tf-idf (r8) — the corpus
    analytics/labeling primitive (topic hints, cluster naming, search
    facets) next to :func:`bm25_scores`'s query-side scoring.

    tf = term count in the doc; idf = ln(N / df) (the classic form —
    corpus-ubiquitous terms score 0 and never surface); score =
    tf * idf; ties broken by term text for determinism.  ``min_df``
    drops hapax noise (OCR junk, ids) before ranking.

    Scale shape: one explode -> (doc, term) count aggregation, a
    term-keyed df aggregation joined back (term dim — AQE broadcasts
    it when small), one 1-row N attach, and the top-k window
    partitioned BY DOCUMENT — per-partition work is the doc's own
    vocabulary, never the corpus.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), " ")
    posting = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = posting.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfs = (
        posting.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
    )
    n_docs = df.agg(F.countDistinct(id_col).alias("N"))
    scored = (
        tf.join(dfs, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("N") / F.col("df")))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval: scores + deterministic rank (score desc,
    id asc tiebreak).  The selection is ``orderBy(...).limit(k)`` — a
    TakeOrderedAndProject (per-partition heap + driver merge, no full
    sort at any scale); the rank window then runs over the k-row
    RESULT, never the corpus (the global-row_number single-task trap)."""
    from pyspark.sql import Window

    scored = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "dl", "score", "rank")
    )
