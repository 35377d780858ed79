"""BPE merge training as relational algebra (Sennrich et al. 2016) —
the canonical tokenizer-training step of an LLM data pipeline, run
where the corpus lives instead of on a single machine.

Scale shape: the corpus collapses to the WORD-FREQUENCY table in one
aggregation (the only pass over raw text); every merge iteration then
operates on that bounded vocabulary relation — pair counting is an
index-explode + sum (map-side combined), the winning pair is a
distributed top-1 (TakeOrderedAndProject), and applying the merge is a
per-word left-greedy array fold in whole-stage codegen.  Nothing
iterates over the corpus and nothing touches the driver except the
1-row winner per merge.

Determinism: counts are integers, the winner tie-breaks on
(count DESC, left, right), and the greedy fold has a fixed
left-to-right order — every output is engine-exact, so the whole
training loop is hash-gateable against a DuckDB oracle (``bpe_merges``
in the suite) with the iteration unrolled into CTEs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.runtime import register_persisted


def _merge_fold(a_sql: str, b_sql: str, s: str = "s") -> str:
    """Left-greedy single-pair merge over the symbol array ``s``.
    An element produced by a merge can never re-match the pair's left
    side within the same pass (A || B == A would need B = ''), so the
    fold needs no just-merged flag."""
    return f"""CASE WHEN size({s}) <= 1 THEN {s} ELSE
aggregate(slice({s}, 2, size({s}) - 1), array(element_at({s}, 1)),
  (acc, x) -> CASE WHEN element_at(acc, -1) = {a_sql} AND x = {b_sql}
              THEN concat(slice(acc, 1, size(acc) - 1),
                          array(concat({a_sql}, {b_sql})))
              ELSE concat(acc, array(x)) END)
END"""


def bpe_train_fixed(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table ``(merge_rank, lhs, rhs, merged, pair_count)`` — the
    artifact a tokenizer consumes, in learned order.

    Whitespace/alnum pre-tokenization (the repo's standard word rule),
    characters as initial symbols, no end-of-word marker (documented
    deviation from the classic formulation; add one by appending a
    sentinel symbol per word before training if needed).
    """
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    words = (
        df.select(F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    syms = words.select(
        "wc",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "s"
        ),
    ).persist()  # bounded: one row per distinct word (the vocabulary)
    register_persisted(syms)
    merge_rows = []
    for r in range(1, n_merges + 1):
        pairs = (
            # size >= 2 guard matters: Spark's sequence(1, 0) DESCENDS
            # ([1, 0]) instead of being empty, so single-symbol words
            # would explode an out-of-range index under ANSI
            syms.where(F.size("s") >= 2)
            .select(
                "wc", F.explode(F.expr("sequence(1, size(s) - 1)")).alias("i"), "s"
            )
            .select(
                "wc",
                F.expr("element_at(s, i)").alias("a"),
                F.expr("element_at(s, i + 1)").alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.sum("wc").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), F.col("a"), F.col("b")).limit(1)
        merge_rows.append(
            best.select(
                F.lit(r).alias("merge_rank"),
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                F.concat("a", "b").alias("merged"),
                F.col("c").alias("pair_count"),
            )
        )
        # bounded vocab relation again — persist so iteration r+1 (and
        # the merge-table rows) never re-execute earlier folds
        syms = (
            syms.crossJoin(F.broadcast(best))
            .withColumn("s", F.expr(_merge_fold("a", "b")))
            .select("wc", "s")
            .persist()
        )
        register_persisted(syms)
    return reduce(lambda x, y: x.unionByName(y), merge_rows)


def _sq(lit: str) -> str:
    return "'" + lit.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per word, the same
    greedy fold replayed in learned order — one codegen expression per
    merge, zero shuffles, zero Python.  ``merges`` is the (lhs, rhs)
    list from :func:`bpe_train_fixed` (bounded: it is the tokenizer
    artifact, inlined as literals)."""
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    out = df.withColumn("_words", F.filter(toks, lambda w: w != ""))
    out = out.withColumn(
        "_syms",
        F.expr(
            "transform(_words, w -> "
            "transform(sequence(1, length(w)), i -> substring(w, i, 1)))"
        ),
    )
    for lhs, rhs in merges:
        fold = _merge_fold(_sq(lhs), _sq(rhs), s="ws")
        out = out.withColumn("_syms", F.expr(f"transform(_syms, ws -> {fold})"))
    return out.withColumn(out_col, F.expr("flatten(_syms)")).drop(
        "_words", "_syms"
    )
