"""Multiple-testing p-adjustment: BH / BY / holm / none (SURVEY.md M10).

Reference: the DE scripts' documented ``adjust`` argument surface
``{"none","BH","fdr","BY","holm"}``
(`scripts/data_integration/DiffExpression_closedPlatform.R:24`, consumed
by ``topTable(adjust.method=...)`` at `:184,566,600`).  Semantics pinned
to R ``p.adjust``:

    BH   : adj_i = min_{j >= i} min(1, p_(j) * n / j)
    fdr  : alias of BH (R's own alias)
    BY   : adj_i = min_{j >= i} min(1, c(n) * p_(j) * n / j),
           c(n) = sum_{i=1..n} 1/i  (Benjamini-Yekutieli 2001 —
           FDR under arbitrary dependence)
    holm : adj_i = max_{j <= i} min(1, (n - j + 1) * p_(j))
           (step-DOWN: forward cumulative max over ascending p)
    none : identity

i.e. rank ascending by p, scale, then a cumulative extreme — reverse
cummin for the step-up methods, forward cummax for holm.  Ties receive
identical adjusted values automatically (equal p with different ranks
collapse under the cumulative extreme).  ``min(1, .)`` commutes with
both cummin and cummax, so clamping per-row before the window is
bit-identical to R's post-window ``pmin(1, ...)``.

The BY factor c(n) is summed as an ORDERED left fold over ascending i
(``aggregate(transform(sequence(1,n), ...))``) so the IEEE double is
reproducible in any engine that folds left — the DuckDB oracle replays
the same fold via ``list_reduce``; an unordered SUM over 1/i would be
permutation-dependent in the last ulp.

Spark shape: two window functions over the same (optional partition,
order-by-p) window — one shuffle if partitioned, single-stage on
post-aggregate relations otherwise.  Unpartitioned calls on relations
Catalyst can't prove small route to the bucket-partitioned histogram
form (see ``bh_adjust_histogram``) — the billion-row scale path, shared
by all three methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bh_adjust_histogram(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    tiebreak_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact BH without a global sort window — the billion-row scale
    path.  ``bh_adjust``'s unpartitioned ``orderBy(p)`` window moves the
    whole relation to ONE task; fine for post-aggregate gene lists,
    fatal for permutation-scale p-sets.  This variant range-buckets p
    into ``n_buckets`` equi-width bins so every window is partitioned by
    bucket:

    1. histogram pass: per-bucket counts -> cumulative base rank per
       bucket + total n (a <= n_buckets-row relation, broadcast back);
    2. rank pass: global rank = bucket base + row_number within bucket
       (exact, because buckets are value ranges: every p in bucket k
       sorts before every p in bucket k+1, and ties share a bucket);
    3. reverse cumulative min = min(within-bucket reverse cummin,
       suffix-min of higher buckets) — the suffix-min is again computed
       on the tiny per-bucket relation and broadcast.

    Identical output to ``bh_adjust`` (same ``p * n / rank`` expression,
    same tie semantics); the only unpartitioned windows run on
    ``n_buckets`` rows regardless of |df|.  Under a uniform-ish p
    distribution each bucket holds |df|/n_buckets rows; AQE skew-split
    covers spiky nulls at p≈0.
    """
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    rev = [F.col(p_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    with_b = df.withColumn(
        "_bkt",
        F.least(
            F.floor(F.col(p_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
        ),
    )
    hist = with_b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    cum = (
        hist.withColumn("_base", F.coalesce(F.sum("_cnt").over(w_base), F.lit(0)))
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
        .select("_bkt", "_base", "_n")
    )
    w_in = Window.partitionBy("_bkt").orderBy(*order)
    ranked = (
        with_b.join(F.broadcast(cum), "_bkt")
        .withColumn("_rank", F.col("_base") + F.row_number().over(w_in))
        .withColumn(
            "_scaled",
            F.least(F.col(p_col) * F.col("_n") / F.col("_rank"), F.lit(1.0)),
        )
    )
    bmin = ranked.groupBy("_bkt").agg(F.min("_scaled").alias("_bmin"))
    w_suf = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf = bmin.withColumn("_sufmin", F.min("_bmin").over(w_suf)).select(
        "_bkt", "_sufmin"
    )
    w_rev_in = Window.partitionBy("_bkt").orderBy(*rev).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # least() ignores nulls, so the highest bucket (null suffix) falls
    # back to its within-bucket reverse cummin alone
    return (
        ranked.join(F.broadcast(suf), "_bkt")
        .withColumn("_revmin", F.min("_scaled").over(w_rev_in))
        .withColumn(out_col, F.least(F.col("_revmin"), F.col("_sufmin")))
        .drop("_bkt", "_base", "_n", "_rank", "_scaled", "_revmin", "_sufmin")
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    parts = partition_cols or []
    if not parts:
        # adaptive scale guard: an unpartitioned sort window on a
        # relation Catalyst can't prove single-task-small funnels the
        # whole p-set through one task — route it to the bit-identical
        # bucket-partitioned histogram form instead (p in [0,1] by BH's
        # contract, so the equi-width bucketing needs no bounds pass)
        from transcriptomics_data_integration_spark.operators.windows import (
            fits_single_task,
        )

        if not fits_single_task(df):
            return bh_adjust_histogram(
                df, p_col, out_col=out_col, tiebreak_col=tiebreak_col
            )
    order = [F.col(p_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w_rank = Window.partitionBy(*parts).orderBy(*order)
    w_rev = (
        Window.partitionBy(*parts)
        .orderBy(*[c.desc() for c in [F.col(p_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*parts)
    return (
        df.withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_scaled", F.least(F.col(p_col) * F.col("_n") / F.col("_rank"), F.lit(1.0)))
        .withColumn(out_col, F.min("_scaled").over(w_rev))
        .drop("_rank", "_n", "_scaled")
    )


def _harmonic(n_col: str, chunk: int = 1_000_000):
    """c(n) = sum_{i=1..n} 1/i as an ORDERED ascending left fold —
    the Benjamini-Yekutieli dependence factor, bit-reproducible across
    engines (R's ``sum(1/(1:n))`` is the same left fold).  The fold is
    CHUNKED: an outer fold over ceil(n/chunk) chunk indices threads the
    accumulator through an inner left fold over each chunk's 1/i terms,
    so the addition ORDER is identical to the flat fold (bit-identical
    result) while the transient ``sequence`` array never exceeds
    ``chunk`` elements (~8 MB) — no O(n) array materialization and no
    ``sequence`` 2^31 element cap, so the expression is safe at any n a
    bigint can hold.  Still O(n) flops in ONE evaluation: callers must
    attach it to a ONE-row aggregate, never a per-row column."""
    n = f"cast({n_col} as bigint)"
    return F.expr(
        f"if({n} >= 1,"
        f" aggregate(sequence(cast(0 as bigint), ({n} - 1) div {chunk}),"
        " cast(0.0 as double),"
        f" (acc, k) -> aggregate("
        f"   transform(sequence(k * {chunk} + 1, least((k + 1) * {chunk}, {n})),"
        "    i -> double(1) / i),"
        "   acc, (a, x) -> a + x)),"
        " cast(0.0 as double))"
    )


def by_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """R ``p.adjust(method="BY")``: BH's step-up reverse cummin with
    the scaled term ``(c(n) * n / rank) * p`` — R's exact operand
    order (``q * n/i * p[o]``), kept so the IEEE doubles match an R
    replay bit-for-bit.  The per-partition (n, c(n)) pair is computed
    on a one-row-per-group aggregate and broadcast back, so the O(n)
    harmonic fold runs once per group, not once per row."""
    parts = partition_cols or []
    if not parts:
        from transcriptomics_data_integration_spark.operators.windows import (
            fits_single_task,
        )

        if not fits_single_task(df):
            return by_adjust_histogram(
                df, p_col, out_col=out_col, tiebreak_col=tiebreak_col
            )
    counts = (
        df.groupBy(*parts)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_cn", _harmonic("_n"))
    )
    joined = (
        df.join(F.broadcast(counts), parts)
        if parts
        else df.crossJoin(F.broadcast(counts))
    )
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    rev = [F.col(p_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w_rank = Window.partitionBy(*parts).orderBy(*order)
    w_rev = (
        Window.partitionBy(*parts)
        .orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("_rank", F.row_number().over(w_rank))
        .withColumn(
            "_scaled",
            F.least(
                F.col("_cn") * F.col("_n") / F.col("_rank") * F.col(p_col),
                F.lit(1.0),
            ),
        )
        .withColumn(out_col, F.min("_scaled").over(w_rev))
        .drop("_rank", "_n", "_cn", "_scaled")
    )


def by_adjust_histogram(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    tiebreak_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """BY via the same bucket-partitioned two-pass shape as
    ``bh_adjust_histogram`` (the billion-row scale path): the only
    deltas are the c(n) factor — computed ONCE on a one-row total
    aggregated from the histogram and broadcast into the cumulative
    relation (the chunked ``_harmonic`` fold evaluates exactly once,
    not once per bucket row) — and the R operand order in the scaled
    term.  Bit-identical to ``by_adjust``."""
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    rev = [F.col(p_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    with_b = df.withColumn(
        "_bkt",
        F.least(
            F.floor(F.col(p_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
        ),
    )
    hist = with_b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    totals = hist.agg(F.sum("_cnt").alias("_n")).withColumn(
        "_cn", _harmonic("_n")
    )
    cum = (
        hist.withColumn("_base", F.coalesce(F.sum("_cnt").over(w_base), F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .select("_bkt", "_base", "_n", "_cn")
    )
    w_in = Window.partitionBy("_bkt").orderBy(*order)
    ranked = (
        with_b.join(F.broadcast(cum), "_bkt")
        .withColumn("_rank", F.col("_base") + F.row_number().over(w_in))
        .withColumn(
            "_scaled",
            F.least(
                F.col("_cn") * F.col("_n") / F.col("_rank") * F.col(p_col),
                F.lit(1.0),
            ),
        )
    )
    bmin = ranked.groupBy("_bkt").agg(F.min("_scaled").alias("_bmin"))
    w_suf = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf = bmin.withColumn("_sufmin", F.min("_bmin").over(w_suf)).select(
        "_bkt", "_sufmin"
    )
    w_rev_in = Window.partitionBy("_bkt").orderBy(*rev).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranked.join(F.broadcast(suf), "_bkt")
        .withColumn("_revmin", F.min("_scaled").over(w_rev_in))
        .withColumn(out_col, F.least(F.col("_revmin"), F.col("_sufmin")))
        .drop("_bkt", "_base", "_n", "_cn", "_rank", "_scaled", "_revmin", "_sufmin")
    )


def holm_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """R ``p.adjust(method="holm")``: step-DOWN FWER control —
    ``adj_i = max_{j <= i} min(1, (n - j + 1) * p_(j))``, i.e. a
    FORWARD cumulative max over ascending p (the mirror of BH's
    reverse cummin).  Tied p values collapse to one adjusted value
    under the cummax exactly as in R.  Same window shape and the same
    adaptive histogram fallback as ``bh_adjust``."""
    parts = partition_cols or []
    if not parts:
        from transcriptomics_data_integration_spark.operators.windows import (
            fits_single_task,
        )

        if not fits_single_task(df):
            return holm_adjust_histogram(
                df, p_col, out_col=out_col, tiebreak_col=tiebreak_col
            )
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w_rank = Window.partitionBy(*parts).orderBy(*order)
    w_fwd = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*parts)
    return (
        df.withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_scaled",
            F.least(
                (F.col("_n") - F.col("_rank") + F.lit(1)) * F.col(p_col),
                F.lit(1.0),
            ),
        )
        .withColumn(out_col, F.max("_scaled").over(w_fwd))
        .drop("_rank", "_n", "_scaled")
    )


def holm_adjust_histogram(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    tiebreak_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Holm via the bucket-partitioned shape: global rank = bucket
    base + within-bucket row_number (exact, buckets are value ranges),
    forward cummax = max(within-bucket forward cummax, prefix-max of
    LOWER buckets) — the mirror image of ``bh_adjust_histogram``'s
    suffix-min.  ``greatest`` ignores the null prefix of bucket 0 the
    same way ``least`` ignores the null suffix of the top bucket.
    Bit-identical to ``holm_adjust``."""
    order = [F.col(p_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    with_b = df.withColumn(
        "_bkt",
        F.least(
            F.floor(F.col(p_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
        ),
    )
    hist = with_b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    cum = (
        hist.withColumn("_base", F.coalesce(F.sum("_cnt").over(w_base), F.lit(0)))
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
        .select("_bkt", "_base", "_n")
    )
    w_in = Window.partitionBy("_bkt").orderBy(*order)
    ranked = (
        with_b.join(F.broadcast(cum), "_bkt")
        .withColumn("_rank", F.col("_base") + F.row_number().over(w_in))
        .withColumn(
            "_scaled",
            F.least(
                (F.col("_n") - F.col("_rank") + F.lit(1)) * F.col(p_col),
                F.lit(1.0),
            ),
        )
    )
    bmax = ranked.groupBy("_bkt").agg(F.max("_scaled").alias("_bmax"))
    w_pre = Window.orderBy(F.col("_bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    pre = bmax.withColumn("_premax", F.max("_bmax").over(w_pre)).select(
        "_bkt", "_premax"
    )
    w_fwd_in = Window.partitionBy("_bkt").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranked.join(F.broadcast(pre), "_bkt")
        .withColumn("_fwdmax", F.max("_scaled").over(w_fwd_in))
        .withColumn(out_col, F.greatest(F.col("_fwdmax"), F.col("_premax")))
        .drop("_bkt", "_base", "_n", "_rank", "_scaled", "_fwdmax", "_premax")
    )


def p_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "adj_p_value",
    method: str = "BH",
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The reference DE scripts' full ``adjust`` argument surface
    (`DiffExpression_closedPlatform.R:24`): dispatch to the matching
    R ``p.adjust`` method.  ``fdr`` is R's own alias of BH; ``none``
    passes p through unchanged (R returns p itself)."""
    if method in ("BH", "fdr"):
        return bh_adjust(
            df, p_col, out_col,
            partition_cols=partition_cols, tiebreak_col=tiebreak_col,
        )
    if method == "BY":
        return by_adjust(
            df, p_col, out_col,
            partition_cols=partition_cols, tiebreak_col=tiebreak_col,
        )
    if method == "holm":
        return holm_adjust(
            df, p_col, out_col,
            partition_cols=partition_cols, tiebreak_col=tiebreak_col,
        )
    if method == "none":
        return df.withColumn(out_col, F.col(p_col))
    raise ValueError(
        f"unknown p-adjust method {method!r}; expected one of "
        "'none', 'BH', 'fdr', 'BY', 'holm'"
    )
