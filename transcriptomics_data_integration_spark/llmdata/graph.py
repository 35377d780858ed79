"""Link-graph operators for crawl curation (r8): fixed-iteration
PageRank — the host/domain ranking signal web-corpus pipelines use
for quality weighting (Common-Crawl-style host ranks feeding
temperature sampling and filter thresholds).

Engine-exactness: the rank mass is TICK-QUANTIZED INTEGER units
(``total_units`` spread over nodes), every per-edge transfer is a
truncating integer division (``units DIV outdeg``), and damping is
integer percent arithmetic — so the per-node inflow SUM is an
order-independent bigint sum and the whole computation is bit-exact
in any engine (the combat_eb2 / temperature_sample tick precedent;
a float PageRank would be summation-order-dependent at every
aggregation).  Truncation dust simply leaves the system (mass is not
re-normalized) — deterministic, and irrelevant to the RANKING.

Scale shape: per iteration ONE edge->rank equi-join (shuffle on the
src key) and ONE inflow aggregation (shuffle on dst) — the canonical
distributed PageRank step; dangling mass and the node count ride
1-row broadcast attaches.  Fixed ``n_iter`` unrolls into a static
plan (no driver loop state), which is what makes a recursive-CTE
DuckDB oracle possible; each round's rank relation is LAZY
localCheckpoint-ed so the unrolled lineage stays one round deep
(``cur`` feeds three consumers per round — contrib, dangling, and the
update — and without the cut the plan tree triples per iteration:
measured 22 BroadcastNestedLoopJoins in the 3-round physical plan;
the connected_components discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping_pct: int = 85,
    total_units: int = 10**12,
) -> DataFrame:
    """Fixed-``n_iter`` PageRank over an edge list, integer mass.

    Per round: ``pr'(v) = base + (damping_pct * (inflow(v) +
    dangling DIV N)) DIV 100`` with ``base = ((100 - damping_pct) *
    total_units) DIV (100 * N)``, ``inflow(v) = sum over in-edges of
    pr(u) DIV outdeg(u)``, and ``dangling = sum of pr over nodes with
    no out-edges``.  All BIGINT.  Output: (node, outdeg, pr_units).
    """
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ndeg = nodes.join(outdeg, "node", "left")
    nn = nodes.agg(F.count(F.lit(1)).alias("_N"))
    base_expr = f"({100 - int(damping_pct)} * CAST({int(total_units)} AS BIGINT)) DIV (100 * _N)"
    cur = ndeg.join(F.broadcast(nn)).withColumn(
        "pr", F.expr(f"CAST({int(total_units)} AS BIGINT) DIV _N")
    )
    for _ in range(int(n_iter)):
        # lineage cut: cur is consumed three times this round, and the
        # unrolled tree otherwise triples per iteration
        cur = cur.localCheckpoint(eager=False)
        contrib = e.join(
            cur.select(F.col("node").alias("_s"), "pr", "outdeg"), "_s"
        ).select(F.col("_d").alias("node"), F.expr("pr DIV outdeg").alias("_c"))
        inflow = contrib.groupBy("node").agg(F.sum("_c").alias("_in"))
        dang = cur.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0).cast("bigint")).alias("_dang")
        )
        cur = (
            ndeg.join(inflow, "node", "left")
            .join(F.broadcast(dang))
            .join(F.broadcast(nn))
            .withColumn(
                "pr",
                F.expr(
                    f"{base_expr} + ({int(damping_pct)} * "
                    "(COALESCE(_in, CAST(0 AS BIGINT)) + _dang DIV _N)) DIV 100"
                ),
            )
            .drop("_in", "_dang")
        )
    return cur.select("node", "outdeg", F.col("pr").alias("pr_units"))
