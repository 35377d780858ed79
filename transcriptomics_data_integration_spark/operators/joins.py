"""Join operators (SURVEY.md section 2.3, J1-J9).

The only join shape Spark lacks natively is the genomic interval join
(J6); everything else maps to built-in equi-joins whose physical
strategy (broadcast-hash vs sort-merge) Catalyst + AQE pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_merge(
    left: DataFrame, right: DataFrame, key: str, broadcast_right: bool = True
) -> DataFrame:
    """J2 — generic keyed left-outer merge with NULL padding.

    Reference: ``MergeFiles.pl`` builds a hash on the smaller file and
    probes it, padding non-matches with NA
    (`scripts/other/MergeFiles.pl:73-119`, NA pad `:113`).  Spark's
    broadcast-hash join is the same plan shape; NULL padding is the
    left-outer contract.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, key, "left")


def interval_join(
    probes: DataFrame,
    genes: DataFrame,
    chrom: str = "chrom",
    start: str = "start",
    end: str = "end",
    gene_id: str = "gene_id",
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """J6 — interval overlap join: each probe locus ``[start, end]``
    against gene spans on the same chromosome; emits, per probe, the
    *first* overlapping gene (smallest gene start, then gene id) and the
    count of overlapping genes.

    Reference: `scripts/microarray_data_processing/ArrayAnnot.pl:116-155`
    (range fetch `:136-137`, first-gene pick `:140-148`, overlap count
    `:142-154`).

    Scale strategy (SURVEY.md section 4.4): a raw non-equi join executes
    as a broadcast-nested-loop — O(P*G) comparisons.  We bucket genomic
    positions into ``bucket_size`` bins and explode each gene span into
    the buckets it covers, turning the join into an equi-join on
    ``(chrom, bucket)`` followed by the exact overlap predicate.  This is
    a hash join whose cost is O(P + G * span/bucket) and it shuffles on a
    well-distributed composite key, so it survives 100x scale-up; gene
    spans are bounded (|span|/bucket_size explode factor is small).
    """
    p = probes.select(
        F.col(chrom).alias("_p_chrom"),
        F.col(start).alias("_p_start"),
        F.col(end).alias("_p_end"),
        "*",
    ).withColumn("_p_bucket", (F.col("_p_start") / bucket_size).cast("long"))
    # A probe interval is short (<= probe length), so it lives in at most
    # two buckets; genes can span many.  Explode the gene side.
    g = (
        genes.select(
            F.col(chrom).alias("_g_chrom"),
            F.col(start).alias("_g_start"),
            F.col(end).alias("_g_end"),
            F.col(gene_id).alias("_g_gene"),
        )
        .withColumn(
            "_g_bucket",
            F.explode(
                F.sequence(
                    (F.col("_g_start") / bucket_size).cast("long"),
                    (F.col("_g_end") / bucket_size).cast("long"),
                )
            ),
        )
    )
    # probes may straddle a bucket boundary: also probe at end's bucket.
    p2 = p.withColumn(
        "_p_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    (F.col("_p_start") / bucket_size).cast("long"),
                    (F.col("_p_end") / bucket_size).cast("long"),
                )
            )
        ),
    )
    joined = p2.join(
        g,
        (F.col("_p_chrom") == F.col("_g_chrom"))
        & (F.col("_p_bucket") == F.col("_g_bucket"))
        & (F.col("_p_start") <= F.col("_g_end"))
        & (F.col("_p_end") >= F.col("_g_start")),
        "inner",
    )
    # A (probe, gene) pair can match in two buckets; dedupe before
    # counting.  Keys that identify a probe: all original probe columns —
    # caller guarantees a unique probe key in `probes`; we require one
    # named column "_probe_key" or fall back to (chrom,start,end).
    return joined


def overlap_summary(joined: DataFrame, probe_key: str) -> DataFrame:
    """Collapse the raw interval-join matches to the reference's output
    contract: one row per probe with ``gene_id`` = first overlapping
    gene (by gene start, then id) and ``gene_no`` = number of distinct
    overlapping genes (`ArrayAnnot.pl:140-154`)."""
    dedup = joined.select(
        probe_key, "_g_gene", "_g_start"
    ).dropDuplicates([probe_key, "_g_gene"])
    return dedup.groupBy(probe_key).agg(
        F.min(F.struct("_g_start", "_g_gene"))["_g_gene"].alias("gene_id"),
        F.countDistinct("_g_gene").alias("gene_no"),
    )
