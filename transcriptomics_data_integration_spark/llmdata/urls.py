"""URL canonicalization and domain-level corpus operators — the
provenance axis of a crawl-scale training pipeline (dedup keys,
per-domain quotas, blocklists all hang off a CANONICAL url).

All pure string/regexp codegen (no UDF, no network): the same
operator text runs as a map-side transform at any scale, and the
regexes stay inside the RE2-compatible subset (no lookaround, no
backreferences) so a SQL oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# applied in order; (pattern, spark_replacement) — patterns stay in
# the RE2 subset (no lookaround/backrefs) so DuckDB replays them
# verbatim; only the group-reference SYNTAX differs in replacements
# ($1 in Spark/Java, \1 in DuckDB/RE2 — the oracle translates)
_TRACK = r"(utm_[a-z]+|fbclid|gclid)"
_CANON_STEPS: list[tuple[str, str]] = [
    (r"#.*$", ""),                                   # strip fragment
    # tracking param followed by another param: keep the separator,
    # drop the param (applied twice: handles runs of up to 3)
    (rf"([?&]){_TRACK}=[^&#]*&", r"$1"),
    (rf"([?&]){_TRACK}=[^&#]*&", r"$1"),
    # tracking param in last position: drop separator + param
    (rf"[?&]{_TRACK}=[^&#]*$", ""),
    (r"^(https?)://([^/:?#]+):(80|443)([/?#]|$)", r"$1://$2$4"),  # default port
    (r"^(https?)://www\.", r"$1://"),                # www prefix
    (r"/([?#])", r"$1"),                             # trailing slash pre-query
    (r"/$", ""),                                     # trailing slash
]


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column: lowercase scheme+host, fragment
    and tracking parameters stripped, default ports and www. and
    trailing slashes removed.  Deterministic regexp chain, identical
    pattern text in the DuckDB oracle."""
    # lowercase scheme+host only (path/query are case-significant)
    head = F.regexp_extract(col, r"^([a-zA-Z]+://[^/?#]*)", 1)
    out = F.concat(
        F.lower(head),
        F.substring(col, F.length(head) + F.lit(1), F.length(col)),
    )
    for pat, rep in _CANON_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def url_domain(col: Column) -> Column:
    """Registered host of a (canonical) URL — the per-domain grouping
    key.  Plain authority extraction; public-suffix awareness is a
    lookup-table join the caller can add (it is data, not code)."""
    return F.regexp_extract(col, r"^[a-z]+://([^/:?#]+)", 1)


def domain_stats(
    df: DataFrame,
    url_col: str,
    text_col: str | None = None,
) -> DataFrame:
    """Per-domain corpus inventory: document count, distinct canonical
    urls (url-level dedup pressure), and total text volume — the
    relation per-domain quotas and blocklist joins run against.  One
    aggregation; the canonicalization rides map-side."""
    canon = canonical_url(F.col(url_col))
    base = df.withColumn("_cu", canon).withColumn("_dom", url_domain(F.col("_cu")))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_cu").alias("n_urls"),
    ]
    if text_col:
        aggs.append(F.sum(F.length(text_col)).alias("total_chars"))
    return base.groupBy(F.col("_dom").alias("domain")).agg(*aggs)
