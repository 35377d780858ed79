"""URL canonicalization and domain-level corpus operators — the
provenance axis of a crawl-scale training pipeline (dedup keys,
per-domain quotas, blocklists all hang off a CANONICAL url).

All pure string/regexp codegen (no UDF, no network): the same
operator text runs as a map-side transform at any scale, and the
regexes stay inside the RE2-compatible subset (no lookaround, no
backreferences) so a SQL oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_domain_col: str = "domain",
    url_path_col: str = "path",
    rules_cols: tuple[str, str, str] = ("domain", "rule", "path_prefix"),
) -> DataFrame:
    """robots.txt compliance filter (r7) — retroactive crawl-policy
    enforcement, the step responsible-crawl pipelines run before
    training-data inclusion.  Google's documented matching semantics
    (also RFC 9309): among all Allow/Disallow rules for the URL's
    domain whose path-prefix matches, the LONGEST prefix wins; on an
    exact length tie Allow wins; a URL with no matching rule is
    allowed.

    Input: ``urls`` (…, domain, path), ``robots`` — the PARSED rule
    table (domain, rule in {'allow','disallow'}, path_prefix), one row
    per directive (see :func:`parse_robots_rules`).  Relational shape:
    broadcast-or-shuffle join on domain, prefix test with
    ``startswith``, one (url-keyed) window for the longest-match pick
    — rules dims are tiny next to URL corpora, so the join broadcasts
    and nothing corpus-sized shuffles twice.  Deterministic, fully
    SQL-replayable (the gate's oracle reimplements the same semantics
    in DuckDB).

    Output: every input row + ``matched_prefix`` (NULL when no rule
    matched), ``matched_rule``, and ``allowed`` boolean.
    """
    d, r, p = rules_cols
    rul = robots.select(
        F.col(d).alias("_rdom"),
        F.col(r).alias("_rule"),
        F.col(p).alias("_prefix"),
    )
    joined = urls.join(
        F.broadcast(rul),
        (F.col(url_domain_col) == F.col("_rdom"))
        & F.col(url_path_col).startswith(F.col("_prefix")),
        "left",
    )
    w = Window.partitionBy(url_domain_col, url_path_col).orderBy(
        F.length(F.col("_prefix")).desc(),
        # tie -> allow first ('allow' < 'disallow' lexically)
        F.col("_rule").asc(),
    )
    ranked = joined.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.where(F.col("_rn") == 1)
        .select(
            *[c for c in urls.columns],
            F.col("_prefix").alias("matched_prefix"),
            F.col("_rule").alias("matched_rule"),
            F.coalesce(F.col("_rule") != "disallow", F.lit(True)).alias("allowed"),
        )
    )


def parse_robots_rules(
    robots_txt: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into the (domain, rule, path_prefix)
    relation :func:`robots_filter` consumes — pure SQL string ops
    (split to lines, regexp-capture 'Allow:'/'Disallow:' directives,
    trim), wildcard-agent groups only (the group actually applied to
    generic research crawlers).  Lines outside a ``User-agent: *``
    group, comments, and empty Disallow directives (which mean
    allow-all, not a rule) are dropped."""
    lines = F.split(F.col(text_col), "\n")
    exploded = robots_txt.select(
        F.col(domain_col),
        F.posexplode(lines).alias("_ln", "_line"),
    ).withColumn("_line", F.regexp_replace(F.trim(F.col("_line")), "#.*$", ""))
    # group tracking: a line belongs to the most recent User-agent
    # block; we keep blocks whose agent set includes '*'
    marked = exploded.withColumn(
        "_is_agent",
        F.when(
            F.lower(F.col("_line")).startswith("user-agent:"), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_grp",
        F.sum("_is_agent").over(
            Window.partitionBy(domain_col)
            .orderBy("_ln")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    star_groups = (
        marked.where(
            (F.col("_is_agent") == 1)
            & (F.trim(F.regexp_extract(F.col("_line"), r"(?i)user-agent:\s*(.*)", 1)) == "*")
        )
        .select(F.col(domain_col).alias("_sdom"), F.col("_grp").alias("_star_grp"))
        .distinct()
    )
    rules = (
        marked.join(
            star_groups,
            (F.col(domain_col) == F.col("_sdom"))
            & (F.col("_grp") == F.col("_star_grp")),
        )
        .select(
            F.col(domain_col),
            F.lower(F.regexp_extract(F.col("_line"), r"(?i)^(allow|disallow):", 1)).alias("rule"),
            F.trim(F.regexp_extract(F.col("_line"), r"(?i)^(?:allow|disallow):\s*(\S*)", 1)).alias(
                "path_prefix"
            ),
        )
        .where((F.col("rule") != "") & (F.col("path_prefix") != ""))
    )
    return rules
