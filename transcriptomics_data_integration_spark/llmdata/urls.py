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
    """robots.txt compliance filter (r7, RFC 9309 matching r8) —
    retroactive crawl-policy enforcement, the step responsible-crawl
    pipelines run before training-data inclusion.  Google's documented
    matching semantics (also RFC 9309): among all Allow/Disallow rules
    for the URL's domain whose path pattern matches, the LONGEST
    pattern (by octet count of the rule text) wins; on an exact length
    tie Allow wins; a URL with no matching rule is allowed.  Patterns
    support the two RFC 9309 specials: ``*`` matches any character
    sequence and a trailing ``$`` anchors the match at end-of-path;
    every other character (including a non-trailing ``$``) is literal.

    Input: ``urls`` (…, domain, path), ``robots`` — the PARSED rule
    table (domain, rule in {'allow','disallow'}, path_prefix), one row
    per directive (see :func:`parse_robots_rules`).  Relational shape:
    the wildcard→regex translation runs ONCE on the tiny rule dim (a
    regexp-escape chain, so plain-prefix rules stay on the fast
    ``startswith`` path and only rules that actually use ``*``/``$``
    pay per-row regex matching); then one broadcast left join on
    domain with the match as residual condition, and one window keyed
    by a per-row unique id for the longest-match pick.  The window key
    is a row id — NOT (domain, path) — because duplicate URLs are
    normal in crawl corpora and every input row must survive.
    Deterministic, fully SQL-replayable (the gate's oracle
    reimplements the same semantics in DuckDB).

    Output: every input row + ``matched_prefix`` (the raw rule text,
    NULL when no rule matched), ``matched_rule``, and ``allowed``.
    """
    d, r, p = rules_cols
    # wildcard -> anchored regex, computed once on the rule dim:
    # escape regex specials (except '*'), then turn a trailing
    # escaped '\$' back into an end anchor, then '*' -> '.*'
    esc = F.regexp_replace(F.col("_prefix"), r"([.^$+?(){}\[\]\\|])", r"\\$1")
    esc = F.regexp_replace(esc, r"\\\$$", r"\$")
    esc = F.regexp_replace(esc, r"\*", ".*")
    rul = robots.select(
        F.col(d).alias("_rdom"),
        F.col(r).alias("_rule"),
        F.col(p).alias("_prefix"),
    ).withColumn(
        "_rwild",
        F.col("_prefix").contains("*") | F.col("_prefix").endswith("$"),
    ).withColumn("_rre", F.concat(F.lit("^"), esc))
    keyed = urls.withColumn("_uid", F.monotonically_increasing_id())
    joined = keyed.join(
        F.broadcast(rul),
        (F.col(url_domain_col) == F.col("_rdom"))
        & F.when(
            F.col("_rwild"),
            F.expr(f"`{url_path_col}` rlike _rre"),
        ).otherwise(F.col(url_path_col).startswith(F.col("_prefix"))),
        "left",
    )
    w = Window.partitionBy("_uid").orderBy(
        F.length(F.col("_prefix")).desc(),
        # tie -> allow first ('allow' < 'disallow' lexically)
        F.col("_rule").asc(),
        # equal-length same-verdict rules: pick deterministically
        F.col("_prefix").asc(),
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
    generic research crawlers).  Per RFC 9309 §2.2.1, CONSECUTIVE
    ``User-agent:`` lines stack into ONE group sharing the directives
    that follow (so ``User-agent: *`` immediately followed by
    ``User-agent: otherbot`` then rules applies the rules to both
    agents).  Lines outside a group containing ``User-agent: *``,
    comments, and empty Disallow directives (which mean allow-all,
    not a rule) are dropped."""
    lines = F.split(F.col(text_col), "\n")
    exploded = robots_txt.select(
        F.col(domain_col),
        F.posexplode(lines).alias("_ln", "_line"),
    ).withColumn("_line", F.regexp_replace(F.trim(F.col("_line")), "#.*$", ""))
    # group tracking per RFC 9309: a run of adjacent User-agent lines
    # (ignoring blank/comment lines between them) opens ONE group; a
    # User-agent line whose previous meaningful line was a directive
    # starts the NEXT group.  Computed over meaningful lines only so
    # blank separators never split an agent run.
    w_ord = Window.partitionBy(domain_col).orderBy("_ln")
    marked = (
        exploded.withColumn(
            "_is_agent",
            F.when(
                F.lower(F.col("_line")).startswith("user-agent:"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            # ANY non-agent directive line (allow, disallow, crawl-delay,
            # sitemap, ...) ends a User-agent run for grouping purposes
            # (RFC 9309 ABNF: only blank/comment lines may sit between
            # stacked startgrouplines); rule EXTRACTION below still
            # keeps allow/disallow only
            "_is_dir",
            F.when(
                (F.col("_is_agent") == 0)
                & F.col("_line").rlike(r"(?i)^[a-z][a-z0-9-]*:"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .where((F.col("_is_agent") == 1) | (F.col("_is_dir") == 1))
        .withColumn("_prev_agent", F.lag("_is_agent", 1, 0).over(w_ord))
        .withColumn(
            "_grp",
            F.sum(
                ((F.col("_is_agent") == 1) & (F.col("_prev_agent") == 0)).cast("int")
            ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
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


def url_blocklist_score(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    threshold: float = 1.0,
) -> DataFrame:
    """Weighted URL blocklist scoring (the RefinedWeb-style curation
    stage, Penedo et al. 2023 §G.1, public): instead of a binary ban
    list, every rule carries a weight and a URL is banned when its
    accumulated score reaches ``threshold`` — soft evidence ("shop",
    "download") needs corroboration, hard evidence (a known bad
    domain) bans alone.

    ``rules``: (kind, pattern, weight) with kind in
    ``'domain'`` (exact registrable-domain match) or ``'substring'``
    (case-insensitive literal match anywhere in the URL).  A URL's
    score is the SUM of every matched rule's weight (a substring rule
    counts once per URL, not per occurrence — the standard form).

    Plan shape: the rules relation is a curation artifact (hundreds to
    thousands of rows) — broadcast by contract.  Domain rules join on
    the extracted domain (equi-join); substring rules are a broadcast
    crossJoin + `contains` filter — |urls| x |substring rules| predicate
    evaluations map-side, never a shuffle.  Weights are tick-quantized
    to e-6 LONGS for the aggregation (engine-exact sums); the reported
    score divides once at the end.

    Output: (url, n_matched, score, blocked).
    """
    base = urls.select(
        F.col(url_col),
        # domain extracted from the LOWERCASED url: hosts are
        # case-insensitive (RFC 3986 §3.2.2) and url_domain's regex
        # requires a lowercase scheme, so 'HTTPS://Shop.Example.com/..'
        # must normalize the same way the substring arm does (r8 ADVICE)
        url_domain(F.lower(F.col(url_col))).alias("_dom"),
        F.lower(F.col(url_col)).alias("_lc"),
    )
    ticked = rules.select(
        "kind",
        F.lower(F.col("pattern")).alias("_pat"),
        F.round(F.col("weight") * 1000000).cast("long").alias("_w"),
    )
    dom_hits = base.join(
        F.broadcast(
            ticked.where(F.col("kind") == "domain").select(
                F.col("_pat").alias("_dom"), "_w"
            )
        ),
        "_dom",
    ).select(url_col, "_w")
    sub_hits = (
        base.crossJoin(
            F.broadcast(ticked.where(F.col("kind") == "substring").select("_pat", "_w"))
        )
        .where(F.col("_lc").contains(F.col("_pat")))
        .select(url_col, "_w")
    )
    scored = (
        dom_hits.unionByName(sub_hits)
        .groupBy(url_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum("_w").alias("_score_t"),
        )
    )
    thr_t = int(round(threshold * 1000000))
    return (
        urls.select(url_col)
        .join(scored, url_col, "left")
        .select(
            url_col,
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("bigint").alias("n_matched"),
            (F.coalesce(F.col("_score_t"), F.lit(0)) / 1000000.0).alias("score"),
            (F.coalesce(F.col("_score_t"), F.lit(0)) >= thr_t).alias("blocked"),
        )
    )


def domain_quality_prior(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    keep_col: str,
    min_docs: int = 5,
    keep_frac_threshold: float = 0.5,
) -> DataFrame:
    """Domain-level quality prior — the two-level filter real crawl
    pipelines run on top of per-document rules (CCNet/RefinedWeb
    practice, public): a domain whose documents OVERWHELMINGLY fail
    the doc-level battery is spam-farm-shaped, and its remaining
    "passing" docs are guilty by association; a domain with too few
    docs carries no evidence and is left alone.

    Per domain: n docs, k doc-level keeps, keep fraction k/n.  Domain
    verdict: OK iff n < ``min_docs`` (no evidence) or the keep
    fraction clears ``keep_frac_threshold``.  The comparison is exact
    integer arithmetic (k * 10^6 >= tick(threshold) * n) — no float
    boundary; the reported fraction divides once for audit.

    Output per input doc: (id, domain, doc_keep, domain_n,
    domain_keep_frac, domain_ok, keep_final = doc_keep AND domain_ok).

    Plan shape: ONE domain-keyed aggregation (map-side combinable
    count/sum) and one equi-join back — the domain dim is corpus-
    sublinear; Catalyst/AQE picks broadcast vs shuffle from its real
    size.  At 100 TB this is a cheap pass after any per-doc filter.
    """
    base = df.select(
        F.col(id_col),
        F.col(domain_col).alias("_dom"),
        F.col(keep_col).cast("boolean").alias("doc_keep"),
    )
    thr_t = int(round(keep_frac_threshold * 1000000))
    stats = base.groupBy("_dom").agg(
        F.count(F.lit(1)).alias("domain_n"),
        F.sum(F.when(F.col("doc_keep"), 1).otherwise(0)).alias("_k"),
    ).select(
        "_dom",
        "domain_n",
        (F.col("_k") / F.col("domain_n")).alias("domain_keep_frac"),
        (
            (F.col("domain_n") < min_docs)
            | (F.col("_k") * 1000000 >= thr_t * F.col("domain_n"))
        ).alias("domain_ok"),
    )
    return base.join(stats, "_dom").select(
        id_col,
        F.col("_dom").alias(domain_col),
        "doc_keep",
        F.col("domain_n").cast("bigint").alias("domain_n"),
        "domain_keep_frac",
        "domain_ok",
        (F.col("doc_keep") & F.col("domain_ok")).alias("keep_final"),
    )
