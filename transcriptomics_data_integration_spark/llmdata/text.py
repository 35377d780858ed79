"""Text-analysis operators for document tables.

All pure Spark SQL expressions — no Python in the row path.  Each has
an exact DuckDB-SQL twin in the suite so the correctness gate covers
them.  At 100 TB these are embarrassingly parallel map operators: no
shuffle at all, full whole-stage codegen, and column pruning means only
``text`` (+ id) is read from parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny embedded stopword lists for the n-gram/stopword language
# heuristic.  Real deployments would broadcast a dictionary; the
# mechanism (per-language token-hit scoring) is the operator.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "nicht"),
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count + char count per document (whitespace tokenizer).

    The BPE-ish regex variant is ``regexp_extract_all(text,
    '[a-z]+|[0-9]+|[^a-z0-9 ]')`` — exposed as ``n_subtokens``.
    """
    toks = _tokens(text_col)
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_chars_obs", F.length(F.col(text_col))
    ).withColumn(
        "n_subtokens",
        F.size(F.expr(f"regexp_extract_all({text_col}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")),
    )


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: token count, mean token length, stopword
    ratio, punctuation ratio — the length/punct/stopword scoring family
    used for pretraining-corpus filtering."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"]))
    )
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[\.,;:!\?]", ""))
    # try_divide, not "/": ANSI mode makes integer division by zero a
    # runtime ERROR, so empty/whitespace docs would crash the job;
    # NULL ratios are the honest value for them (identical results for
    # every non-degenerate doc)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", F.try_divide(n_chars - (n_tok - 1), n_tok))
        .withColumn("stopword_ratio", F.try_divide(stop_hits, n_tok))
        .withColumn("punct_ratio", F.try_divide(n_punct, n_chars))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score = marker-token hits per
    language; argmax with deterministic order, 'und' (undetermined) if
    no marker hits."""
    toks = _tokens(text_col)
    def _hit_counter(markers: tuple[str, ...]):
        # single-arg lambda: pyspark HOFs pass one Column per declared
        # parameter, so a defaulted second arg would receive a Column
        return lambda t: t.isin(*markers)

    scores = [
        F.size(F.filter(toks, _hit_counter(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    best = F.lit("und")
    best_score = F.lit(0)
    # fixed iteration order -> deterministic argmax (strict > keeps the
    # earlier language on ties)
    for lang in LANG_MARKERS:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.withColumn("lang_pred", best).withColumn("lang_score", best_score)


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic rolling polynomial hash over characters:
    ``h = (h * 31 + ascii(char)) mod 1e9+7`` — an ordered fold
    (``aggregate`` higher-order function), reproducible in any engine.
    """
    expr = (
        f"aggregate(transform(sequence(1, length({text_col})), "
        f"i -> ascii(substr({text_col}, i, 1))), "
        f"CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {FINGERPRINT_BASE} + c) % {FINGERPRINT_MOD})"
    )
    return df.withColumn("fingerprint", F.expr(expr))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): hash every k-gram, then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive k-gram hashes
    (rightmost minimum on ties).  Guarantees every shared substring of
    length >= k + window - 1 yields a shared fingerprint —
    position-robust overlap detection that a single whole-document
    hash cannot give.

    Multiplicity semantics: ``n_windows`` counts the WINDOWS whose
    minimum is that fingerprint, not the paper's deduplicated
    selections — Fig. 5 robust winnowing records a selection only when
    it differs from the previous window's, so runs of repeated text
    yield smaller multiplicities there.  The distinct fingerprint SET
    per document is identical under both rules; only the counts
    differ, and overlap queries join on the set.

    Relational shape: per-position k-gram hashes and the window minima
    are pure array algebra (ordered folds over slices) — a map-side
    transform, no explode/shuffle; only the final distinct-fingerprint
    explode shuffles, carrying fingerprints instead of text.  Hashes
    are the repo-standard 60-bit md5 prefixes, so any engine replays
    them bit-for-bit.

    Output: one row per (id, fingerprint, n_windows) — the relation
    fingerprint-match joins (plagiarism, contamination, near-dup
    evidence) run against.

    Plan-shape note: the k-gram hash array MUST be let-bound inside the
    window expression via ``transform(array(<kg>), hs -> ...)[0]`` — a
    plain ``withColumn("_h", kg)`` feeding a second projection gets
    CollapseProject-inlined into every ``slice(_h, p, ...)``, so each of
    the ~L window positions re-evaluates all ~L md5 hashes: a measured
    O(L^2) blowup (12s vs 1.5s for 1000 docs at sf-bench shape).  With
    the lambda binding, ``hs`` is evaluated once per row and inner
    references are variable lookups.
    """
    from transcriptomics_data_integration_spark.llmdata.dedup import MD5_60BIT_SQL

    kgram_hash = MD5_60BIT_SQL.format(arg=f"substring({text_col}, i, {k})")
    kg = f"transform(sequence(1, length({text_col}) - {k - 1}), i -> {kgram_hash})"
    # window minima with RIGHTMOST tie: fold positions left->right,
    # taking <= (not <) on the running min.  Explicit short-text guard:
    # sequence(1, 0) DESCENDS in Spark, and NULL text must not fall
    # through to the ELSE branch (length(NULL) < k is NULL, not true —
    # it would propagate to an explodable [NULL] and emit a phantom
    # NULL-fingerprint row), so gate both; the ELSE branch then always
    # sees size(hs) >= 1.
    win = (
        f"CASE WHEN {text_col} IS NULL OR length({text_col}) < {k} THEN array() "
        f"ELSE transform(array({kg}), hs -> "
        f"transform(sequence(1, greatest(size(hs) - {window - 1}, 1)), "
        f"p -> aggregate(slice(hs, p, least({window}, size(hs))), "
        f"CAST(NULL AS BIGINT), "
        f"(acc, x) -> CASE WHEN acc IS NULL OR x <= acc THEN x ELSE acc END)))[0] "
        f"END"
    )
    return (
        df.select(F.col(id_col), F.explode(F.expr(win)).alias("fingerprint"))
        .groupBy(id_col, "fingerprint")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


def duplicate_chunk_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 3,
) -> DataFrame:
    """Duplicate-chunk fraction — the Gopher/RefinedWeb-style repetition
    quality signal: split each doc into non-overlapping ``chunk_words``
    -word chunks, count each chunk's occurrences across the corpus, and
    report per doc how many of its chunks also occur elsewhere.

    Shape: one explode (narrow), one window count over the chunk digest
    (hash-partitioned by digest — high cardinality, no hot key), one
    per-doc aggregation.  The ratio is an integer/integer division, so
    the output is engine-exact.
    """
    words = f"split(trim({text_col}), ' ')"
    chunks = (
        f"transform(sequence(0, CAST(ceil(size({words}) / {chunk_words}.0e0) AS INT) - 1), "
        f"i -> array_join(slice({words}, i * {chunk_words} + 1, {chunk_words}), ' '))"
    )
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(chunks)).alias("chunk")
    ).withColumn("digest", F.md5(F.col("chunk").cast("binary")))
    counted = exploded.withColumn(
        "n_occ", F.count(F.lit(1)).over(Window.partitionBy("digest"))
    )
    return counted.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        (
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("dup_chunk_ratio"),
    )


def vocab_topk(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus-level vocabulary: top-k most frequent lowercase word
    tokens per group (e.g. per language), with deterministic tie-break
    (count desc, token asc).

    Plan shape: explode -> partial+final count agg on (group, token) ->
    per-group rank window.  The window input is the AGGREGATE (one row
    per distinct token), not the corpus — the only full-data pass is the
    map-side partial count.  Token skew ("the") is absorbed by the
    partial aggregation, never a shuffled hot key.
    """
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    counts = (
        df.select(F.col(group_col), F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "token", "n", "rank")
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Within-document line deduplication — the CCNet-style boilerplate
    trim: repeated lines (nav bars, cookie banners, headers re-pasted
    by the scraper) keep only their FIRST occurrence, original order
    otherwise preserved.

    Pure array algebra, no explode/shuffle: for each line position,
    an ordered fold over the earlier positions decides whether the
    line appeared before — O(L^2) per document in the line count,
    which is the right trade (documents have tens-to-hundreds of
    lines; the operator stays a map-side transform with NO per-doc
    aggregation state, so it composes into scans and streams).
    Deterministic and engine-replayable.

    Output: the input plus (n_lines, n_unique_lines, ``out_col``).
    """
    lines = F.split(F.col(text_col), "\n")
    base = df.withColumn("_ls", lines)
    # position form (not the (x, i) lambda) so the DuckDB oracle can
    # replay the identical expression shape with generate_series
    keep = (
        "filter(transform(sequence(1, size(_ls)), i -> "
        "CASE WHEN size(filter(slice(_ls, 1, i - 1), "
        "p -> p = element_at(_ls, i))) = 0 "
        "THEN element_at(_ls, i) END), v -> v IS NOT NULL)"
    )
    return (
        base.withColumn("_kept", F.expr(keep))
        .withColumn("n_lines", F.size("_ls"))
        .withColumn("n_unique_lines", F.size("_kept"))
        .withColumn(out_col, F.array_join("_kept", "\n"))
        .drop("_ls", "_kept")
    )


def doc_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model quality score — the CCNet/Gopher-style
    "LM filter" at corpus scale: a Laplace-smoothed unigram model is
    fit on the corpus itself (one token-count aggregation) and every
    document is scored by its mean token log-probability.  Documents
    far below the corpus mode (gibberish, boilerplate soup, wrong
    tokenization) surface as low scores; the standard cheap proxy for
    a perplexity filter when no external LM is available.

    p(t) = (c_t + 1) / (N + V)  (add-one over the corpus vocabulary),
    score = sum(ln p(t_i)) / n_tokens.

    Plan shape: explode -> (token) count agg (map-side combined; "the"
    never becomes a hot shuffle key) -> broadcast model join back to
    the token relation -> per-doc sum/count.  Two passes over the
    token stream, zero driver state; the model relation is
    vocabulary-sized.  ln() is transcendental, so gated outputs round
    (repo FP policy).
    """
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    tokens = df.select(F.col(id_col), F.explode(toks).alias("token")).where(
        F.col("token") != ""
    )
    freq = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = freq.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    model = freq.join(F.broadcast(totals)).select(
        "token",
        F.log((F.col("c") + 1.0) / (F.col("N") + F.col("V"))).alias("lp"),
    )
    return (
        tokens.join(model, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp") / F.count(F.lit(1))).alias("mean_logprob"),
        )
    )


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Eval-set contamination report: for each training document, how
    many of its distinct character k-shingles also appear in the eval
    corpus, and how many eval documents it collides with.

    The decontamination step of a corpus pipeline: training documents
    overlapping a benchmark are flagged (high n_shared) for removal.
    Plan shape: the eval shingle inventory is tiny next to the corpus —
    build it once, let the train-side explode join against it broadcast
    (no fact shuffle), aggregate per training doc.  Only training docs
    with at least one collision are emitted.
    """
    from transcriptomics_data_integration_spark.llmdata.dedup import shingles

    tr = shingles(train, id_col, text_col, k)
    ev = (
        shingles(eval_docs, id_col, text_col, k)
        .select(F.col(id_col).alias("eval_id"), "shingle")
        .distinct()
    )
    hits = tr.join(F.broadcast(ev), "shingle")
    return hits.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("n_shared"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )


# Characteristic character trigrams per language (space = word
# boundary).  Small profiles are enough to separate en/fr/de prose;
# extend per language as needed.
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", " th", "ing", "and", "ion", " of"),
    "fr": ("les", " le", "de ", "ent", "que", " de", "ais"),
    "de": ("der", "die", "und", "sch", "ein", "ich", "cht"),
}


def language_id_ngram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-n-gram language ID: score = number of DISTINCT profile
    trigrams present per language in the lowered text; argmax with
    deterministic tie-break, 'und'(etermined) when no profile trigram
    appears.

    The n-gram-profile mechanism (Cavnar-Trenkle style, reduced to
    fixed literal profiles) — complements the stopword-marker
    ``language_id``.  Plan: explode trigrams -> broadcast join to the
    tiny profile dim -> per-(doc, lang) count -> argmax window on the
    aggregate.
    """
    from transcriptomics_data_integration_spark.llmdata.dedup import shingles

    profile_rows = [
        (lang, tg) for lang, tgs in TRIGRAM_PROFILES.items() for tg in tgs
    ]
    spark = df.sparkSession
    profiles = spark.createDataFrame(profile_rows, "lang_cand string, shingle string")
    lowered = df.select("doc_id", F.lower(F.col(text_col)).alias("_lt"))
    tri = shingles(lowered, "doc_id", "_lt", k=3)
    scores = (
        tri.join(F.broadcast(profiles), "shingle")
        .groupBy("doc_id", "lang_cand")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang_cand").asc()
    )
    best = (
        scores.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.col("lang_cand").alias("lang_pred"), "score")
    )
    return df.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
        F.coalesce("score", F.lit(0)).alias("score"),
    )


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style composite quality verdict: combine the heuristic
    signals into a keep/drop decision with per-rule flags —
    word-count bounds, mean-word-length bounds, symbol ratio, and
    stopword presence (Rae et al. 2021-style rules, reduced to the
    text_quality signal set).  One pass; every rule is a plain column
    predicate over the metrics, so the whole filter stays in codegen.
    """
    scored = text_quality(df, text_col)
    rules = {
        "fail_word_count": ~F.col("n_tokens").between(3, 100000),
        "fail_word_len": ~F.col("mean_token_len").between(2.0, 12.0),
        "fail_symbol_ratio": F.col("punct_ratio") > 0.3,
        "fail_no_stopwords": F.col("stopword_ratio") <= 0.0,
    }
    out = scored
    for name, pred in rules.items():
        out = out.withColumn(name, pred)
    keep = ~rules["fail_word_count"]
    for name in list(rules)[1:]:
        keep = keep & ~F.col(name)
    return out.withColumn("keep", keep)


def normalize_text(df: DataFrame, text_col: str = "text", out_col: str = "norm_text") -> DataFrame:
    """Canonical text cleanup before hashing/dedup: lowercase, collapse
    all whitespace runs to single spaces, trim, strip control
    characters.  Pure regexp chain (codegen, no shuffle); dedup on the
    normalized column catches near-identical crawls that raw md5
    misses."""
    cleaned = F.regexp_replace(F.col(text_col), r"[\x00-\x1f]", " ")
    collapsed = F.regexp_replace(cleaned, r"\s+", " ")
    return df.withColumn(out_col, F.trim(F.lower(collapsed)))


# PII patterns: shared by the Spark scrubber and the DuckDB oracle, so
# they stay in the RE2-compatible subset (no lookaround/backrefs —
# identical match semantics under Java regex and RE2, both
# leftmost-first with greedy quantifiers)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{7,13}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the standard pre-training scrub pass (emails,
    SSN-style ids, IPv4 addresses, international phone numbers ->
    typed placeholder tokens).

    Entirely built-in ``regexp_count`` / ``regexp_replace`` (JVM
    whole-stage codegen — no Python in the hot path).  Per-category hit
    counts are evaluated on the ORIGINAL text (independent per
    pattern); redaction applies the patterns sequentially in
    ``PII_PATTERNS`` order (email before phone, so an email's digit
    run cannot be half-eaten by the phone pattern).

    Scale: pure map-side narrow transform — zero shuffles, composes
    with any downstream dedup/quality stage.
    """
    out = df
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("text_scrubbed", scrubbed)


def repetition_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher repetition-filter
    family, Rae et al. 2021 — complementary to the CROSS-document
    ``duplicate_chunk_stats``): per document,

    - ``top_2gram_frac``: characters covered by the most frequent word
      2-gram / total 2-gram characters (``cnt * len`` weighting),
    - ``dup_5gram_frac``: characters in word 5-grams occurring more
      than once / total 5-gram characters.

    Machine-heavy repetition (boilerplate, keyword stuffing, template
    spam) scores high on both.  Pure integer counts -> each fraction is
    a single IEEE division, so the DuckDB oracle matches exactly.

    Plan: word split + n-gram transform are map-side codegen; one
    shuffle per n on (doc, gram) followed by a per-doc aggregate.
    """

    def grams(n: int) -> Column:
        words = F.split(F.trim(F.col(text_col)), r"\s+")
        idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
        joined = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(words) >= n, joined).otherwise(
            F.array().cast("array<string>")
        )

    def stats(n: int, top_frac: bool):
        exploded = df.select(
            F.col(id_col), F.explode(grams(n)).alias("gram")
        )
        per_gram = exploded.groupBy(id_col, "gram").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.length(F.first("gram")).alias("glen"),
        )
        covered = F.col("cnt") * F.col("glen")
        agg = per_gram.groupBy(id_col).agg(
            F.sum(covered).alias(f"total_{n}"),
            F.max(
                F.struct(covered.alias("c"), F.col("gram"))
            )["c"].alias(f"top_{n}"),
            F.sum(F.when(F.col("cnt") > 1, covered).otherwise(0)).alias(f"dup_{n}"),
        )
        return agg

    g2 = stats(2, True)
    g5 = stats(5, False)
    return (
        df.select(id_col)
        .join(g2, id_col, "left")
        .join(g5, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("total_2"), F.lit(0)).alias("n2_chars"),
            F.coalesce(F.col("top_2") / F.col("total_2"), F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce(F.col("total_5"), F.lit(0)).alias("n5_chars"),
            F.coalesce(F.col("dup_5") / F.col("total_5"), F.lit(0.0)).alias("dup_5gram_frac"),
        )
    )


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The FULL Gopher quality-rule battery (Rae et al. 2021, Table A1)
    — the four line/word-shape rules that :func:`quality_filter` (word
    count, mean word length, punctuation, stopwords) and
    :func:`repetition_stats` (duplicate n-gram fractions) do not cover:

    - ``bullet_frac``   fraction of lines starting with a bullet
      (fail > 0.9)
    - ``ellipsis_frac`` fraction of lines ending with an ellipsis
      (fail > 0.3)
    - ``alpha_frac``    fraction of words containing an alphabetic
      character (fail < 0.8)
    - ``symbol_word_ratio`` (# + ellipsis occurrences) / words
      (fail > 0.1)

    plus the composite ``keep`` = quality_filter's verdict AND all
    four new rules.  Every signal is a split/filter/length expression
    over the text column — pure map-side codegen, zero shuffles, and
    every ratio is an exact integer division (DuckDB-replayable).
    Degenerate docs (no lines / no tokens) get NULL ratios via
    try_divide and fail the affected rules by COALESCE(false) —
    matching the oracle's CASE WHEN guards.
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullets = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
        )
    )
    ellipses_end = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).like("%...") | F.rtrim(l).like("%…"),
        )
    )
    toks = _tokens(text_col)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    ell_occ = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / F.lit(3)
    base = quality_filter(df, text_col)
    out = (
        base.withColumn("bullet_frac", F.try_divide(bullets, n_lines))
        .withColumn("ellipsis_frac", F.try_divide(ellipses_end, n_lines))
        .withColumn("alpha_frac", F.try_divide(alpha, F.size(toks)))
        .withColumn(
            "symbol_word_ratio", F.try_divide(hashes + ell_occ, F.size(toks))
        )
        .withColumn("fail_bullets", F.coalesce(F.col("bullet_frac") > 0.9, F.lit(True)))
        .withColumn(
            "fail_ellipsis", F.coalesce(F.col("ellipsis_frac") > 0.3, F.lit(True))
        )
        .withColumn("fail_alpha", F.coalesce(F.col("alpha_frac") < 0.8, F.lit(True)))
        .withColumn(
            "fail_symbols",
            F.coalesce(F.col("symbol_word_ratio") > 0.1, F.lit(True)),
        )
    )
    return out.withColumn(
        "keep",
        F.col("keep")
        & ~F.col("fail_bullets")
        & ~F.col("fail_ellipsis")
        & ~F.col("fail_alpha")
        & ~F.col("fail_symbols"),
    )


def html_extract(df: DataFrame, id_col: str, html_col: str = "html") -> DataFrame:
    """HTML -> text extraction (r7) — the first transform every
    web-crawl corpus pipeline runs.  REAL parsing via the stdlib
    ``html.parser`` state machine (not regex): tags stripped, text
    inside <script>/<style>/<template>/<noscript>/<title> dropped,
    character/numeric entities decoded (&amp; &#65; &#x41;), block
    elements (<p> <div> <br> <li> <h1-6> <tr> ...) become newline
    boundaries, runs of whitespace collapse, output trimmed.

    Arrow-batched mapInPandas, zero shuffles — at 100 TB this is a
    pure map stage that pipelines with the scan.  Output: (id,
    extracted text, n_tags seen, n_dropped_blocks) so downstream
    quality filters can use markup density as a signal (boilerplate-
    heavy pages have high tag/text ratios).
    """
    import pandas as pd

    from html.parser import HTMLParser

    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
        "h5", "h6", "tr", "table", "section", "article", "header",
        "footer", "blockquote", "pre",
    }
    _DROP = {"script", "style", "template", "noscript", "title"}

    class _Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.drop_depth = 0
            self.n_tags = 0
            self.n_dropped = 0

        def handle_starttag(self, tag, attrs):
            self.n_tags += 1
            if tag in _DROP:
                self.drop_depth += 1
                self.n_dropped += 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in _DROP and self.drop_depth:
                self.drop_depth -= 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.drop_depth:
                self.parts.append(data)

    def extract_one(html: str) -> tuple[str, int, int]:
        p = _Extract()
        try:
            p.feed(html)
            p.close()
        except Exception:  # noqa: BLE001 — tolerant reader
            return ("", p.n_tags, p.n_dropped)
        # collapse whitespace: runs of spaces/tabs -> one space,
        # newline boundaries kept as single newlines, edges trimmed
        import re

        text = "".join(p.parts)
        lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in text.split("\n")]
        text = "\n".join(ln for ln in lines if ln)
        return (text, p.n_tags, p.n_dropped)

    def op(batches):
        for pdf in batches:
            rows = [
                (int(i), *extract_one(str(h)))
                for i, h in zip(pdf[id_col], pdf[html_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, "text", "n_tags", "n_dropped_blocks"]
            )

    return df.select(id_col, html_col).mapInPandas(
        op,
        schema=f"{id_col} long, text string, n_tags int, n_dropped_blocks int",
    )


def bloom_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 3,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Bloom-filter contamination screen (r7) — the 100 TB shape of
    :func:`contamination_check`: instead of broadcasting the eval
    corpus's full shingle inventory (gigabytes for a big benchmark
    suite), broadcast only its BLOOM BIT SET — ``n_hashes`` md5-derived
    positions in ``[0, m_bits)`` per shingle — and flag a training
    shingle as a *maybe*-hit when all of its positions are set.
    One-sided: every true collision is flagged (no false negatives);
    false positives occur at the classic (1-e^-kn/m)^k rate and are
    resolved by the exact join on the SURVIVORS only — the standard
    two-phase screen (cheap probabilistic pass over everything, exact
    pass over the ~0.1% that survive).

    Determinism: positions are md5(seed # shingle) mod m — a pure
    function of the data (SQL-replayable; no library Bloom filter with
    private seeds), so the screen is reproducible across engines and
    retries like every other hash decision in this package.

    Plan shape: eval positions dim (<= n_hashes * |eval shingles| rows,
    deduped) builds once; the train side explodes to (shingle,
    position) and broadcast-joins the positions dim; a shingle
    survives iff matched-position count == n_hashes.  Output per
    training doc: ``n_maybe`` (Bloom survivors), ``n_exact`` (true
    shared shingles), and the doc's false-positive count
    ``n_false_pos = n_maybe - n_exact``.
    """
    from transcriptomics_data_integration_spark.llmdata.dedup import shingles

    # explode fan-out needs input SPLITS: a small parquet file arrives
    # as one partition, and without the repartition the ~550x shingle
    # explode plus the distinct's map-side partial agg all run in ONE
    # task (measured at sf0.1: 4.97 s single-task -> parallel after) —
    # the cheap 1-row-per-doc shuffle buys the fan-out parallelism
    par = train.sparkSession.sparkContext.defaultParallelism
    tr_src = train.repartition(par)
    tr = shingles(tr_src, id_col, text_col, k).select(id_col, "shingle")
    ev = shingles(eval_docs, id_col, text_col, k).select("shingle").distinct()

    def positions(col):
        return F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws("#", F.lit(f"bloom{i}"), col).cast(
                                        "binary"
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % m_bits
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos")

    bitset = ev.select(positions(F.col("shingle"))).distinct()
    # verdict per DISTINCT train shingle — the shingle VOCABULARY is
    # orders of magnitude smaller than the (doc, shingle) pair
    # relation (docs share words), so the position explode + all-set
    # count runs over the vocab, and the pair relation sees ONE join
    # against the verdict dim instead of a 3x explode + count shuffle
    # (measured at sf0.1: 4.35 -> ~1.5 s; same asymptotics argument
    # at 100 TB, where vocab/pairs is even smaller)
    vocab = tr.select("shingle").distinct()
    maybe_sh = (
        vocab.select("shingle", positions(F.col("shingle")))
        .join(F.broadcast(bitset), "pos")
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_n_set"))
        .where(F.col("_n_set") == n_hashes)
        .select("shingle")
    )
    verdict = maybe_sh.join(
        ev.withColumn("_ev", F.lit(1)), "shingle", "left"
    ).select("shingle", F.lit(1).alias("_maybe"), F.coalesce("_ev", F.lit(0)).alias("_evf"))
    # dedupe (doc, shingle) AFTER the verdict filter, not before (r8,
    # from the 1 M-doc web_pipeline probe): shingles() can emit repeats
    # within a doc, but a pre-filter distinct shuffles the FULL pair
    # relation (the probe's dominant cost — 366 M rows at 1 M docs)
    # while the post-filter distinct shuffles only Bloom survivors
    # (~0.1% in the realistic selective regime; identical size only in
    # the adversarial saturated-vocab case, so the reorder is
    # equal-or-better everywhere).  The verdict dim is the shingle
    # VOCABULARY — bounded and usually broadcast by AQE — so the
    # verdict join itself stays map-side.
    joined = tr.join(verdict, "shingle").select(id_col, "shingle", "_evf").distinct()
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_maybe"),
        F.sum("_evf").alias("n_exact"),
        (F.count(F.lit(1)) - F.sum("_evf")).alias("n_false_pos"),
    )


def unicode_clean(
    df: DataFrame, id_col: str, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Unicode normalization pass (r7) — the mojibake/invisible-char
    hygiene step web corpora need before tokenization:

    - NFC composition (e + combining-acute -> single codepoint, so
      equal-looking strings hash equal — dedup and contamination
      depend on it);
    - C0/C1 control characters stripped (tab/newline/CR kept);
    - zero-width and BOM codepoints stripped (ZWSP/ZWNJ/ZWJ/FEFF);
    - unicode space separators folded to ASCII space (NBSP, en/em
      spaces, ideographic space).

    Arrow-batched mapInPandas (NFC needs the Unicode tables; stdlib
    ``unicodedata`` — no JVM builtin); emits codepoint counters so a
    quality filter can flag mojibake-heavy docs.  DuckDB replays NFC
    via ``nfc_normalize`` and the strips via regexps — both engines
    implement the same Unicode standard, so the gate is exact.
    """
    import pandas as pd

    import re as _re
    import unicodedata as _ud

    _CTRL = _re.compile(
        "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f"
        "\u200b\u200c\u200d\ufeff]"
    )
    _SPACES = _re.compile("[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]")

    def clean_one(t: str) -> tuple[str, int, int]:
        n0 = len(t)
        t1 = _ud.normalize("NFC", t)
        t2 = _SPACES.sub(" ", _CTRL.sub("", t1))
        return (t2, n0, len(t2))

    def op(batches):
        for pdf in batches:
            rows = [
                (int(i), *clean_one(str(t)))
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, out_col, "n_cp_in", "n_cp_out"]
            )

    return df.select(id_col, text_col).mapInPandas(
        op,
        schema=f"{id_col} long, {out_col} string, n_cp_in int, n_cp_out int",
    )


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Compression-ratio quality signal (r7) — the entropy proxy
    production filters use beside the Gopher rules: highly repetitive
    or templated documents compress far below prose (ratio << 1 end of
    the prose band), random/binary-ish text barely compresses
    (ratio ~ 1).  stdlib zlib at a fixed level, so the signal is
    deterministic for a given zlib build — declared rows-only (no SQL
    engine can replay DEFLATE), numerics pinned by pytest goldens on
    planted repetitive/prose/random inputs.

    Arrow-batched mapInPandas, zero shuffles; emits raw/compressed
    byte counts so thresholds stay an analyst decision.
    """
    import zlib as _zlib

    import pandas as pd

    def op(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = str(t).encode("utf-8")
                comp = _zlib.compress(raw, level)
                rows.append(
                    (
                        int(i),
                        len(raw),
                        len(comp),
                        (len(comp) / len(raw)) if raw else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "n_compressed", "compression_ratio"],
            )

    return df.select(id_col, text_col).mapInPandas(
        op,
        schema=(
            f"{id_col} long, n_bytes int, n_compressed int, "
            "compression_ratio double"
        ),
    )


def _rle_match_bits(l_expr: str) -> str:
    """Fixed-Huffman bits for ONE distance-1 match of length ``l``
    (3..257): 5-bit distance code (dist 1 = code 0, no extra) plus the
    RFC 1951 §3.2.5/§3.2.6 length-code cost — codes 257-279 are 7-bit
    in the fixed tree, 280-284 are 8-bit, with 0-5 extra bits by
    length bucket."""
    return f"""(5 + CASE
      WHEN {l_expr} <= 10 THEN 7
      WHEN {l_expr} <= 18 THEN 8
      WHEN {l_expr} <= 34 THEN 9
      WHEN {l_expr} <= 66 THEN 10
      WHEN {l_expr} <= 114 THEN 11
      WHEN {l_expr} <= 130 THEN 12
      ELSE 13 END)"""


def _rle_run_bits(b_expr: str, n_expr: str, intdiv: str = "DIV") -> str:
    """Fixed-Huffman bits for one maximal run of character ``b``
    repeated ``n`` times, encoded as DEFLATE emits RLE: first
    occurrence is a literal (8 bits for code points < 144, 9
    otherwise — RFC 1951 fixed literal tree; code points above 255
    are costed 9 as a documented approximation), the remaining n-1 as
    greedy distance-1 matches — full 258-length matches (code 285:
    8 + 5 bits, no extra), then one match for a remainder >= 3, else
    remainder literals.  ``intdiv`` is the engine's integer-division
    operator (Spark ``DIV``, DuckDB ``//``) — everything else is
    portable SQL, so the DuckDB oracle reuses this generator."""
    lit = f"(CASE WHEN ascii({b_expr}) < 144 THEN 8 ELSE 9 END)"
    rem = f"(({n_expr} - 1) % 258)"
    return f"""(CASE WHEN {n_expr} <= 0 THEN 0 ELSE
      {lit}
      + (({n_expr} - 1) {intdiv} 258) * 13
      + CASE WHEN {rem} >= 3 THEN {_rle_match_bits(rem)}
             ELSE {rem} * {lit} END
    END)"""


def rle_deflate_size(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Deterministic DEFLATE-subset size (r9) — the hash-gateable twin
    of :func:`compression_ratio`'s zlib signal: the EXACT zlib-stream
    byte count a canonical encoder would emit using one fixed-Huffman
    block (RFC 1951 §3.2.6) restricted to distance-1 matches (zlib's
    Z_RLE strategy family): every maximal character run costs one
    literal plus greedy back-references.  Because every symbol's bit
    cost is a table lookup and the parse is the unique maximal-run
    decomposition, the size is pure integer arithmetic — replayable in
    SQL, unlike full DEFLATE's implementation-defined match heuristics.

    Signal: run-redundancy (whitespace floods, padding, repeated-char
    art) — the subset of compression_ratio's signal that is
    engine-exact; word-level repetition stays with the zlib kernel's
    pytest-pinned goldens.

    Output per doc: (n_chars, rle_bits, rle_bytes, rle_ratio) with
    rle_bytes = 2 (zlib header) + ceil((3 + bits + 7)/8) (BFINAL+BTYPE
    header, symbol bits, 7-bit end-of-block code 256) + 4 (adler32),
    and rle_ratio = rle_bytes / n_chars (one IEEE division; NULL for
    empty docs).

    Plan shape: ONE whole-stage-codegen aggregate() fold per document
    (run detection + bit cost in a single pass, no character explode,
    no shuffle) — corpus-linear and embarrassingly parallel.
    """
    run_prev = _rle_run_bits("s.prev", "s.run")
    fold = f"""aggregate(
      transform(sequence(1, length({text_col})), i -> substring({text_col}, i, 1)),
      named_struct('prev', '', 'run', 0, 'bits', CAST(0 AS BIGINT)),
      (s, c) -> CASE WHEN c = s.prev
        THEN named_struct('prev', s.prev, 'run', s.run + 1, 'bits', s.bits)
        ELSE named_struct('prev', c, 'run', 1,
                          'bits', s.bits + {run_prev}) END,
      s -> s.bits + {run_prev}
    )"""
    bits = F.when(
        F.length(text_col) == 0, F.lit(0).cast("bigint")
    ).otherwise(F.expr(fold))
    out = df.select(
        F.col(id_col),
        F.length(text_col).cast("int").alias("n_chars"),
        bits.alias("_sym_bits"),
    ).select(
        id_col,
        "n_chars",
        (F.col("_sym_bits") + 10).cast("bigint").alias("rle_bits"),
        (
            F.lit(6) + F.floor((F.col("_sym_bits") + 10 + 7) / 8).cast("bigint")
        ).alias("rle_bytes"),
    )
    return out.withColumn(
        "rle_ratio",
        F.when(
            F.col("n_chars") > 0,
            F.round(F.col("rle_bytes") / F.col("n_chars"), 6),
        ),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lam: float = 0.8,
) -> DataFrame:
    """Interpolated bigram LM quality score (r7) — one modeling rung
    above :func:`doc_logprob`'s unigram: the corpus-fit bigram model
    with unigram back-off interpolation,

        p(w2 | w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N,

    scored as the mean ln p over each document's bigram occurrences.
    Catches the gibberish unigram filters miss (plausible words in
    implausible ORDER — shuffled text, keyword stuffing) — the next
    step toward CCNet's KenLM-perplexity filter without an external
    model.

    Plan shape: the bigram relation is built as in-plan array algebra
    (no self-join on positions), aggregated once for the bigram
    vocabulary; the model dim joins the unigram counts of ITS OWN
    endpoints (vocab-sized, not corpus-sized) and attaches back to
    the per-doc bigram stream with one join.  ln() is transcendental;
    gated outputs round (repo FP policy).
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')"
    )
    bg_expr = (
        "CASE WHEN size(_toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_toks) - 1), "
        "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1))) END"
    )
    docs_t = df.select(F.col(id_col), toks.alias("_toks"))
    tokens = docs_t.select(id_col, F.explode("_toks").alias("token"))
    bigrams = docs_t.select(
        id_col, F.explode(F.expr(bg_expr)).alias("bigram")
    )
    uni = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").alias("N"))
    bi = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    w1 = F.expr("split(bigram, ' ')[0]")
    w2 = F.expr("split(bigram, ' ')[1]")
    model = (
        bi.withColumn("_w1", w1)
        .withColumn("_w2", w2)
        .join(uni.select(F.col("token").alias("_w1"), F.col("c").alias("c1")), "_w1")
        .join(uni.select(F.col("token").alias("_w2"), F.col("c").alias("c2")), "_w2")
        .join(F.broadcast(total))
        .select(
            "bigram",
            F.log(
                F.lit(float(lam)) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - float(lam)) * F.col("c2") / F.col("N")
            ).alias("lp"),
        )
    )
    return (
        bigrams.join(model, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("lp") / F.count(F.lit(1))).alias("mean_bigram_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lam: float = 0.8,
    round_dp: int = 6,
) -> DataFrame:
    """CCNet-style perplexity bucketing (r8): score every doc with the
    corpus-fit interpolated bigram LM (:func:`bigram_logprob`), then
    assign head / middle / tail by the corpus score TERTILES — the
    quality stratification CCNet (Wenzek et al., public) applies
    before per-bucket sampling, here on mean bigram log-prob (higher
    = more fluent) instead of an external LM's perplexity.

    Scale shape: bucket assignment is NOT a global ntile window (the
    single-task trap) — the two tertile thresholds are ONE exact-
    percentile 1-row aggregate, broadcast back, and the bucket is a
    map-side comparison.  Thresholds and comparisons run on the
    ROUNDED score (``round_dp``): the raw ln() can differ by 1 ulp
    between engines' libm, and a doc sitting exactly on a tertile
    boundary must land in the same bucket everywhere — rounding
    collapses the ulp noise into the repo's standard 6-dp FP policy.

    Output: (id, n_bigrams, score, bucket) with bucket 1 = head
    (score >= upper tertile), 2 = middle, 3 = tail.
    """
    scored = bigram_logprob(df, id_col, text_col, lam).withColumn(
        "score", F.round("mean_bigram_logprob", round_dp)
    )
    thr = scored.agg(
        F.percentile("score", F.lit(2.0 / 3.0)).alias("_t_hi"),
        F.percentile("score", F.lit(1.0 / 3.0)).alias("_t_lo"),
    )
    return (
        scored.join(F.broadcast(thr))
        .withColumn(
            "bucket",
            F.when(F.col("score") >= F.col("_t_hi"), F.lit(1))
            .when(F.col("score") >= F.col("_t_lo"), F.lit(2))
            .otherwise(F.lit(3)),
        )
        .select(id_col, "n_bigrams", "score", "bucket")
    )


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Kneser-Ney bigram LM quality score (r8) — the smoothing family
    KenLM implements and CCNet's perplexity filter actually runs
    (Wenzek et al.; Heafield 2011, both public).  One rung above the
    interpolated model of :func:`bigram_logprob`: the back-off weight
    is the CONTINUATION probability (how many distinct contexts a word
    follows), not the raw unigram frequency — "Francisco" is frequent
    but only ever follows "San", so KN correctly scores it near zero
    in novel contexts where raw-frequency interpolation overrates it.

        p_KN(w2 | w1) = (c(w1 w2) - d) / c(w1 .)
                        + d * T(w1)/c(w1 .) * C(w2)/B

    with fixed discount d = 3/4, c(w1 .) the left-context bigram
    total, T(w1) = |{w : c(w1 w) > 0}| distinct continuations of w1,
    C(w2) = |{w : c(w w2) > 0}| distinct left contexts of w2, and
    B the number of distinct bigram types.  Every scored bigram comes
    from the corpus itself so c12 >= 1 and the max(., 0) clamp never
    binds.

    FP determinism: with d = 3/4 the whole probability is ONE rational

        p = ((4*c12 - 3) * B + 3 * T1 * C2) / (4 * c1dot * B)

    — numerator and denominator are exact BIGINT expressions, so the
    score is a single DOUBLE division + one ln() on identical operands
    in any engine (the rna_degradation literal-coefficient
    discipline).  Per-doc mean over bigram occurrences rounds 6 dp
    (repo FP policy).

    Plan shape (mirrors :func:`bigram_logprob`): the bigram relation
    is in-plan array algebra; all four model statistics are aggregates
    of the VOCABULARY-sized bigram-type relation (never the corpus
    stream); B rides one 1-row broadcast attach; one equi-join back to
    the per-doc bigram stream; one doc-keyed aggregation.  At 100 TB
    the only corpus-sized shuffles are the bigram-type groupBy and the
    final doc groupBy — both linear, both AQE-coalescible.
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')"
    )
    bg_expr = (
        "CASE WHEN size(_toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_toks) - 1), "
        "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1))) END"
    )
    docs_t = df.select(F.col(id_col), toks.alias("_toks"))
    bigrams = docs_t.select(
        id_col, F.explode(F.expr(bg_expr)).alias("bigram")
    )
    bi = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("c12")
    ).withColumn("_w1", F.expr("split(bigram, ' ')[0]")).withColumn(
        "_w2", F.expr("split(bigram, ' ')[1]")
    )
    left = bi.groupBy("_w1").agg(
        F.sum("c12").alias("c1dot"), F.count(F.lit(1)).alias("t1")
    )
    cont = bi.groupBy("_w2").agg(F.count(F.lit(1)).alias("c2cont"))
    total = bi.agg(F.count(F.lit(1)).alias("B"))
    model = (
        bi.join(left, "_w1")
        .join(cont, "_w2")
        .join(F.broadcast(total))
        .select(
            "bigram",
            F.log(
                (
                    (4 * F.col("c12") - 3) * F.col("B")
                    + 3 * F.col("t1") * F.col("c2cont")
                ).cast("double")
                / (4 * F.col("c1dot") * F.col("B")).cast("double")
            ).alias("lp"),
        )
    )
    return (
        bigrams.join(model, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("lp") / F.count(F.lit(1))).alias("mean_kn_logprob"),
        )
    )


def c4_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 heuristic cleaning battery (Raffel et al. 2020 §2.2, public)
    — the line- and document-level rules behind the C4 corpus,
    complementary to the Gopher battery (:func:`gopher_quality` judges
    shape ratios; C4 judges line syntax and code/boilerplate markers):

    line level (a line survives iff ALL hold):
      - ends in a terminal punctuation mark (``.`` ``!`` ``?`` ``"``),
      - has at least ``min_words_per_line`` words,
      - does not contain the word "javascript" (case-insensitive);
    document level (keep iff ALL hold):
      - at least ``min_kept_lines`` surviving lines,
      - no curly brace ``{`` anywhere (code marker),
      - no "lorem ipsum" (case-insensitive).

    Output: (id, n_lines, n_kept_lines, has_brace, has_lorem, keep,
    clean_text) with clean_text the surviving lines re-joined by
    newline (empty string when nothing survives).

    Plan shape: pure map-side array algebra over the line split —
    split, filter-lambda, sizes, array_join; ZERO shuffles at any
    corpus size (the same whole-stage-codegen class as pii_scrub).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: (
            ln.rlike('[.!?"]\\s*$')
            & (F.size(F.split(F.trim(ln), "\\s+")) >= min_words_per_line)
            & ~F.lower(ln).rlike("javascript")
        ),
    )
    out = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.col(text_col).contains("{").alias("has_brace"),
        F.lower(F.col(text_col)).rlike("lorem ipsum").alias("has_lorem"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_kept_lines") >= min_kept_lines)
        & ~F.col("has_brace")
        & ~F.col("has_lorem"),
    ).select(
        id_col, "n_lines", "n_kept_lines", "has_brace", "has_lorem",
        "keep", "clean_text",
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking (r8) — the standard preprocessing
    for embedding / retrieval pipelines (split long documents into
    fixed-size overlapping windows; overlap = chunk_tokens - stride so
    no boundary sentence is lost to a hard cut).

    Chunk starts are 1, 1+stride, 1+2*stride, ... while the window
    still covers an unseen token: start <= max(n - chunk_tokens +
    stride, 1).  A document with n <= chunk_tokens yields exactly one
    chunk.  Deterministic, engine-independent integer arithmetic
    throughout.

    Output: (id, chunk_id, start_token, n_chunk_tokens, chunk_text) —
    chunk_id 0-based, start_token 1-based.

    Plan shape: map-side sequence() + slice() + explode — the only
    shuffle-relevant effect is the row fan-out (bounded by
    n_tokens/stride per doc), which Spark handles as a generator in
    whole-stage codegen; no aggregation, no join.  At 100 TB this is
    embarrassingly parallel.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    base = df.select(
        F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n")
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("_n") - F.lit(chunk_tokens) + F.lit(stride), F.lit(1)),
        F.lit(stride),
    )
    return (
        base.select(
            id_col, "_t", F.posexplode(starts).alias("chunk_id", "start_token")
        )
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("start_token").cast("bigint").alias("start_token"),
            F.slice(F.col("_t"), F.col("start_token"), F.lit(chunk_tokens)).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            "start_token",
            F.size("_c").cast("bigint").alias("n_chunk_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf rank-frequency fit (r8) — the corpus-health diagnostic: a
    natural-language corpus's term frequencies follow f(r) ~ C * r^s
    with s near -1; template/boilerplate floods and tokenizer bugs
    show up as a slope far from -1 or a poor fit.  Fits OLS of
    ln(freq) on ln(rank) over the top ``top_n`` terms.

    Plan shape: corpus-sized work is ONE token-explode groupBy (the
    term inventory, map-side combined); the top-n cut is
    orderBy+limit — Spark's TakeOrdered, a per-partition heap + driver
    merge, never a global sort; the rank window and OLS moments then
    run on a bounded ``top_n``-row relation.  Deterministic ordering:
    (freq DESC, term ASC).

    Output: ONE corpus-level row — (n_terms, slope, intercept) with
    slope/intercept raw doubles (callers round per repo FP policy).
    The fit is corpus-global by definition (rank is a corpus rank), so
    there is no per-doc variant and no id column (r8 ADVICE).
    """
    tokens = df.select(
        F.explode(
            F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
        ).alias("term")
    )
    freq = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = freq.orderBy(F.col("freq").desc(), F.col("term")).limit(top_n)
    ranked = top.select(
        "term",
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("term")))
        .alias("rank"),
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        F.col("n_terms").cast("bigint").alias("n_terms"),
        (
            (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        (
            (F.col("sy") - ((F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx"))) * F.col("sx"))
            / F.col("n_terms")
        ).alias("intercept"),
    )
