"""Suite-wide physical-plan invariants — the SURVEY.md §4 execution
discipline as a regression net.  Catches a future edit that silently
turns a broadcast dim attach into a cartesian product, loses predicate
pushdown on the flagship scan, or drops the top-k heap plan."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from transcriptomics_data_integration_spark.plans import plan_report

SF = "/root/testdata/sf0.001"

# deliberate nested-loop users: brute-force similarity cross joins,
# the 1-row global-median attach in CQN, the 1-row min/max bounds
# attach of monotone_range_buckets (pack_sequences / skyline two-pass
# prefix sums), and htseq_scan's dense gene x sample grid (samples is
# the broadcast-small side by the S5 contract)
BNLJ_WHITELIST = {
    "cosine_topk", "ivf_ann", "cqn_bias",
    "pack_sequences", "skyline", "htseq_scan",
    # ks_test's bucketed ECDF: monotone_range_buckets bounds attach +
    # the 1-row (n1, n2) totals attach
    "ks_strata",
    # entry-point-B binned composition: cqn_simplified's 1-row
    # global-median attach (same as cqn_bias), twice in the tree
    "rnaseq_pipeline_binned",
    # M11/M12 distributed-phase gates: bounded gene x sample grid
    # completion (like htseq_scan) + mds_bmatrix's 1-row grand-sum
    # attach
    "pca_covariance", "mds_bmatrix", "kmeans_lloyd2",
    # ivf_fixed: broadcast center crossJoins (n_cells-row dim), like
    # ivf_ann
    "ivf_fixed",
    # pq_fixed: broadcast sub-centroid joins + the ADC codes x LUT sweep
    "pq_fixed",
    # doc_logprob: 1-row (N, V) model-total attach
    "doc_logprob",
    # bpe_merges: 1-row winning-pair attach per merge iteration
    "bpe_merges",
    # pca_outliers (r4 covariance route): bounded gene x gene grid
    # completion for the covariance matrix (same class as
    # pca_covariance) plus 1-row mean-vector / threshold attaches —
    # every BNLJ side is <= n_genes rows, never data-sized
    "pca_outliers",
    # p_adjust_by / de_adjust_methods (BY window path): 1-row
    # (n, harmonic-c(n)) totals attach — the per-group aggregate
    # broadcast back, never data-sized
    "p_adjust_by", "de_adjust_methods",
    # blocked_de (r11): the 1-row Fisher-z consensus scalar broadcast-
    # crossJoined into the per-block moment relation (once per branch
    # of the icc->consensus->GLS chain) — same 1-row-attach class as
    # the BY harmonic above, never data-sized
    "blocked_de",
    # voom_loess2 (voom_loess_fixed twin): deliberate
    # ranked.join(broadcast(bins)) <=64-row bin cross join + the 1-row
    # lowess bandwidth (h) bounds attach — both broadcast-small dims
    "voom_loess2",
    # voom_loess3 (1-robustifying-step twin): same bounded bin cross
    # joins twice (pass 1 + rw-weighted pass 2) + the 1-row
    # residual-median delta attach
    "voom_loess3",
    # semdedup: broadcast center crossJoin for cell assignment
    # (n_cells-row dim), same class as ivf_ann / ivf_fixed
    "semdedup",
    # semdedup_2level: TWO bounded broadcast center crossJoins — the
    # k x n_coarse center->group assignment and the n x n_coarse
    # level-1 vector assignment; both non-stream sides are <= n_cells
    # rows (the whole point of the tier is that the big n x k blowup
    # is GONE), same class as semdedup / ivf_fixed
    "semdedup_2level",
    # quality_model: three 1-row broadcast attaches (feature means,
    # step-1 betas, step-2 betas) — the monotone_range_buckets pattern
    "quality_model",
    # ann_recall: composes the two whitelisted similarity arms — the
    # deliberately-quadratic exact baseline (cosine_topk's bounded
    # query x corpus cross join) and ivf_fixed's broadcast center
    # crossJoins; the recall join itself is an equi-join
    "ann_recall",
    # bigram_logprob: the 1-row join(F.broadcast(total)) corpus-N
    # attach in the interpolated-LM model build (llmdata/text.py:959)
    # — identical to the whitelisted doc_logprob pattern
    "bigram_logprob",
    # bm25_topk: TWO 1-row broadcast attaches (corpus N/avgdl stats and
    # the per-query-term df row) — the monotone_range_buckets pattern
    "bm25_topk",
    # pagerank3: per unrolled round, the 1-row node-count and
    # dangling-mass broadcast attaches (plus the init N attach) —
    # every BNLJ side is exactly one row
    "pagerank3",
    # perplexity_buckets: bigram_logprob's 1-row corpus-N attach plus
    # its own 1-row tertile-threshold attach
    "perplexity_buckets",
    # repetition_schedule: composes perplexity_buckets (the attaches
    # above) + global_shuffle's 1-row bounds attach
    "repetition_schedule",
    # tfidf_keywords: the 1-row corpus-N attach
    "tfidf_keywords",
    # unigram_train / unigram_encode: each EM iteration cross-joins the
    # bounded word table with a ONE-ROW map_from_entries relation (the
    # piece->cost vocabulary artifact) plus the 1-row total attaches in
    # _scored — every BNLJ side is exactly one row, the
    # monotone_range_buckets pattern; counts are high (61/63) because
    # the map attach recurs per EM iteration and per _scored call
    "unigram_train",
    "unigram_encode",
    # wordpiece_merges: per iteration, the 1-row winning-pair broadcast
    # crossJoin feeding the greedy fold (the bpe_merges pattern) — the
    # symbol-count attaches are broadcast EQUI-joins, but the winner
    # attach is by construction a single row
    "wordpiece_merges",
    # kneser_ney: the 1-row distinct-bigram-total (B) broadcast attach
    # in the KN model build — the doc_logprob / bigram_logprob pattern
    "kneser_ney",
    # dsir_select: two 1-row broadcast attaches — the (Tt, Tr) totals
    # onto the bounded 1024-bucket model dim and the selection
    # percentile threshold (the perplexity_buckets pattern)
    "dsir_select",
    # prototype_prune: broadcast center crossJoin for cell assignment
    # (n_cells-row dim) — same class as ivf_fixed / semdedup
    "prototype_prune",
    # gsea_es: the 1-row ranked-list-total (N) broadcast attach onto
    # the bounded term dim
    "gsea_es",
    # url_blocklist: broadcast crossJoin of the bounded substring-rule
    # dim (a curation artifact, hundreds of rows by contract)
    "url_blocklist",
}


def test_no_accidental_nested_loop_joins(spark):
    offenders = {}
    for name, fn in entry.queries().items():
        rep = plan_report(fn(spark, SF))
        if rep.n_nested_loop_joins and name not in BNLJ_WHITELIST:
            offenders[name] = rep.n_nested_loop_joins
    assert offenders == {}


def test_flagship_scan_pushes_and_prunes(spark):
    rep = plan_report(entry.queries()["diff_expression"](spark, SF))
    assert rep.pushed_filters, "returnflag predicate must reach the parquet scan"
    cols = rep.read_columns()
    assert "l_partkey" in cols and "l_extendedprice" in cols
    assert len(cols) <= 4, f"column pruning lost: scan reads {sorted(cols)}"


def test_topk_filter_uses_heap_plan(spark):
    rep = plan_report(entry.queries()["nonspecific_filter"](spark, SF))
    assert rep.has_take_ordered, "top-k by sd must plan as TakeOrderedAndProject"


def test_rnaseq_binned_composition_prunes_scans(spark):
    """The hash-gated entry-point-B composition must stay pruned at the
    scans: the lineitem reads carry only the 3 count-building columns
    (partkey, suppkey, quantity) and the part read only the 2 attr
    columns — a composition that re-reads full-width rows would ship
    the whole corpus at 100 TB."""
    rep = plan_report(entry.queries()["rnaseq_pipeline_binned"](spark, SF))
    cols = rep.read_columns()
    assert cols <= {"l_partkey", "l_suppkey", "l_quantity", "p_partkey", "p_size"}, (
        f"composition scan reads {sorted(cols)}"
    )
