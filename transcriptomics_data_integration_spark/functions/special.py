"""Portable SQL text for log-gamma and log-binomial-coefficient.

The reference runs Fisher exact tests per GO term
(`scripts/data_integration/Meta_analysis.R:1359-1392` — `fisher.test`
inside GOstats' hyperGTest).  Neither Spark SQL nor the engine's
no-UDF-in-hot-path policy allows `scipy.stats.hypergeom`, so the
hypergeometric tail is built from a closed-form ``lgamma``:

- Stirling–de Moivre series at ``z + 8`` (terms through 1/z^7), then
  the recurrence ``lgamma(z) = lgamma(z+8) - sum ln(z+i)`` shifts back.
  Max abs error ~1.5e-11 over z in [1, 1e6] — three orders below the
  1e-6 rounding applied before oracle hashing.

The emitted text uses only ``+ - * /``, ``ln``, ``exp``, ``CAST`` — all
whole-stage-codegen'd in Spark and parseable by DuckDB, so engine and
oracle evaluate the identical formula (same pattern as
`functions/normal.py`).
"""

from __future__ import annotations

# 0.5 * ln(2 * pi)
_HALF_LN_2PI = "9.18938533204672742e-01"


def lgamma_sql(z: str) -> str:
    """SQL text for lgamma(z); ``z`` must be a DOUBLE expression >= 1."""
    y = f"(CAST({z} AS DOUBLE) + 8.0e0)"
    series = (
        f"(({y} - 5.0e-01) * ln({y}) - {y} + {_HALF_LN_2PI}"
        f" + 1.0e0 / (1.2e1 * {y})"
        f" - 1.0e0 / (3.6e2 * {y} * {y} * {y})"
        f" + 1.0e0 / (1.26e3 * {y} * {y} * {y} * {y} * {y})"
        f" - 1.0e0 / (1.68e3 * {y} * {y} * {y} * {y} * {y} * {y} * {y}))"
    )
    shift = " + ".join(f"ln(CAST({z} AS DOUBLE) + {i}.0e0)" for i in range(8))
    return f"({series} - ({shift}))"


def log_choose_sql(n: str, k: str) -> str:
    """SQL text for ln C(n, k); ``n``, ``k`` integer-valued, 0 <= k <= n."""
    return (
        f"({lgamma_sql(f'({n}) + 1')} - {lgamma_sql(f'({k}) + 1')}"
        f" - {lgamma_sql(f'({n}) - ({k}) + 1')})"
    )


def hypergeom_tail_sql(k_from: str, n_total: str, n_term: str, n_sig: str, *, dialect: str) -> str:
    """SQL text for the upper hypergeometric tail
    ``P(X >= k_from)`` with ``X ~ Hypergeom(N=n_total, K=n_term,
    n=n_sig)`` — the one-sided Fisher exact enrichment p-value.

    ``dialect`` is ``"spark"`` (``aggregate`` over ``sequence``) or
    ``"duckdb"`` (``list_sum`` over ``list_transform`` of
    ``generate_series``).  The per-k term text is identical in both, so
    the engines fold the same doubles in the same order.
    """
    log_pmf = (
        f"({log_choose_sql(n_term, 'k')}"
        f" + {log_choose_sql(f'({n_total}) - ({n_term})', f'({n_sig}) - k')}"
        f" - {log_choose_sql(n_total, n_sig)})"
    )
    k_to = f"least(CAST({n_sig} AS BIGINT), CAST({n_term} AS BIGINT))"
    k_lo = f"CAST({k_from} AS BIGINT)"
    if dialect == "spark":
        return (
            f"aggregate(sequence({k_lo}, {k_to}), CAST(0.0 AS DOUBLE),"
            f" (acc, k) -> acc + exp({log_pmf}))"
        )
    if dialect == "duckdb":
        return (
            f"list_sum(list_transform(generate_series({k_lo}, {k_to}),"
            f" k -> exp({log_pmf})))"
        )
    raise ValueError(f"unknown dialect: {dialect}")
