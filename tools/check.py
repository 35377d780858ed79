"""Local replica of the driver's correctness gate.

Runs every suite query on Spark and its oracle on DuckDB at the given
scale factor, compares row count, column names (case-insensitive), and
an order-insensitive, **driver-strict** value comparison.  Usage:

    python tools/check.py [sf_dir] [query ...]

Strictness contract (round-3 fix): the round-2 gate canonicalized
``2190.0 -> "2190"`` and ``-0.0 -> "0"``, which was looser than the
driver's hash and shipped three false-green queries.  This version
preserves the numeric *kind* (int vs float), the float repr, and the
sign of zero, so any oracle-typing artifact (DuckDB HUGEINT -> float64,
negative zero from ROUND) is red locally before it is red on the
driver.

Round-7 hardening (the r6 burn): ``fetchall()`` converts DuckDB
HUGEINT to Python int, silently normalizing exactly the typing
artifact the driver's pandas/Arrow materialization does NOT normalize
(a windowed ``SUM(BIGINT)`` is typed HUGEINT and the driver renders it
"903.0" vs Spark's "903" -> hash mismatch with rows/schema green —
the CORRECTNESS_r06 `token_budget_sample` signature).  So before
executing anything, `oracle_type_problems()` DESCRIBEs every oracle
and fails any whose *final* projection carries a HUGEINT / UHUGEINT /
DECIMAL column — the whole class is red at plan-build time.  The same
sweep runs as a pytest (tests/test_entry_contract.py).
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.suite import ORACLES, QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    """Canonical string for one cell, strict about numeric kind.

    - int (incl. numpy ints via .item() upstream) -> "2190"
    - float -> repr(): "2190.0", "-0.0", "0.001" — kind + sign preserved
    - Decimal -> via float (suite queries cast exact decimals to double
      before returning; a Decimal reaching here at full scale would be
      an output-typing bug worth seeing)
    - bool -> "true"/"false" (distinct from ints)
    - None -> "NULL", NaN -> "NaN"
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def _to_py(v):
    """numpy scalar -> python scalar, preserving int/float kind."""
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        return v.item()
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append("\x01".join(norm_cell(_to_py(vals[i])) for i in order))
    out.sort()
    return out


# DuckDB result types whose pandas/Arrow materialization diverges from
# fetchall(): HUGEINT/UHUGEINT -> float64 (or object), DECIMAL ->
# Decimal objects / float drift.  Oracles must CAST these away.
FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_problems(con, oracles: dict[str, str]) -> dict[str, str]:
    """DESCRIBE every oracle; return {query: problem} for any whose
    final projection contains a forbidden (driver-divergent) type."""
    problems: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — surfaced by the main loop
            problems[name] = f"DESCRIBE failed: {e}"
            continue
        bad = [
            f"{col}:{ctype}"
            for col, ctype, *_ in rows
            if any(t in str(ctype).upper() for t in FORBIDDEN_ORACLE_TYPES)
        ]
        if bad:
            problems[name] = (
                "oracle final type(s) diverge under the driver's "
                f"pandas/Arrow materialization: {', '.join(bad)} — "
                "CAST them (e.g. AS BIGINT / AS DOUBLE)"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    type_problems = oracle_type_problems(
        con, {n: sql for n, sql in ORACLES.items() if not only or n in only}
    )
    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name in type_problems and "DESCRIBE failed" not in type_problems[name]:
            print(f"FAIL {name}: {type_problems[name]}")
            n_fail += 1
            continue
        try:
            sdf = fn(get_spark("check"), sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        oracle = ORACLES.get(name)
        if oracle is None:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            a = canon([tuple(r) for r in srows], [c.lower() for c in scols])
            b = canon(orows, [c.lower() for c in ocols])
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
            if diff:
                i = diff[0]
                problems.append(
                    f"{len(diff)} value mismatches; first at sorted-row {i}:\n"
                    f"  spark: {a[i]}\n  duck:  {b[i]}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
