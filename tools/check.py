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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
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
