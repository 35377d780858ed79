"""Dump .explain("formatted") for suite queries to files.

Usage:
    python tools/explain_all.py <out_dir> [sf_dir] [query ...]

With no query list, dumps every BENCH_QUERIES entry.  Plans are built
(not executed) at the given SF — plan shape (Exchange count, join
strategy, PushedFilters, codegen spans) is what PLANS/OPTIMIZATION
claims are checked against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.suite import QUERIES


def explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2 and os.path.isdir(sys.argv[2])
        else "/root/testdata/sf0.001"
    )
    names = [a for a in sys.argv[2:] if not os.path.isdir(a)]
    if not names:
        import importlib

        bench = importlib.import_module("bench")
        names = list(bench.BENCH_QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-all")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            text = f"ERROR building {name}: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(f"== {name} @ {sf_dir}\n{text}\n")
        print(name, "ok" if not text.startswith("ERROR") else "ERROR", flush=True)


if __name__ == "__main__":
    main()
