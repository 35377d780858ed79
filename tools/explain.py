"""Dump the physical plan (and a shape summary) for any suite query.

Usage:
    python tools/explain.py <query> [sf_dir] [--full]

Shape summary counts the operators that matter for the PLANS.md scale
claims: exchanges, broadcast vs sort-merge vs nested-loop joins,
scans, whole-stage-codegen spans, pushed filters / pruned schemas.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.suite import QUERIES


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.001"
    spark = get_spark("explain")
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        "Exchange": plan.count("Exchange") - plan.count("ReusedExchange"),
        "ReusedExchange": plan.count("ReusedExchange"),
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "BroadcastNestedLoopJoin": plan.count("BroadcastNestedLoopJoin"),
        "HashAggregate": plan.count("HashAggregate"),
        "Window": plan.count("Window"),
        "Scan parquet": plan.count("Scan parquet"),
        "WholeStageCodegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "TakeOrderedAndProject": plan.count("TakeOrderedAndProject"),
    }
    print(f"== {name} @ {sf_dir}")
    for k, v in counts.items():
        if v:
            print(f"  {k}: {v}")
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1):
            print(f"  PushedFilters: [{m.group(1)}]")
            break
    if "--full" in sys.argv:
        print(plan)


if __name__ == "__main__":
    main()
