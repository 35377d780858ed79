"""Physical-plan introspection: the checks PLANS.md records, as code.

These are development/CI guards for the SURVEY.md §4 execution
discipline: predicate pushdown reached the scan, dimension joins went
broadcast, column pruning held, no cartesian product appeared by
accident.  Used by tests and by the bench harness for plan audits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@dataclass
class PlanReport:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_nested_loop_joins: int
    pushed_filters: list[str]
    read_schemas: list[str]
    has_take_ordered: bool

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for schema in self.read_schemas:
            inner = schema.split("struct<", 1)[-1].rstrip(">")
            for field in inner.split(","):
                if ":" in field:
                    cols.add(field.split(":")[0].strip())
        return cols


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_formatted(df)
    lines = text.split("\n")
    return PlanReport(
        n_exchanges=sum("Exchange" in line and "Reused" not in line for line in lines),
        n_broadcast_joins=sum("BroadcastHashJoin" in line for line in lines),
        n_sortmerge_joins=sum("SortMergeJoin" in line for line in lines),
        n_nested_loop_joins=sum("BroadcastNestedLoopJoin" in line for line in lines),
        pushed_filters=[
            line.strip() for line in lines if "PushedFilters" in line and "[]" not in line
        ],
        read_schemas=[line.strip() for line in lines if "ReadSchema" in line],
        has_take_ordered=any("TakeOrderedAndProject" in line for line in lines),
    )
