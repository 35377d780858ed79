"""Driver-contract smoke twins: entry() runs and returns a stable
schema; every declared query is callable; every oracle key has a
query; column names stay aligned between queries() and oracle_sql()
output (the driver's hash compare sorts by column name)."""

from __future__ import annotations

import importlib.util
import sys


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_stable_flagship_schema(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.simpleString() == (
        "struct<l_partkey:bigint,n_a:bigint,n_b:bigint,mean_a:double,"
        "mean_b:double,t_statistic:double,log2fc:double,p_value:double,"
        "adj_p_value:double>"
    )


def test_contract_dict_shapes():
    mod = _entry_mod()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q), "orphan oracles"
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_load_tables_returns_all_driver_tables(spark):
    from transcriptomics_data_integration_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    assert set(t) >= {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert t["region"].count() == 5
