"""Registry contract tests: every query runs at sf0.001, oracle keys are a
subset of query keys, and column names never collide with un-aliased
aggregates (driver's hash sorts columns by name)."""

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["word", "count"]


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_has_sane_columns(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    # no duplicate column names, no un-aliased computed names like sum(x)
    assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    for c in cols:
        assert "(" not in c, f"{name}: un-aliased column {c}"
    df.limit(5).collect()  # executes the plan
