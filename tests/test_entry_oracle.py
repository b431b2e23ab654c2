"""Drives every queries() entry against its oracle_sql() — the same
check the correctness driver performs at sf0.01, run here at sf0.001
so it stays fast enough for the inner loop."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_util import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    # non-SQL-expressible ops: driver records a weaker rows-only check
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
