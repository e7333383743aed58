"""Validate every queries()/oracle_sql() pair exactly like the driver does."""

import pytest

import __spark_entry__ as entrymod
from tests.compare import compare_spark_duck, duck_connect


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0 and len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0
        return
    con = duck_connect(sf_dir)
    compare_spark_duck(df, con, oracles[name])
