"""Every driver-checkable query returns rows with stable schema at
sf0.001 (the driver's smoke contract); oracle parity itself is checked
by tools/check_oracles.py and the driver at sf0.01."""

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_edges(spark):
    df = E.entry(spark)
    assert set(df.columns) == {"src", "dst", "similarity", "rank"}
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_runs(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_oracles_cover_queries():
    assert set(E.oracle_sql()) <= set(E.queries())
