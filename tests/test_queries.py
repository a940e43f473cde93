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


def test_bloom_semijoin_matches_python_twin(spark):
    """orders_bloom_semijoin == a hashlib twin of the same seeded
    md5-60 positions — and the Bloom guarantee holds: zero false
    negatives (every true match passes), fp only ever positive."""
    import hashlib

    import duckdb

    from deja_view_spark.queries_relational import (
        BLOOM_K,
        BLOOM_M,
        BLOOM_PRICE_MIN,
        q_orders_bloom_semijoin,
    )

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).df()
    li = con.execute(
        f"SELECT l_orderkey FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()

    def positions(k: int) -> set:
        return {
            int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16)
            % BLOOM_M
            for i in range(BLOOM_K)
        }

    build = [
        int(k)
        for k, p in zip(orders["o_orderkey"], orders["o_totalprice"])
        if p >= BLOOM_PRICE_MIN
    ]
    filt = set().union(*(positions(k) for k in build)) if build else set()
    probe = sorted({int(k) for k in li["l_orderkey"]})
    passed = {k for k in probe if positions(k) <= filt}
    truth = set(probe) & set(build)
    admitted = sum(1 for k in li["l_orderkey"] if int(k) in passed)
    true_rows = sum(1 for k in li["l_orderkey"] if int(k) in truth)

    r = q_orders_bloom_semijoin(spark, SF_DIR).collect()[0]
    assert truth <= passed  # the Bloom no-false-negative guarantee
    assert (
        r.n_build_keys,
        r.n_probe_keys,
        r.n_bloom_pass,
        r.n_true_match,
        r.n_false_pos,
        r.lineitems_admitted,
        r.lineitems_true,
    ) == (
        len(build),
        len(probe),
        len(passed),
        len(truth),
        len(passed) - len(truth),
        admitted,
        true_rows,
    )
