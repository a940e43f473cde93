"""Wave-56: shingle-df cost census and fulfillment latency."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_relational import q_orders_fulfillment_latency
from deja_view_spark.queries_text import q_docs_shingle_df_histogram


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def test_shingle_df_histogram_pair_mass(spark, tmp_path):
    docs = [
        Row(doc_id=i, text="a b c", lang="en", source="s1", n_chars=5)
        for i in range(1, 4)              # df=3 -> bucket 1, 3 pairs
    ]
    docs.append(Row(doc_id=4, text="x y z", lang="en", source="s1",
                    n_chars=5))            # df=1 -> bucket 0, 0 pairs
    docs += [
        Row(doc_id=100 + i, text="q r s", lang="en", source="s1",
            n_chars=5)
        for i in range(101)               # df=101 -> bucket 6, cut
    ]
    _write(spark, tmp_path, "documents", docs)
    out = {r.bucket: r for r in
           q_docs_shingle_df_histogram(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 6}
    b0, b1, b6 = out[0], out[1], out[6]
    assert (b0.n_shingles, b0.n_postings, b0.pair_mass) == (1, 1, 0)
    assert (b1.n_shingles, b1.n_postings, b1.pair_mass) == (1, 3, 3)
    assert b1.df_min == 2 and b1.cut_bucket == 0
    assert (b6.df_min, b6.pair_mass, b6.cut_bucket) == (64, 5050, 1)
    total = 3 + 5050
    assert b1.pair_share_ppm == 3 * 1_000_000 // total
    assert b6.pair_share_ppm == 5050 * 1_000_000 // total


def test_fulfillment_latency_rank_percentiles(spark, tmp_path):
    base = datetime.date(2024, 3, 1)
    orders, lines = [], []
    for k, days in enumerate([1, 2, 3, 4, 100], start=1):
        orders.append(Row(o_orderkey=k, o_custkey=1, o_orderstatus="F",
                          o_totalprice=10.0, o_orderdate=base,
                          o_orderpriority="1-URGENT"))
        lines.append(Row(l_orderkey=k, l_partkey=1, l_suppkey=1,
                         l_linenumber=1, l_quantity=1.0,
                         l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                         l_returnflag="N", l_linestatus="O",
                         l_shipdate=base + datetime.timedelta(days=days)))
    orders.append(Row(o_orderkey=9, o_custkey=1, o_orderstatus="F",
                      o_totalprice=10.0, o_orderdate=base,
                      o_orderpriority="2-HIGH"))
    lines.append(Row(l_orderkey=9, l_partkey=1, l_suppkey=1,
                     l_linenumber=1, l_quantity=1.0, l_extendedprice=1.0,
                     l_discount=0.0, l_tax=0.0, l_returnflag="N",
                     l_linestatus="O",
                     l_shipdate=base + datetime.timedelta(days=7)))
    _write(spark, tmp_path, "orders", orders)
    _write(spark, tmp_path, "lineitem", lines)
    out = {r.o_orderpriority: r for r in
           q_orders_fulfillment_latency(spark, str(tmp_path)).collect()}
    u = out["1-URGENT"]
    # ranks over [1,2,3,4,100]: r50 = (5+1)//2 = 3 -> 3; r90 = 4 -> 4
    assert (u.n, u.min_days, u.p50_days, u.p90_days, u.max_days) == \
        (5, 1, 3, 4, 100)
    h = out["2-HIGH"]  # singleton: both percentile ranks clamp to 1
    assert (h.n, h.p50_days, h.p90_days) == (1, 7, 7)
