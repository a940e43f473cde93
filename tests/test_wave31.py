"""Wave-31: r x c chi-square independence, partition advisor."""

import collections
import math

import duckdb
import pytest

from deja_view_spark.queries_relational import (
    ADVISOR_FILE_BYTES,
    ADVISOR_PARTITION_BYTES,
    ADVISOR_ROW_OVERHEAD,
    q_docs_partition_advisor,
)
from deja_view_spark.queries_stats import q_docs_src_lang_independence

SF = "/root/testdata/sf0.001"


def test_independence_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT source, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    cells = collections.Counter(rows)
    row_m = collections.Counter(s for s, _l in rows)
    col_m = collections.Counter(l for _s, l in rows)
    n = len(rows)
    chi2 = sum(
        (o * n - row_m[s] * col_m[l]) ** 2 / (row_m[s] * col_m[l] * n) / n
        for (s, l), o in cells.items()
    )
    r = q_docs_src_lang_independence(spark, SF).collect()[0]
    assert (r.n_docs, r.r_dims, r.c_dims) == (n, len(row_m), len(col_m))
    assert r.dof == (len(row_m) - 1) * (len(col_m) - 1)
    assert r.chi2 == pytest.approx(chi2, abs=1e-3)
    assert r.chi2 >= 0.0


def test_independence_closed_form():
    # perfectly independent table -> chi2 == 0
    cells = {(s, l): 10 for s in "ab" for l in "xyz"}
    n = sum(cells.values())
    row_m = collections.Counter()
    col_m = collections.Counter()
    for (s, l), o in cells.items():
        row_m[s] += o
        col_m[l] += o
    chi2 = sum(
        (o * n - row_m[s] * col_m[l]) ** 2 / (row_m[s] * col_m[l] * n) / n
        for (s, l), o in cells.items()
    )
    assert chi2 == pytest.approx(0.0, abs=1e-12)


def test_partition_advisor_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT length(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    n = len(rows)
    text_bytes = sum(x for (x,) in rows)
    est = text_bytes + n * ADVISOR_ROW_OVERHEAD
    r = q_docs_partition_advisor(spark, SF).collect()[0]
    assert (r.n_rows, r.text_bytes, r.est_bytes) == (n, text_bytes, est)
    assert r.rec_shuffle_partitions == math.ceil(
        est / ADVISOR_PARTITION_BYTES
    )
    assert r.rec_output_files == math.ceil(est / ADVISOR_FILE_BYTES)
    assert r.avg_row_bytes == est // n
    # never recommend zero
    assert r.rec_shuffle_partitions >= 1 and r.rec_output_files >= 1
