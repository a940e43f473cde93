"""Wave-24 operators: k-anonymity audit, data-contract expectations."""

import collections

import duckdb

from deja_view_spark.queries_quality import (
    EXPECT_LANGS,
    K_ANON_FLOOR,
    q_docs_expectations,
    q_docs_k_anonymity,
)

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, lang, source, n_chars, length(text) "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_k_anonymity_matches_python(spark):
    classes = collections.Counter(
        (lang, source, n // 100) for _i, lang, source, n, _l in _docs()
    )
    bands: dict = collections.defaultdict(lambda: [0, 0, 10**9])
    for size in classes.values():
        band = (
            "1 (unique)"
            if size == 1
            else (f"2-{K_ANON_FLOOR - 1}" if size < K_ANON_FLOOR
                  else f">={K_ANON_FLOOR}")
        )
        b = bands[band]
        b[0] += 1
        b[1] += size
        b[2] = min(b[2], size)
    got = q_docs_k_anonymity(spark, SF).collect()
    assert {r.size_band for r in got} == set(bands)
    for r in got:
        n_classes, n_rows, min_size = bands[r.size_band]
        assert (r.n_classes, r.n_rows) == (n_classes, n_rows)
        assert r.k_anonymous == (min_size >= K_ANON_FLOOR)
    # rows partition the corpus
    assert sum(r.n_rows for r in got) == len(_docs())


def test_expectations_pass_on_driver_corpus(spark):
    """The driver corpus satisfies its own contract — every rule
    passes with zero violations (this is exactly what the rest of the
    engine assumes, e.g. n_chars == length(text) for every
    length-based operator)."""
    rows = _docs()
    got = {r.rule: r for r in q_docs_expectations(spark, SF).collect()}
    assert set(got) == {
        "doc_id_not_null", "doc_id_unique", "lang_accepted_values",
        "n_chars_positive", "n_chars_matches_text",
    }
    for r in got.values():
        assert r.n_rows == len(rows)
        assert r.n_violations == 0 and bool(r.passed)
    # independent python re-check of the two non-trivial rules
    ids = [i for i, *_ in rows]
    assert len(ids) == len(set(ids))
    assert all(lang in EXPECT_LANGS for _i, lang, *_ in rows)
    assert all(n == ln for *_x, n, ln in rows)


def test_expectations_detect_planted_violations():
    """The rule EXPRESSIONS flag bad rows (pure python twin over a
    poisoned micro-corpus — the engine query itself is append-only
    over sf dirs, so the expressions are what must be right)."""
    rows = [
        (1, "en", "a", 5, 5),
        (1, "xx", "a", 0, 3),   # duplicate id, bad lang, bad range,
                                # inconsistent length
        (None, "de", "b", 2, 2),  # null id
    ]
    ids = [i for i, *_ in rows]
    assert sum(1 for i in ids if i is None) == 1
    nonnull = [i for i in ids if i is not None]
    assert len(nonnull) - len(set(nonnull)) == 1
    assert sum(1 for _i, lang, *_ in rows if lang not in EXPECT_LANGS) == 1
    assert sum(1 for *_x, n, _l in rows if n <= 0) == 1
    assert sum(1 for *_x, n, ln in rows if n != ln) == 1
