"""Wave-29: top event paths, PMI collocations."""

import collections
import math
import re

import duckdb

from deja_view_spark.queries_sequence import (
    PATH_LEN,
    PATH_TOP_K,
    q_events_top_paths,
)
from deja_view_spark.queries_text import (
    PMI_MIN_PAIRS,
    PMI_VOCAB_K,
    TOKEN_RE,
    q_docs_term_pmi,
)

SF = "/root/testdata/sf0.001"


def test_top_paths_match_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by_user: dict = collections.defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    counts = collections.Counter()
    for evs in by_user.values():
        evs.sort()
        counts[" > ".join(et for _t, _e, et in evs[:PATH_LEN])] += 1
    want = sorted(
        counts.items(), key=lambda t: (-t[1], t[0])
    )[:PATH_TOP_K]
    got = [(r.path, r.n_users) for r in q_events_top_paths(spark, SF).collect()]
    assert got == want
    # paths have at most PATH_LEN stages
    assert all(p.count(" > ") <= PATH_LEN - 1 for p, _n in got)


def test_term_pmi_matches_python(spark):
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    tok = re.compile(TOKEN_RE)
    doc_terms = {
        did: set(tok.findall(text.lower())) for did, text in docs
    }
    census = collections.Counter(
        t for ts in doc_terms.values() for t in ts
    )
    vocab = dict(
        sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:PMI_VOCAB_K]
    )
    n = len(docs)
    pair_counts = collections.Counter()
    for ts in doc_terms.values():
        hits = sorted(t for t in ts if t in vocab)
        for i, x in enumerate(hits):
            for y in hits[i + 1:]:
                pair_counts[(x, y)] += 1
    scored = []
    for (x, y), c_xy in pair_counts.items():
        if c_xy < PMI_MIN_PAIRS:
            continue
        if c_xy == n:  # universal pair: npmi limit is 1
            npmi = 1.0
        else:
            npmi = math.log(
                n * c_xy / (vocab[x] * vocab[y])
            ) / math.log(n / c_xy)
        scored.append(
            (int(round(npmi * 1_000_000)), x, y, c_xy, vocab[x], vocab[y])
        )
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:50]
    got = q_docs_term_pmi(spark, SF).collect()
    assert len(got) == len(want)
    for r, (ppm, x, y, c_xy, c_x, c_y) in zip(got, want):
        assert (r.x, r.y, r.c_xy, r.c_x, r.c_y) == (x, y, c_xy, c_x, c_y)
        # engines round half-up, python banker's: allow 1 ppm
        assert abs(r.npmi_ppm - ppm) <= 1
    # npmi is bounded in [-1, 1]
    assert all(-1_000_000 <= r.npmi_ppm <= 1_000_000 for r in got)
