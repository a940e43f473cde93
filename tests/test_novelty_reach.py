"""Tests for the round-3 additions: source-priority cross-source
dedup, first-occurrence n-gram novelty, and bounded k-hop reachability
(queries_corpus.py / queries_graph.py)."""

import json

from deja_view_spark import queries_graph as QG
from deja_view_spark.queries_corpus import (
    q_docs_cross_source_dedup,
    q_docs_ngram_novelty,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts: dict[int, str]):
    rows = [(i, t, "en", "src0", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# ------------------------------------------------ cross-source dedup
def test_cross_source_priority_policy(spark, tmp_path):
    """doc 0 is re-ingested as both mirror (23|0) and curated (69|0):
    the curated copy must win. doc 23 gets only a mirror copy: the
    ORIGINAL wins (priority 1 beats mirror's 2). doc 5 has no replica
    and must not be reported."""
    sf = _write_docs(
        spark,
        tmp_path,
        {0: "alpha beta gamma", 23: "delta epsilon", 5: "zeta eta"},
    )
    out = {
        r.kept_doc_id: r
        for r in q_docs_cross_source_dedup(spark, sf).collect()
    }
    assert len(out) == 2
    curated_winner = out[30_000_000]  # doc 0's curated replica id
    assert curated_winner.kept_source == "curated"
    assert curated_winner.n_copies == 3
    assert curated_winner.n_sources == 3
    assert curated_winner.freed_chars == 2 * len("alpha beta gamma")
    orig_winner = out[23]
    assert orig_winner.kept_source == "src0"
    assert orig_winner.n_copies == 2
    assert orig_winner.freed_chars == len("delta epsilon")


# --------------------------------------------------- n-gram novelty
def test_novelty_first_occurrence_semantics(spark, tmp_path):
    """doc 1 contributes both of its 3-grams first (novelty 1.0);
    doc 2 shares one with doc 1 (0.5); doc 3 repeats doc 1 verbatim
    (0.0); a doc under 3 tokens is excluded."""
    sf = _write_docs(
        spark,
        tmp_path,
        {
            1: "a b c d",
            2: "a b c x",
            3: "a b c d",
            4: "too short",
        },
    )
    out = {r.doc_id: r for r in q_docs_ngram_novelty(spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_ngrams == 2 and out[1].novelty_frac == 1.0
    assert out[2].n_ngrams == 2 and out[2].novelty_frac == 0.5
    assert out[3].n_ngrams == 2 and out[3].novelty_frac == 0.0


def test_novelty_within_doc_repeats_counted_once(spark, tmp_path):
    """A doc repeating its own 3-gram ('a b c' twice in 'a b c a b c')
    counts it ONCE in n_ngrams (in-row array_distinct), so novelty is
    a fraction of distinct grams."""
    sf = _write_docs(spark, tmp_path, {1: "a b c a b c"})
    row = q_docs_ngram_novelty(spark, sf).collect()[0]
    # grams: 'a b c' x2, 'b c a', 'c a b' -> 3 distinct, all first here
    assert row.n_ngrams == 3
    assert row.novelty_frac == 1.0


# ------------------------------------------------ k-hop reachability
def test_reach_k_matches_python_bfs(spark):
    """Semi-naive Spark BFS equals a pure-Python BFS (min-distance,
    self excluded) over the same co-engagement chain edges at sf0.001."""
    from deja_view_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select("props", "user_id").toPandas()
    ev["item"] = ev["props"].map(lambda s: json.loads(s)["k"])
    edges = set()
    for _, grp in ev.groupby("item"):
        us = sorted(set(grp["user_id"]))
        for a, b in zip(us, us[1:]):
            if a != b:
                edges.add((a, b))
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)

    def bfs(u):
        dist = {u: 0}
        frontier = [u]
        for d in range(1, QG.REACH_K + 1):
            nxt = []
            for x in frontier:
                for y in adj.get(x, []):
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        reach = {v for v, d in dist.items() if v != u}
        ring = {v for v, d in dist.items() if v != u and d == QG.REACH_K}
        return len(reach), len(ring)

    # NOTE: python dist[] records FIRST discovery only, so a node first
    # seen at d<K never re-enters; same min-distance semantics as the
    # engine's anti-join frontier. But a cycle returning to u itself is
    # recorded at d=0 in python and excluded; the engine excludes
    # src==dst pairs explicitly — same outcome.
    out = {r.node: r for r in QG.q_events_reach_k(spark, SF).collect()}
    srcs = {a for a, _ in edges}
    assert set(out) == srcs
    for u in srcs:
        n_reach, n_ring = bfs(u)
        assert out[u].n_reach == n_reach, u
        assert out[u].n_ring_k == n_ring, u


def test_harmonic_matches_python_bfs(spark):
    """Truncated harmonic centrality equals the python BFS distance
    histogram folded through n1/1 + ... + nK/K."""
    from deja_view_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select("props", "user_id").toPandas()
    ev["item"] = ev["props"].map(lambda s: json.loads(s)["k"])
    edges = set()
    for _, grp in ev.groupby("item"):
        us = sorted(set(grp["user_id"]))
        for a, b in zip(us, us[1:]):
            if a != b:
                edges.add((a, b))
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)

    out = {r.node: r for r in QG.q_events_harmonic_k(spark, SF).collect()}
    srcs = {a for a, _ in edges}
    assert set(out) == srcs
    for u in srcs:
        dist = {u: 0}
        frontier = [u]
        for d in range(1, QG.REACH_K + 1):
            nxt = []
            for x in frontier:
                for y in adj.get(x, []):
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        hist = [0] * (QG.REACH_K + 1)
        for v, d in dist.items():
            if v != u:
                hist[d] += 1
        want = sum(hist[d] / d for d in range(1, QG.REACH_K + 1))
        got = out[u]
        for d in range(1, QG.REACH_K + 1):
            assert getattr(got, f"n_d{d}") == hist[d], (u, d)
        assert abs(got.harmonic - round(want, 4)) < 1e-9, u


# ------------------------------------------------ containment pairs
def test_containment_catches_excerpt_jaccard_misses(spark, tmp_path):
    """A 40-token excerpt planted from a 100-token original (doc 0 ->
    40,000,000) scores containment 1.0 while its Jaccard stays far
    below the dedup threshold — the asymmetric-overlap case."""
    from deja_view_spark.queries_text import q_docs_containment_pairs

    long_text = " ".join(f"w{i}" for i in range(100))
    sf = _write_docs(
        spark,
        tmp_path,
        {0: long_text, 1: " ".join(f"z{i}" for i in range(50))},
    )
    out = q_docs_containment_pairs(spark, sf).collect()
    pairs = {(r.src_doc, r.dst_doc): r for r in out}
    assert set(pairs) == {(0, 40_000_000)}
    r = pairs[(0, 40_000_000)]
    assert r.containment == 1.0
    # 38 excerpt shingles vs 98 original: J = 38/98
    assert r.jaccard < 0.5


# ------------------------------------------------------------ k-core
def test_kcore_matches_python_peeling(spark):
    """events_kcore == python peel-to-fixpoint, and the fixed
    KCORE_ROUNDS budget is enough: the python peel converges in fewer
    rounds on this corpus (asserted), so the engine's fixed-round
    output IS the true k-core."""
    from deja_view_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select("props", "user_id").toPandas()
    ev["item"] = ev["props"].map(lambda s: json.loads(s)["k"])
    und = set()
    for _, grp in ev.groupby("item"):
        us = sorted(set(grp["user_id"]))
        for a, b in zip(us, us[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))

    edges = set(und)
    rounds_used = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= QG.KCORE_K}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
        rounds_used += 1
    assert rounds_used <= QG.KCORE_ROUNDS, rounds_used
    want: dict[int, int] = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1

    out = {r.node: r.core_deg for r in QG.q_events_kcore(spark, SF).collect()}
    assert out == want
    assert all(d >= QG.KCORE_K for d in out.values())


def test_novelty_conservation_invariant(spark):
    """Every distinct corpus n-gram has exactly one first-occurrence
    doc, so sum(n_novel) over docs == the corpus's distinct-ngram
    count (computed independently in python)."""
    import re

    from deja_view_spark.queries_corpus import NOVELTY_N
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).toPandas()
    tok = re.compile(r"[a-z0-9_]+")
    grams = set()
    for t in docs["text"]:
        toks = tok.findall(t.lower())
        for i in range(len(toks) - NOVELTY_N + 1):
            grams.add(" ".join(toks[i : i + NOVELTY_N]))
    out = q_docs_ngram_novelty(spark, SF).toPandas()
    assert int(out["n_novel"].sum()) == len(grams)


def test_containment_dominates_jaccard(spark):
    """C(A,B) = c/min >= c/union = J on every emitted pair (min side
    is never larger than the union)."""
    from deja_view_spark.queries_text import q_docs_containment_pairs

    out = q_docs_containment_pairs(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r.containment >= r.jaccard


# ----------------------------------------------------- label propagation
def _lpa_python(und_edges, rounds):
    """Synchronous LPA twin: mode of neighbor labels, min-label ties."""
    from collections import defaultdict

    nbrs = defaultdict(list)
    for a, b in und_edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v, ns in nbrs.items():
            cnt = defaultdict(int)
            for u in ns:
                cnt[lab[u]] += 1
            new[v] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = new
    return lab


def _events_from_edges(spark, tmp_path, name, edges):
    rows = []
    for i, (a, b) in enumerate(edges):
        for u in (a, b):
            rows.append((u, "touch", f'{{"k": {i}}}', "2024-01-01T00:00:00"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, props string, ts string"
    ).selectExpr("user_id", "event_type", "props", "CAST(ts AS timestamp) AS ts")
    d = str(tmp_path / name)
    ev.write.parquet(d + "/events.parquet")
    return d


def test_label_prop_two_cliques(spark, tmp_path):
    """Barbell: two K5s joined by a single bridge edge must resolve to
    two communities (labels 0 and 5 — each clique floods to its min
    node), with the bridge unable to merge them in LPA_ROUNDS."""
    from deja_view_spark.queries_graph import LPA_ROUNDS, q_events_label_prop

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 5, b + 5) for a, b in k5a]
    edges = k5a + k5b + [(4, 5)]
    d = _events_from_edges(spark, tmp_path, "barbell", edges)
    out = {r.node: (r.community, r.comm_size) for r in q_events_label_prop(spark, d).collect()}
    want = _lpa_python(edges, LPA_ROUNDS)
    sizes = {}
    for v, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert out == {v: (c, sizes[c]) for v, c in want.items()}
    assert len(sizes) == 2  # the plant's intent: two communities


def test_label_prop_matches_python_twin_testdata(spark):
    """Full python-twin parity on the sf0.001 co-engagement graph."""
    from deja_view_spark.queries_graph import (
        LPA_ROUNDS,
        _chain_edges,
        q_events_label_prop,
    )

    half = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in _chain_edges(spark, SF).collect()
    }
    want = _lpa_python(sorted(half), LPA_ROUNDS)
    out = {r.node: r.community for r in q_events_label_prop(spark, SF).collect()}
    assert out == want


# ------------------------------------------------- cohort retention
def test_cohort_retention_matches_python_twin(spark, tmp_path):
    """Planted three-cohort corpus: the matrix must show each cohort
    at its own start week, correct offset counts, and retention 1.0 at
    offset 0 — plus full python-twin parity on the sf0.001 corpus."""
    from collections import defaultdict
    from datetime import date, timedelta

    from deja_view_spark.queries_events import q_events_cohort_retention
    from deja_view_spark.sources.catalog import load_table

    # planted: users 1,2 start wk0 (user 2 churns), user 3 starts wk1
    rows = []
    mon = date(2024, 1, 1)  # a Monday
    for uid, week_offsets in ((1, [0, 1, 2]), (2, [0]), (3, [1, 2])):
        for wo in week_offsets:
            d = mon + timedelta(weeks=wo, days=2)
            rows.append((uid * 10 + wo, f"{d}T10:00:00", uid, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS timestamp) AS ts", "user_id",
        "event_type", "value", "props",
    )
    d = str(tmp_path / "cohort")
    ev.write.parquet(d + "/events.parquet")
    out = {
        (r.cohort_week, r.offset): (r.n_users, r.cohort_size, r.retention)
        for r in q_events_cohort_retention(spark, d).collect()
    }
    wk0, wk1 = str(mon), str(mon + timedelta(weeks=1))
    assert out == {
        (wk0, 0): (2, 2, 1.0),
        (wk0, 1): (1, 2, 0.5),
        (wk0, 2): (1, 2, 0.5),
        (wk1, 0): (1, 1, 1.0),
        (wk1, 1): (1, 1, 1.0),
    }

    # python-twin parity on testdata
    ev2 = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "CAST(date_trunc('week', ts) AS DATE) AS wk")
        .distinct()
        .toPandas()
    )
    first = {}
    weeks = defaultdict(set)
    for uid, wk in zip(ev2["user_id"], ev2["wk"]):
        weeks[int(uid)].add(wk)
        first[int(uid)] = min(first.get(int(uid), wk), wk)
    mat = defaultdict(set)
    for uid, wks in weeks.items():
        for wk in wks:
            mat[(str(first[uid]), (wk - first[uid]).days // 7)].add(uid)
    want = {}
    for (cwk, off), users in mat.items():
        base = len(mat[(cwk, 0)])
        want[(cwk, off)] = (len(users), base, round(len(users) / base, 4))
    got = {
        (r.cohort_week, r.offset): (r.n_users, r.cohort_size, r.retention)
        for r in q_events_cohort_retention(spark, SF).collect()
    }
    assert got == want


# --------------------------------------------- personalized PageRank
def test_ppr_python_twin_and_seedless_component_is_zero(spark, tmp_path):
    """Exact integer-twin parity on the sf0.001 graph, plus the
    defining PPR property on a planted graph: a connected component
    containing NO seed receives zero mass (no teleport, no inflow),
    while the seeded component's mass concentrates near its seeds."""
    from collections import defaultdict

    from deja_view_spark.queries_graph import (
        DAMP_DEN,
        DAMP_NUM,
        ITERS,
        PPR_SEED_MOD,
        SCALE,
        _chain_edges,
        q_events_ppr,
    )

    def ppr_python(edges):
        nodes = sorted({v for e in edges for v in e})
        out = defaultdict(list)
        for s, d in edges:
            out[s].append(d)
        seeds = [v for v in nodes if v % PPR_SEED_MOD == 0]
        ns = len(seeds)
        rank = {
            v: (SCALE // ns if v % PPR_SEED_MOD == 0 else 0) for v in nodes
        }
        for _ in range(ITERS):
            sums = defaultdict(int)
            for s, ds in out.items():
                per = rank[s] * DAMP_NUM // (DAMP_DEN * len(ds))
                for d in ds:
                    sums[d] += per
            rank = {
                v: (
                    (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * ns)
                    if v % PPR_SEED_MOD == 0
                    else 0
                )
                + sums.get(v, 0)
                for v in nodes
            }
        return rank

    # twin parity on the real testdata graph
    edges = [(r.src, r.dst) for r in _chain_edges(spark, SF).collect()]
    want = ppr_python(edges)
    got = {r.node: r.rank for r in q_events_ppr(spark, SF).collect()}
    assert got == want

    # planted (note: _chain_edges derives ascending-id edges, so the
    # graph is a DAG and mass only flows to HIGHER ids): component A =
    # chain 7 -> 8 -> 9 downstream of seed 7; component B = seedless
    # chain 3 -> 4 -> 5 — zero mass everywhere (no teleport, no
    # seed upstream)
    comp_a = [(7, 8), (8, 9)]
    comp_b = [(3, 4), (4, 5)]
    d = _events_from_edges(spark, tmp_path, "ppr", comp_a + comp_b)
    out = {r.node: (r.is_seed, r.rank) for r in q_events_ppr(spark, d).collect()}
    assert out[7][0] and out[7][1] > 0
    assert all(out[v][1] > 0 for v in (8, 9))  # downstream of the seed
    assert all(out[v] == (False, 0) for v in (3, 4, 5))


# ------------------------------------------------ sweep-line concurrency
def test_peak_concurrency_planted_and_twin(spark, tmp_path):
    """Planted: three users whose sessions overlap pairwise then
    triply -> peak 3 at the third session's start; a cross-midnight
    session must contribute to BOTH days. Plus python sweep twin on
    the sf0.001 corpus."""
    from collections import defaultdict

    from deja_view_spark.queries_events import q_events_peak_concurrency
    from deja_view_spark.sources.catalog import load_table

    rows = []
    eid = 0

    def ev(uid, iso):
        nonlocal eid
        eid += 1
        return (eid, iso, uid, "click", 1.0, "{}")

    # day 1: u1 session [09:00, 09:25+1s) (25m gap < 30m), u2 session
    # [09:05, 09:24+1s), u3 instant session at 09:10 -> at 09:10 all
    # three run: peak 3 at 09:10
    rows += [ev(1, "2024-03-01T09:00:00"), ev(1, "2024-03-01T09:25:00")]
    rows += [ev(2, "2024-03-01T09:05:00"), ev(2, "2024-03-01T09:24:00")]
    rows += [ev(3, "2024-03-01T09:10:00")]
    # u4: session crossing midnight (23:50 + event 00:10 next day)
    rows += [ev(4, "2024-03-02T23:50:00"), ev(4, "2024-03-03T00:10:00")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS timestamp) AS ts", "user_id",
        "event_type", "value", "props",
    )
    d = str(tmp_path / "conc")
    df.write.parquet(d + "/events.parquet")
    out = {
        r.day: (r.peak_concurrency, r.peak_sec, r.n_sessions)
        for r in q_events_peak_concurrency(spark, d).collect()
    }
    import datetime as dt

    t3 = int(dt.datetime(2024, 3, 1, 9, 10, tzinfo=dt.timezone.utc).timestamp())
    assert out["2024-03-01"][0] == 3 and out["2024-03-01"][1] == t3
    assert out["2024-03-01"][2] == 3
    # the cross-midnight session appears on both days
    assert out["2024-03-02"] == (1, int(dt.datetime(2024, 3, 2, 23, 50, tzinfo=dt.timezone.utc).timestamp()), 1)
    assert out["2024-03-03"][0] == 1 and out["2024-03-03"][2] == 1

    # python sweep twin on testdata
    ev2 = (
        load_table(spark, SF, "events")
        .selectExpr(
            "user_id", "event_id",
            "CAST(CAST(ts AS timestamp) AS long) AS sec",
            "unix_micros(CAST(ts AS timestamp)) AS usec",
        )
        .toPandas()
    )
    by_user = defaultdict(list)
    for uid, eid2, sec, usec in zip(
        ev2["user_id"], ev2["event_id"], ev2["sec"], ev2["usec"]
    ):
        by_user[int(uid)].append((int(usec), int(eid2), int(sec)))
    sessions = []
    for uid, evs in by_user.items():
        evs.sort()
        cur = [evs[0][2]]
        for (pu, pe, ps), (u, e, s) in zip(evs, evs[1:]):
            if s - ps > 1800:
                sessions.append((min(cur), max(cur) + 1))
                cur = [s]
            else:
                cur.append(s)
        sessions.append((min(cur), max(cur) + 1))
    deltas = defaultdict(list)
    for s, e in sessions:
        d0, d1 = s - s % 86400, (e - 1) - (e - 1) % 86400
        for day in range(d0, d1 + 1, 86400):
            deltas[day].append((max(s, day), 1))
            deltas[day].append((min(e, day + 86400), -1))
    want = {}
    for day, ds in deltas.items():
        ds.sort()
        conc = peak = 0
        peak_t = None
        for t, dd in ds:
            conc += dd
            if conc > peak:
                peak, peak_t = conc, t
        import datetime as dt2

        day_str = str(
            dt2.datetime.fromtimestamp(day, dt2.timezone.utc).date()
        )
        want[day_str] = (peak, peak_t, len(ds) // 2)
    got = {
        r.day: (r.peak_concurrency, r.peak_sec, r.n_sessions)
        for r in q_events_peak_concurrency(spark, SF).collect()
    }
    assert got == want


# --------------------------------------------------- bitmap audience
def test_bitmap_audience_equals_set_math(spark):
    """Bitmaps are exact: every pairwise (n_a, n_b, n_both, n_either,
    jaccard) must equal plain python set arithmetic over the same
    (event_type, user_id) pairs."""
    from collections import defaultdict

    from deja_view_spark.queries_events import q_events_bitmap_audience
    from deja_view_spark.sources.catalog import load_table

    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "user_id")
        .distinct()
        .toPandas()
    )
    segs = defaultdict(set)
    for t, u in zip(ev["event_type"], ev["user_id"]):
        segs[t].add(int(u))
    want = {}
    names = sorted(segs)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            nb = len(segs[a] & segs[b])
            ne = len(segs[a] | segs[b])
            want[(a, b)] = (
                len(segs[a]),
                len(segs[b]),
                nb,
                ne,
                round(nb / ne, 4),
            )
    got = {
        (r.seg_a, r.seg_b): (r.n_a, r.n_b, r.n_both, r.n_either, r.jaccard)
        for r in q_events_bitmap_audience(spark, SF).collect()
    }
    assert got == want


# ------------------------------------------------------- SCD-2 history
def test_scd2_history_matches_python_twin(spark):
    """Interval invariants + full python-twin parity: versions are
    1..k per user, consecutive states differ, valid_to chains to the
    next valid_from (NULL on the open interval), n_events sums to the
    user's event count."""
    from collections import defaultdict

    from deja_view_spark.queries_events import q_events_scd2_history
    from deja_view_spark.sources.catalog import load_table

    ev = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "event_id", "ts", "event_type")
        .toPandas()
    )
    by_user = defaultdict(list)
    for u, e, t, et in zip(
        ev["user_id"], ev["event_id"], ev["ts"], ev["event_type"]
    ):
        by_user[int(u)].append((t, int(e), et))
    want = []
    for u, evs in sorted(by_user.items()):
        evs.sort(key=lambda x: (x[0], x[1]))
        runs = []
        for t, e, et in evs:
            if runs and runs[-1][0] == et:
                runs[-1][2] += 1
            else:
                runs.append([et, t, 1])
        for i, (et, t0, n) in enumerate(runs):
            vto = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((u, i + 1, et, t0, vto, n))
    out = [
        (r.user_id, r.version, r.state, r.valid_from, r.valid_to, r.n_events)
        for r in q_events_scd2_history(spark, SF).collect()
    ]
    assert out == want
    for u, evs in by_user.items():
        rows = [r for r in out if r[0] == u]
        assert [r[1] for r in rows] == list(range(1, len(rows) + 1))
        assert all(a[2] != b[2] for a, b in zip(rows, rows[1:]))
        assert sum(r[5] for r in rows) == len(evs)
        assert rows[-1][4] is None
