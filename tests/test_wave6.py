"""Community modularity, degree assortativity, and Fellegi-Sunter
record linkage (queries_graph.py, queries_linkage.py).

Planted-graph oracles: two disjoint triangles have a closed-form
modularity (0.25 per community) and a zero-variance degree
distribution (assortativity NULL); a star graph has assortativity
exactly -1. Linkage is checked against hand-scored planted records
plus pure-Python model invariants (the registry queries' DuckDB
value-hash parity is the driver's job)."""

import math
from datetime import datetime

from deja_view_spark.queries_graph import (
    q_events_assortativity,
    q_events_modularity,
    q_events_temporal_reach,
)
from deja_view_spark.queries_linkage import (
    MATCH_T,
    POSSIBLE_T,
    _score_case_sql,
    _weights,
    q_docs_blocking_quality,
    q_docs_record_linkage,
    q_docs_record_linkage_multi,
)

SF = "/root/testdata/sf0.001"


def _events_from_items(spark, tmp_path, items):
    """events.parquet where item i is touched by the given user set —
    chain edges come out as consecutive sorted-user pairs."""
    rows = []
    eid = 0
    for item, users in items:
        for u in users:
            rows.append(
                (eid, datetime(2024, 1, 1), u, "view", 1.0, '{"k": %d}' % item)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ev")
    df.write.parquet(d + "/events.parquet")
    return d


# ------------------------------------------------------------ modularity
def test_modularity_two_triangles(spark, tmp_path):
    """Two disjoint triangles: LPA converges to one community per
    triangle; each contributes Q_c = 3/6 - (6/12)^2 = 0.25."""
    items = [(i, us) for i, us in enumerate(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    )]
    d = _events_from_items(spark, tmp_path, items)
    rows = q_events_modularity(spark, d).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_nodes == 3
        assert r.intra_edges == 3
        assert r.deg_sum == 6
        assert r.q_contrib == 0.25


def test_modularity_consistent_with_assortativity_graph(spark):
    """Cross-query graph-identity invariants at sf0.001: community
    node counts partition the node set and degree sums add to 2m."""
    mod = q_events_modularity(spark, SF).collect()
    ast = q_events_assortativity(spark, SF).collect()[0]
    assert sum(r.n_nodes for r in mod) == ast.n_nodes
    assert sum(r.deg_sum for r in mod) == 2 * ast.n_edges
    assert sum(r.intra_edges for r in mod) <= ast.n_edges
    for r in mod:
        # e_c/m <= 1 and (d_c/2m)^2 >= 0 bound every contribution
        assert -0.25 <= r.q_contrib <= 1.0


# -------------------------------------------------------- assortativity
def test_assortativity_star_is_minus_one(spark, tmp_path):
    """Star K_{1,4}: every edge joins deg-4 hub to deg-1 leaf — the
    endpoint-degree correlation is exactly -1."""
    d = _events_from_items(
        spark, tmp_path, [(i, (0, i)) for i in (1, 2, 3, 4)]
    )
    row = q_events_assortativity(spark, d).collect()[0]
    assert row.n_edges == 4
    assert row.n_nodes == 5
    assert row.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    """Two triangles = 2-regular graph: zero degree variance, the
    NULLIF guard yields NULL instead of a division error."""
    d = _events_from_items(
        spark, tmp_path,
        [(i, us) for i, us in enumerate(
            [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
        )],
    )
    row = q_events_assortativity(spark, d).collect()[0]
    assert row.n_edges == 6
    assert row.assortativity is None


# ------------------------------------------------------- record linkage
def test_fs_weights_sign_and_monotonicity():
    """Agreement weight positive, disagreement negative, for every
    field (m > u by construction); flipping any gamma 0->1 raises the
    packed-CASE score."""
    w = _weights()
    for agree, disagree in w.values():
        assert agree > 0 > disagree
    score_sql, _ = _score_case_sql()
    # reconstruct the 8 literals straight from the generator
    combo = {
        bits: round(
            sum(
                w[f][0] if (bits >> s) & 1 else w[f][1]
                for f, s in (("lang", 2), ("len", 1), ("tok", 0))
            ),
            4,
        )
        for bits in range(8)
    }
    for bits in range(8):
        for s in range(3):
            if not (bits >> s) & 1:
                assert combo[bits | (1 << s)] > combo[bits]
        assert repr(combo[bits]) in score_sql


def test_record_linkage_planted_decisions(spark, tmp_path):
    """Hand-scored planted pairs: full agreement -> match; same block
    but different lang/length/tokens -> non-match; different block ->
    no candidate pair at all."""
    common = "alpha beta gamma delta"
    near = common + " " + " ".join(f"tok{i}" for i in range(30))
    far = common + " " + " ".join(f"zzz{i}" for i in range(300))
    other = "omega psi chi phi " + " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, near, "en", "a", len(near)),
        (2, near + " tail", "en", "a", len(near) + 5),
        (3, far, "de", "a", len(far)),
        (4, other, "en", "a", len(other)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    got = {
        (r.src_doc, r.dst_doc): r
        for r in q_docs_record_linkage(spark, d).collect()
    }
    # docs 1,2,3 share the block; 4 does not pair with anyone
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    full = got[(1, 2)]
    assert (full.g_lang, full.g_len, full.g_tok) == (1, 1, 1)
    assert full.decision == "match" and full.fs_score >= MATCH_T
    cold = got[(1, 3)]
    assert (cold.g_lang, cold.g_len, cold.g_tok) == (0, 0, 0)
    assert cold.decision == "non-match" and cold.fs_score < POSSIBLE_T
    # the audit estimate is a probability
    assert 0.0 <= full.u_lang_hat <= 1.0


def test_blocking_quality_planted(spark, tmp_path):
    """On the linkage planted corpus the numbers are closed-form AND
    demonstrate the metric catching a blocking miss: the Jaccard truth
    has 3 pairs — (1,2) plus (1,4)/(2,4) via the shared tok0..29 body —
    but doc 4 opens with a different prefix, so blocking co-blocks only
    (1,2): PC = 1/3. One kept 3-doc block -> 3 candidates of 6 possible
    (RR = 0.5); nothing over the cap."""
    common = "alpha beta gamma delta"
    near = common + " " + " ".join(f"tok{i}" for i in range(30))
    far = common + " " + " ".join(f"zzz{i}" for i in range(300))
    other = "omega psi chi phi " + " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, near, "en", "a", len(near)),
        (2, near + " tail", "en", "a", len(near) + 5),
        (3, far, "de", "a", len(far)),
        (4, other, "en", "a", len(other)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    row = q_docs_blocking_quality(spark, d).collect()[0]
    assert row.n_docs == 4
    assert row.n_true_pairs == 3 and row.n_caught == 1
    assert row.pair_completeness == round(1 / 3, 6)
    assert row.n_cand_pairs == 3 and row.n_blocks_dropped == 0
    assert row.reduction_ratio == 0.5


def test_temporal_reach_respects_edge_times(spark, tmp_path):
    """Time-respecting semantics: an edge that fired BEFORE the seed's
    influence arrived cannot forward it, and edges INTO a seed do not
    make their source reachable. Seeds 13 and 26; edge 13->5 fires at
    t=20; edge 5->11 fired at t=15 (< 20, blocked); edge 9->26 points
    at the seed (9 stays unreached)."""
    def ev(eid, sec, user, item):
        return (
            eid, datetime(2024, 1, 1, 0, 0, sec), user, "view", 1.0,
            '{"k": %d}' % item,
        )
    rows = [
        ev(0, 10, 13, 1), ev(1, 20, 5, 1),   # 13 -> 5 @20
        ev(2, 5, 5, 4), ev(3, 15, 11, 4),    # 5 -> 11 @15 (stale)
        ev(4, 1, 9, 3), ev(5, 30, 26, 3),    # 9 -> 26 @30 (into seed)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ev")
    df.write.parquet(d + "/events.parquet")
    got = {r.node: r for r in q_events_temporal_reach(spark, d).collect()}
    assert set(got) == {5, 13, 26}
    assert got[13].is_seed and got[13].first_reach_us == 0
    assert got[26].is_seed and got[26].first_reach_us == 0
    assert not got[5].is_seed and got[5].first_reach_us > 0


def test_record_linkage_multi_pass_union(spark, tmp_path):
    """The SNM pass rescues a pair the prefix key misses: doc 4 shares
    doc 1's token body (reversed-key block) but not its opening, so
    (1,4) arrives with via_snm=1, via_prefix=0 and full field
    agreement -> match. The prefix-caught pair (1,2) carries both
    provenance flags (same opening AND adjacent in the forward sort)."""
    common = "alpha beta gamma delta"
    near = common + " " + " ".join(f"tok{i}" for i in range(30))
    far = common + " " + " ".join(f"zzz{i}" for i in range(300))
    other = "omega psi chi phi " + " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, near, "en", "a", len(near)),
        (2, near + " tail", "en", "a", len(near) + 5),
        (3, far, "de", "a", len(far)),
        (4, other, "en", "a", len(other)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    got = {
        (r.src_doc, r.dst_doc): r
        for r in q_docs_record_linkage_multi(spark, d).collect()
    }
    rescued = got[(1, 4)]
    assert rescued.via_prefix == 0 and rescued.via_snm == 1
    assert rescued.decision == "match"
    both = got[(1, 2)]
    assert both.via_prefix == 1 and both.via_snm == 1
    assert both.decision == "match"
    # single-pass candidates are a subset of the union
    single = {
        (r.src_doc, r.dst_doc)
        for r in q_docs_record_linkage(spark, d).collect()
    }
    assert single <= set(got)


def test_record_linkage_registry_shape(spark):
    """sf0.001 smoke: ordered canonical pairs, binary gammas, every
    score consistent with its decision thresholds."""
    w = _weights()
    rows = q_docs_record_linkage(spark, SF).collect()
    for r in rows:
        assert r.src_doc < r.dst_doc
        assert r.g_lang in (0, 1) and r.g_len in (0, 1) and r.g_tok in (0, 1)
        expect = round(
            sum(
                w[f][0] if g else w[f][1]
                for f, g in (
                    ("lang", r.g_lang),
                    ("len", r.g_len),
                    ("tok", r.g_tok),
                )
            ),
            4,
        )
        assert math.isclose(r.fs_score, expect)
        if r.fs_score >= MATCH_T:
            assert r.decision == "match"
        elif r.fs_score >= POSSIBLE_T:
            assert r.decision == "possible"
        else:
            assert r.decision == "non-match"
