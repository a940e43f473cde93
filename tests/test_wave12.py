"""Wave-12 operators: FS threshold sweep, score calibration table,
effective diameter via HyperBall rounds."""

import pytest

from deja_view_spark.queries_graph import (
    ED_PCT,
    ED_ROUNDS,
    q_events_effective_diameter,
    q_events_hyperball,
)
from deja_view_spark.queries_linkage import (
    MATCH_T,
    POSSIBLE_T,
    q_docs_linkage_sweep,
    q_docs_record_linkage,
)
from deja_view_spark.queries_text import (
    CAL_BIN_W,
    q_docs_discussion_scores,
    q_docs_score_calibration,
)

SF = "/root/testdata/sf0.001"


def test_linkage_sweep_is_consistent_oc_table(spark):
    sweep = q_docs_linkage_sweep(spark, SF).collect()
    pairs = q_docs_record_linkage(spark, SF).collect()
    assert 0 < len(sweep) <= 8  # one row per realized gamma cell
    # cumulative counts are monotone in the descending-score order and
    # end at the total pair count
    cums = [r.cum_matches_at_threshold for r in sweep]
    assert cums == sorted(cums)
    assert cums[-1] == len(pairs)
    assert sum(r.n_pairs for r in sweep) == len(pairs)
    for r in sweep:
        want = (
            "match"
            if r.fs_score >= MATCH_T
            else ("possible" if r.fs_score >= POSSIBLE_T else "non-match")
        )
        assert r.decision == want


def test_calibration_partitions_corpus(spark):
    cal = q_docs_score_calibration(spark, SF).collect()
    scored = q_docs_discussion_scores(spark, SF).collect()
    assert cal
    assert sum(r.n_docs for r in cal) == len(scored)
    # re-derive every cell from the scored output
    import collections

    want: dict = collections.defaultdict(lambda: [0, 0])
    for s in scored:
        b = int(s.score // CAL_BIN_W)
        want[b][0] += 1
        want[b][1] += 1 if s.doc_id % 3 == 0 else 0
    for r in cal:
        n, c = want[r.score_bin]
        assert (r.n_docs, r.n_closed) == (n, c)
        assert r.closed_rate_ppm == c * 10**6 // n
        assert abs(r.bin_lo - r.score_bin * CAL_BIN_W) < 1e-9


def test_effective_diameter_monotone_and_final(spark):
    rows = {r.t: r for r in q_events_effective_diameter(spark, SF).collect()}
    assert set(rows) == set(range(ED_ROUNDS + 1))
    # the neighborhood function is nondecreasing in t
    ests = [rows[t].n_est for t in range(ED_ROUNDS + 1)]
    assert ests == sorted(ests)
    final = rows[ED_ROUNDS]
    assert final.pct_of_final_ppm == 10**6
    assert final.reaches_effective
    # the flag is exactly the documented predicate
    for t, r in rows.items():
        assert r.reaches_effective == (r.n_est >= ED_PCT * final.n_est)
    # t=0 is the node count (every ball starts as {v}); the sketch at
    # 256 registers should land within a loose envelope of |V|
    hb = q_events_hyperball(spark, SF).collect()
    n_nodes = len(hb)
    assert abs(rows[0].n_est - n_nodes) / n_nodes < 0.25


def test_dedup_method_eval_scoreboard(spark):
    from deja_view_spark.queries import (
        _EVAL_METHODS,
        q_docs_dedup_method_eval,
    )

    rows = {r.method: r for r in q_docs_dedup_method_eval(spark, SF).collect()}
    assert set(rows) == {m for m, _ in _EVAL_METHODS}
    for r in rows.values():
        assert r.n_true <= min(r.n_pairs, r.n_truth)
        assert 0 <= r.precision_ppm <= 10**6
        assert 0 <= r.recall_ppm <= 10**6
        assert r.precision_ppm == r.n_true * 10**6 // r.n_pairs
        assert r.recall_ppm == r.n_true * 10**6 // r.n_truth
    # lossless-by-construction generators: recall exactly 1.0
    assert rows["minhash"].recall_ppm == 10**6
    assert rows["ppjoin"].recall_ppm == 10**6
    # the wide SNM candidate set must dominate every other generator
    assert rows["snm"].n_pairs > max(
        r.n_pairs for m, r in rows.items() if m != "snm"
    )
