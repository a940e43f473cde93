"""Wave-21: skip-gram (center, context) pair census over the random
walks — DeepWalk step 2."""

import collections

from deja_view_spark.queries_graph import (
    SG_WINDOW,
    WALK_STEPS,
    q_events_random_walks,
    q_events_skipgram_pairs,
)

SF = "/root/testdata/sf0.001"


def _pairs_py(walks):
    want: dict = collections.defaultdict(int)
    for row in walks:
        steps = [row[f"step{t}"] for t in range(WALK_STEPS + 1)]
        for i, c in enumerate(steps):
            if c is None:
                continue
            for j in range(
                max(0, i - SG_WINDOW), min(len(steps), i + SG_WINDOW + 1)
            ):
                ctx = steps[j]
                if j != i and ctx is not None:
                    want[(c, ctx)] += 1
    return want


def test_skipgram_matches_python(spark):
    walks = [r.asDict() for r in q_events_random_walks(spark, SF).collect()]
    want = _pairs_py(walks)
    got = q_events_skipgram_pairs(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.n_pairs == want[(r.center, r.context)]
    # presentation order: count desc, then (center, context) asc
    keys = [(-r.n_pairs, r.center, r.context) for r in got]
    assert keys == sorted(keys)


def test_skipgram_symmetry(spark):
    """|i-j| is symmetric, so the pair census must be too: every
    (a, b) count equals its (b, a) count."""
    got = {
        (r.center, r.context): r.n_pairs
        for r in q_events_skipgram_pairs(spark, SF).collect()
    }
    assert got  # non-degenerate
    for (a, b), n in got.items():
        assert got[(b, a)] == n


def test_skipgram_mass_bound(spark):
    """Each walk of k non-null steps emits at most 2*W*k directed
    pairs; total census mass respects that bound and every center is
    a node that appears on some walk."""
    walks = [r.asDict() for r in q_events_random_walks(spark, SF).collect()]
    nodes = set()
    cap = 0
    for row in walks:
        steps = [
            row[f"step{t}"]
            for t in range(WALK_STEPS + 1)
            if row[f"step{t}"] is not None
        ]
        nodes.update(steps)
        cap += 2 * SG_WINDOW * len(steps)
    got = q_events_skipgram_pairs(spark, SF).collect()
    assert sum(r.n_pairs for r in got) <= cap
    assert {r.center for r in got} <= nodes
