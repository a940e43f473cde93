"""Connected components: canonical id = min id per component."""

from deja_view_spark.operators.components import connected_components


def test_two_components_and_isolated(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    verts = spark.createDataFrame([("a",), ("b",), ("c",), ("x",), ("y",), ("z",)],
                                  "id string")
    got = {r.id: r.component
           for r in connected_components(edges, vertices=verts).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_chain_converges(spark):
    # a long path exercises multi-round propagation
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(9)], "src string, dst string"
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {"n0"}
    assert len(got) == 10


# ------------------------------------------- alternating large/small star
from deja_view_spark.operators.components import (  # noqa: E402
    connected_components_alternating,
)


def test_alternating_matches_label_propagation_random(spark):
    """Both algorithms must produce the identical (id, component)
    labeling on a seeded random graph."""
    import random

    rng = random.Random(42)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(350)
    ]
    e = spark.createDataFrame(
        [(f"v{a:03d}", f"v{b:03d}") for a, b in edges], "src string, dst string"
    )
    lp = {
        r.id: r.component
        for r in connected_components(e, max_iter=100).collect()
    }
    alt = {
        r.id: r.component
        for r in connected_components_alternating(e).collect()
    }
    assert alt == lp


def test_alternating_long_chain_beyond_lp_budget(spark):
    """A 300-node path has diameter 299: label propagation inside the
    default 20-round budget CANNOT finish it, the O(log d) alternating
    algorithm must — this is exactly the general-graph case the scale
    path exists for."""
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(299)],
        "src string, dst string",
    )
    got = {
        r.id: r.component
        for r in connected_components_alternating(edges).collect()
    }
    assert len(got) == 300
    assert set(got.values()) == {"n000"}


def test_alternating_two_components_and_isolated(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    verts = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("z",)], "id string"
    )
    got = {
        r.id: r.component
        for r in connected_components_alternating(
            edges, vertices=verts
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}
