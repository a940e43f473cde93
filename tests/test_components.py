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
