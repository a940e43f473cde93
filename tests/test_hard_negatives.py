"""Hard-negative mining (queries_retrieval.py): planted geometry where
every inclusion/exclusion rule has a closed-form answer — the
near-duplicate ceiling drops a cos=0.96 cross-label candidate, the
label filter drops a cos=1.0 same-label twin, and the survivors rank
by exact cosine. DuckDB value-hash parity at sf0.01 is the driver's
job (its brute-force oracle doubles as the LSH recall assertion)."""

import math

from deja_view_spark.queries_retrieval import (
    HN_ANCHOR_MOD,
    HN_K,
    HN_MAX_COS,
    q_embeddings_hard_negatives,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "emb")
    df.write.parquet(d + "/embeddings.parquet")
    return d


def _unit(c):
    """Unit vector at cosine c from [1,0,0,0]."""
    return [float(c), math.sqrt(1.0 - c * c), 0.0, 0.0]


def test_hard_negatives_planted_geometry(spark, tmp_path):
    assert 0 % HN_ANCHOR_MOD == 0
    rows = [
        (0, _unit(1.0), 0),  # the anchor
        (1, _unit(0.96), 1),  # cross-label but above the dup ceiling
        (2, _unit(0.9), 1),  # hard negative, rank 1
        (3, _unit(1.0), 0),  # same label: excluded however close
        (4, _unit(0.5), 2),  # negative, rank 2
    ]
    d = _emb(spark, tmp_path, rows)
    got = q_embeddings_hard_negatives(spark, d).collect()
    mine = [r for r in got if r.anchor_id == 0]
    assert [(r.negative_id, r.rank) for r in mine] == [(2, 1), (4, 2)]
    assert abs(mine[0].cos - 0.9) < 1e-4
    assert abs(mine[1].cos - 0.5) < 1e-4
    assert all(r.negative_label != r.anchor_label for r in got)
    assert all(r.cos < HN_MAX_COS for r in got)


def test_hard_negatives_registry_shape(spark):
    got = q_embeddings_hard_negatives(spark, SF).collect()
    assert all(1 <= r.rank <= HN_K for r in got)
    assert all(r.anchor_id % HN_ANCHOR_MOD == 0 for r in got)
    # per-anchor ranks are dense from 1
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_anchor.values())
