"""Wave-17 retrieval: two-stage SQ8 -> exact-cosine rerank."""

import collections

from deja_view_spark.queries_retrieval import (
    SQ8_PROBE_MAX,
    SQ8_RERANK_POOL,
    SQ8_RERANK_TOP_K,
    q_embeddings_sq8_rerank,
    q_embeddings_sq8_topk,
)

SF = "/root/testdata/sf0.001"


def test_rerank_recovers_exact_topk(spark):
    """With pool >> k, the rerank stage must recover the exact-cosine
    top-k under its own ordering contract (round(cos, 4) desc, id asc
    — the engine's 4dp float-compare discipline): perfect recall@3 at
    sf0.001, where the SQ8-only stage sits at ~0.97. Truth is a FULL
    brute-force scan in DuckDB — no pool, independent engine."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    truth = con.sql(f"""
        SELECT probe_id, neighbor_id, rank FROM (
          SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY p.vec_id ORDER BY
                   round(list_dot_product(p.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(p.embedding::DOUBLE[],
                                              p.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))),
                     4) DESC, e.vec_id ASC) AS rank
          FROM embeddings p, embeddings e
          WHERE p.vec_id < {SQ8_PROBE_MAX}
            AND e.vec_id <> p.vec_id) t
        WHERE rank <= {SQ8_RERANK_TOP_K}
    """).fetchall()
    ex: dict = collections.defaultdict(list)
    for probe, nb, rank in truth:
        ex[probe].append((rank, nb))
    got = q_embeddings_sq8_rerank(spark, SF).collect()
    mine: dict = collections.defaultdict(list)
    for r in got:
        mine[r.probe_id].append((r.rank, r.neighbor_id))
    assert set(mine) == set(ex)
    for p in ex:
        assert sorted(mine[p]) == sorted(ex[p])


def test_rerank_pool_contains_final_topk(spark):
    pool_stage = {
        (r.probe_id, r.neighbor_id)
        for r in q_embeddings_sq8_topk(spark, SF).collect()
    }
    final = q_embeddings_sq8_rerank(spark, SF).collect()
    # the final ranking re-orders the pool; its rank-1 need not be the
    # SQ8 rank-1, but every probe must emit exactly TOP_K rows with
    # contiguous ranks and descending rounded cosine
    per_probe: dict = collections.defaultdict(list)
    for r in final:
        per_probe[r.probe_id].append(r)
    assert SQ8_RERANK_POOL > SQ8_RERANK_TOP_K
    for p, rows in per_probe.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, SQ8_RERANK_TOP_K + 1))
        coss = [r.cos for r in rows]
        assert coss == sorted(coss, reverse=True)
    assert pool_stage  # stage-1 smoke: SQ8 ranking is non-empty
