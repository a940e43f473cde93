"""Wave-16 operators: Q2-shape cheapest supplier (completing all 22
TPC-H shapes), int8 scalar-quantized ANN, KG predicate co-occurrence,
ANALYZE-style table statistics.

Same twin discipline as wave 15: per-row rounding delegated to DuckDB
SQL, every aggregation / threshold / ranking step re-derived in plain
Python; integer outputs asserted bit-for-bit.
"""

import collections
import math

import duckdb

from deja_view_spark.queries_kg import q_kg_pred_cooccurrence
from deja_view_spark.queries_relational import (
    Q2_PTYPE,
    Q2_REGION,
    Q2_TOP_N,
    q_cheapest_supplier,
)
from deja_view_spark.queries_retrieval import (
    SQ8_LEVELS,
    SQ8_PROBE_MAX,
    SQ8_TOP_K,
    q_embeddings_sq8_topk,
)
from deja_view_spark.queries_stats import (
    STATS_COLUMNS,
    STATS_DISPLAY_CHARS,
    q_docs_table_stats,
)
from tests.test_wave15 import _triples_py

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation", "region",
              "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ------------------------------------------------------- Q2 analogue
def test_cheapest_supplier_matches_python(spark):
    con = _con()
    # per-row unit cents from DuckDB (identical rounding), rest python
    rows = con.sql(
        f"""SELECT l_partkey, l_suppkey,
                   CAST(round(l_extendedprice * 100 / l_quantity, 0)
                        AS BIGINT)
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_type = '{Q2_PTYPE}'"""
    ).fetchall()
    pair_cost: dict = {}
    for pk, sk, cents in rows:
        key = (pk, sk)
        pair_cost[key] = min(pair_cost.get(key, cents), cents)
    region_sup = {
        sk: (name, bal, nat)
        for sk, name, bal, nat in con.sql(
            f"""SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                           AND r_name = '{Q2_REGION}'"""
        ).fetchall()
    }
    rp = {
        (pk, sk): c
        for (pk, sk), c in pair_cost.items()
        if sk in region_sup
    }
    min_cost: dict = {}
    for (pk, _sk), c in rp.items():
        min_cost[pk] = min(min_cost.get(pk, c), c)
    winners = [
        (region_sup[sk][1], region_sup[sk][0], region_sup[sk][2], pk, c)
        for (pk, sk), c in rp.items()
        if c == min_cost[pk]
    ]
    winners.sort(key=lambda t: (-t[0], t[1], t[3]))
    winners = winners[:Q2_TOP_N]
    got = q_cheapest_supplier(spark, SF).collect()
    assert len(got) == len(winners)
    for r, (bal, name, nat, pk, cents) in zip(got, winners):
        assert (r.acctbal, r.supplier, r.nation, r.partkey) == (
            bal, name, nat, pk,
        )
        assert r.supply_cost == cents / 100
    assert len(got) > 0


# ------------------------------------------------ SQ8 quantized ANN
def _sq8_py():
    con = _con()
    vecs = dict(
        con.sql("SELECT vec_id, embedding FROM embeddings").fetchall()
    )
    normed = {}
    for vid, v in vecs.items():
        v = [float(x) for x in v]
        acc = 0.0
        for x in v:
            acc = acc + x * x  # sequential fold, same order as engines
        nrm = math.sqrt(acc)
        normed[vid] = [x / nrm for x in v]
    gmax = max(abs(x) for v in normed.values() for x in v)
    scale = SQ8_LEVELS / gmax
    return {
        vid: [math.floor(x * scale) for x in v]
        for vid, v in normed.items()
    }


def test_sq8_codes_and_scores_match_python(spark):
    codes = _sq8_py()
    got = q_embeddings_sq8_topk(spark, SF).collect()
    # recompute each reported pair's integer dot from the python codes
    for r in got:
        want = sum(
            a * b for a, b in zip(codes[r.probe_id], codes[r.neighbor_id])
        )
        assert r.dot_q == want
    # full ranking twin: top-k per probe by (dot desc, id asc)
    by_probe: dict = collections.defaultdict(list)
    probe_ids = {vid for vid in codes if vid < SQ8_PROBE_MAX}
    for p in probe_ids:
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(codes[p], codes[c])), c)
                for c in codes
                if c != p
            ),
        )[:SQ8_TOP_K]
        by_probe[p] = [c for _d, c in scored]
    for r in got:
        assert by_probe[r.probe_id][r.rank - 1] == r.neighbor_id


def test_sq8_codes_in_int8_range():
    codes = _sq8_py()
    lo = min(x for v in codes.values() for x in v)
    hi = max(x for v in codes.values() for x in v)
    assert -SQ8_LEVELS - 1 <= lo and hi <= SQ8_LEVELS


def test_sq8_recall_vs_exact_cosine(spark):
    # quantization must preserve the cosine ranking: mean recall@3 vs
    # the exact brute-force top-3 >= 0.9 (measured 0.967 at sf0.001)
    import __spark_entry__ as E

    sq = q_embeddings_sq8_topk(spark, SF).collect()
    knn = E.queries()["knn_bruteforce"](spark, SF).collect()
    sq_sets: dict = collections.defaultdict(set)
    for r in sq:
        sq_sets[r.probe_id].add(r.neighbor_id)
    ex_sets: dict = collections.defaultdict(set)
    for r in knn:
        if r.probe_id < SQ8_PROBE_MAX:
            ex_sets[r.probe_id].add(r.neighbor_id)
    recalls = [
        len(sq_sets[p] & ex_sets[p]) / SQ8_TOP_K for p in ex_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9


# ------------------------------------------- predicate co-occurrence
def test_kg_pred_cooccurrence_matches_python(spark):
    triples = _triples_py()
    preds: dict = collections.defaultdict(set)
    for s, p, _o in triples:
        preds[s].add(p)
    per: dict = collections.defaultdict(int)
    both: dict = collections.defaultdict(int)
    for s, ps in preds.items():
        for p in ps:
            per[p] += 1
        ps_sorted = sorted(ps)
        for i, a in enumerate(ps_sorted):
            for b in ps_sorted[i + 1:]:
                both[(a, b)] += 1
    got = q_kg_pred_cooccurrence(spark, SF).collect()
    assert len(got) == len(both)
    for r in got:
        nb = both[(r.pred_a, r.pred_b)]
        na, n_b = per[r.pred_a], per[r.pred_b]
        assert (r.n_both, r.n_a, r.n_b) == (nb, na, n_b)
        assert r.jaccard_ppm == nb * 1_000_000 // (na + n_b - nb)
    # doc-class predicates co-occur on every doc: jaccard == 1e6
    full = {
        (r.pred_a, r.pred_b): r.jaccard_ppm
        for r in got
    }
    assert full[("from_source", "in_lang")] == 1_000_000


# ------------------------------------------------- ANALYZE statistics
def test_table_stats_matches_python(spark):
    con = _con()
    raw = con.sql(
        f"SELECT {', '.join(STATS_COLUMNS)} FROM documents"
    ).fetchall()
    got = {r.col_name: r for r in q_docs_table_stats(spark, SF).collect()}
    assert set(got) == set(STATS_COLUMNS)
    n_rows = len(raw)
    for i, c in enumerate(STATS_COLUMNS):
        vals = [row[i] for row in raw]
        nonnull = [v for v in vals if v is not None]
        r = got[c]
        assert r.n_rows == n_rows
        assert r.n_null == n_rows - len(nonnull)
        assert r.ndv == len(set(nonnull))
        assert r.min_val == str(min(nonnull))[:STATS_DISPLAY_CHARS]
        assert r.max_val == str(max(nonnull))[:STATS_DISPLAY_CHARS]
        width = sum(len(str(v)) for v in nonnull)
        assert r.avg_width_centichars == width * 100 // max(len(nonnull), 1)
