"""Wave-15 operators: the five remaining TPC-H shapes (Q9/Q11/Q12/
Q16/Q20 analogues) and the KG triple-store analytics battery.

Twin strategy: per-row cents/rounding is delegated to DuckDB SQL
(identical round-half-up semantics to Spark's round()); every
aggregation / threshold / join step is then recomputed in plain
Python, so these tests are independent of both engines' group-by and
join machinery. All scores are exact integers — bit-for-bit asserts,
no tolerances.
"""

import collections
import json

import duckdb

from deja_view_spark.queries_kg import (
    DEGREE_TOP_K,
    KG_VOCAB,
    STAR_TERM_A,
    STAR_TERM_B,
    q_kg_characteristic_sets,
    q_kg_degree_topk,
    q_kg_predicate_stats,
    q_kg_star_join,
)
from deja_view_spark.queries_relational import (
    Q9_PART_LIKE,
    Q11_MULT_DEN,
    Q11_MULT_NUM,
    Q12_DATE_HI,
    Q12_DATE_LO,
    Q16_BRAND_NOT,
    Q16_SIZES,
    Q16_TYPE_NOT_LIKE,
    Q20_PART_LIKE,
    Q20_SHARE_PPM,
    q_excess_share_suppliers,
    q_important_parts,
    q_product_profit,
    q_shipclass_priority,
    q_supplier_part_counts,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part", "supplier", "nation",
              "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ------------------------------------------------------- Q9 analogue
def test_product_profit_matches_python(spark):
    con = _con()
    rows = con.sql(
        f"""SELECT n_name, extract(year FROM o_orderdate),
                   CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)
                   - CAST(round(p_retailprice * 10, 0) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_name LIKE '{Q9_PART_LIKE}'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey"""
    ).fetchall()
    want: dict = collections.defaultdict(int)
    for nation, year, cents in rows:
        want[(nation, year)] += cents
    got = q_product_profit(spark, SF).collect()
    assert len(got) == len(want)
    # ordering: nation asc, year desc
    keys = [(r.nation, r.o_year) for r in got]
    assert keys == sorted(keys, key=lambda k: (k[0], -k[1]))
    for r in got:
        assert r.profit == want[(r.nation, r.o_year)] / 100


# ------------------------------------------------------ Q11 analogue
def test_important_parts_threshold_cut(spark):
    con = _con()
    rows = con.sql(
        """SELECT l_partkey,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)
           FROM lineitem"""
    ).fetchall()
    per_part: dict = collections.defaultdict(int)
    for pk, cents in rows:
        per_part[pk] += cents
    total = sum(per_part.values())
    n = len(per_part)
    want = {
        pk: (c, c * 1_000_000 // total)
        for pk, c in per_part.items()
        if c * n * Q11_MULT_DEN > Q11_MULT_NUM * total
    }
    got = q_important_parts(spark, SF).collect()
    assert {r.l_partkey for r in got} == set(want)
    assert len(got) > 0  # non-degenerate at this SF
    for r in got:
        cents, ppm = want[r.l_partkey]
        assert r.revenue == cents / 100
        assert r.share_ppm == ppm
    ppms = [(r.share_ppm, r.l_partkey) for r in got]
    assert ppms == sorted(ppms, key=lambda t: (-t[0], t[1]))


# ------------------------------------------------------ Q12 analogue
def test_shipclass_priority_counts(spark):
    con = _con()
    rows = con.sql(
        f"""SELECT l_linestatus, o_orderpriority
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '{Q12_DATE_LO}'
              AND l_shipdate <  TIMESTAMP '{Q12_DATE_HI}'"""
    ).fetchall()
    want: dict = collections.defaultdict(lambda: [0, 0])
    for cls, prio in rows:
        want[cls][0 if prio in ("1-URGENT", "2-HIGH") else 1] += 1
    got = q_shipclass_priority(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        hi, lo = want[r.ship_class]
        assert (r.high_line_count, r.low_line_count) == (hi, lo)


# ------------------------------------------------------ Q16 analogue
def test_supplier_part_counts_anti_join(spark):
    con = _con()
    pairs = set(
        con.sql("SELECT DISTINCT l_partkey, l_suppkey FROM lineitem")
        .fetchall()
    )
    bad = {
        s for (s,) in con.sql(
            "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0"
        ).fetchall()
    }
    attrs = {
        pk: (b, t, z)
        for pk, b, t, z in con.sql(
            "SELECT p_partkey, p_brand, p_type, p_size FROM part"
        ).fetchall()
    }
    want: dict = collections.defaultdict(set)
    for pk, sk in pairs:
        if sk in bad:
            continue
        b, t, z = attrs[pk]
        if b == Q16_BRAND_NOT or t.startswith("PROMO") or z not in Q16_SIZES:
            continue
        want[(b, t, z)].add(sk)
    got = q_supplier_part_counts(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.supplier_cnt == len(want[(r.p_brand, r.p_type, r.p_size)])
    order = [(r.supplier_cnt, r.p_brand, r.p_type, r.p_size) for r in got]
    assert order == sorted(order, key=lambda t: (-t[0], t[1], t[2], t[3]))


def test_q16_type_pattern_is_prefix():
    # the python twin above uses startswith; guard the constant
    assert Q16_TYPE_NOT_LIKE == "PROMO%"


# ------------------------------------------------------ Q20 analogue
def test_excess_share_suppliers_share_rule(spark):
    con = _con()
    rows = con.sql(
        f"""SELECT l_suppkey, l_partkey, CAST(l_quantity AS BIGINT)
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_name LIKE '{Q20_PART_LIKE}'"""
    ).fetchall()
    pair_qty: dict = collections.defaultdict(int)
    part_qty: dict = collections.defaultdict(int)
    for sk, pk, q in rows:
        pair_qty[(sk, pk)] += q
        part_qty[pk] += q
    excess = {
        sk for (sk, pk), q in pair_qty.items()
        if q * 1_000_000 // part_qty[pk] > Q20_SHARE_PPM
    }
    names = dict(
        con.sql(
            """SELECT s_suppkey, s_name FROM supplier"""
        ).fetchall()
    )
    got = q_excess_share_suppliers(spark, SF).collect()
    assert {r.supplier for r in got} == {names[sk] for sk in excess}
    sups = [r.supplier for r in got]
    assert sups == sorted(sups)


# ------------------------------------------- KG triple-store battery
def _triples_py():
    """Pure-python rebuild of queries_kg.kg_triples."""
    con = _con()
    docs = con.sql(
        "SELECT doc_id, text, lang, source FROM documents"
    ).fetchall()
    triples = []
    for did, text, lang, source in docs:
        subj = f"doc:{did}"
        toks = set(text.split(" "))
        for t in KG_VOCAB:
            if t in toks:
                triples.append((subj, "has_term", f"term:{t}"))
        triples.append((subj, "in_lang", f"lang:{lang}"))
        triples.append((subj, "from_source", f"src:{source}"))
    ev = con.sql("SELECT user_id, event_type, props FROM events").fetchall()
    seen = set()
    for uid, et, props in ev:
        k = json.loads(props).get("k")
        if k is None:
            continue
        edge = (f"user:{uid}", et, f"item:{int(k)}")
        if edge not in seen:
            seen.add(edge)
            triples.append(edge)
    return triples


def test_kg_predicate_stats_matches_python(spark):
    triples = _triples_py()
    fan: dict = collections.defaultdict(int)
    objs: dict = collections.defaultdict(set)
    for s, p, o in triples:
        fan[(p, s)] += 1
        objs[p].add(o)
    per_pred: dict = collections.defaultdict(lambda: [0, 0, 0])
    for (p, _s), f in fan.items():
        agg = per_pred[p]
        agg[0] += f
        agg[1] += 1
        agg[2] = max(agg[2], f)
    got = q_kg_predicate_stats(spark, SF).collect()
    assert [r.pred for r in got] == sorted(per_pred)
    for r in got:
        nt, ns, mf = per_pred[r.pred]
        assert (r.n_triples, r.n_subj, r.n_obj, r.max_fanout) == (
            nt, ns, len(objs[r.pred]), mf,
        )
        assert r.functional == (mf == 1)


def test_kg_star_join_matches_python(spark):
    triples = _triples_py()
    with_a = {s for s, p, o in triples
              if p == "has_term" and o == STAR_TERM_A}
    with_b = {s for s, p, o in triples
              if p == "has_term" and o == STAR_TERM_B}
    want: dict = collections.defaultdict(int)
    for s, p, o in triples:
        if p == "in_lang" and s in with_a and s in with_b:
            want[o] += 1
    got = q_kg_star_join(spark, SF).collect()
    assert {(r.lang, r.n_docs) for r in got} == set(want.items())
    assert sum(want.values()) > 0  # pattern non-degenerate at this SF


def test_kg_characteristic_sets_matches_python(spark):
    triples = _triples_py()
    preds: dict = collections.defaultdict(set)
    nt: dict = collections.defaultdict(int)
    for s, p, _o in triples:
        preds[s].add(p)
        nt[s] += 1
    want: dict = collections.defaultdict(lambda: [0, 0])
    for s in preds:
        cs = ",".join(sorted(preds[s]))
        want[cs][0] += 1
        want[cs][1] += nt[s]
    got = q_kg_characteristic_sets(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        n_subj, n_tr = want[r.charset]
        assert (r.n_subjects, r.n_triples) == (n_subj, n_tr)
        assert r.avg_fanout_ppm == n_tr * 1_000_000 // n_subj
    # every doc emits in_lang+from_source, so at least one class has both
    assert any("from_source" in r.charset and "in_lang" in r.charset
               for r in got)


def test_kg_degree_topk_matches_python(spark):
    triples = _triples_py()
    out_d: dict = collections.defaultdict(int)
    in_d: dict = collections.defaultdict(int)
    for s, _p, o in triples:
        out_d[s] += 1
        in_d[o] += 1
    ents = set(out_d) | set(in_d)
    ranked = sorted(
        ((out_d[e] + in_d[e], e) for e in ents),
        key=lambda t: (-t[0], t[1]),
    )[:DEGREE_TOP_K]
    got = q_kg_degree_topk(spark, SF).collect()
    assert [(r.degree, r.entity) for r in got] == ranked
    for r in got:
        assert r.out_deg == out_d[r.entity]
        assert r.in_deg == in_d[r.entity]
