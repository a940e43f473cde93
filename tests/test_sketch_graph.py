"""Line-level dedup, KMV distinct-count sketch, and triangle counting
(queries_corpus.py, queries_graph.py).

Each operator is checked against an independent small-scale oracle —
planted duplicates for line dedup, the true distinct count for KMV,
brute-force all-triples for triangles — on engine-synthesized inputs
(the registry queries' DuckDB value-hash parity is the driver's job)."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from deja_view_spark.queries_corpus import (
    DOC_DUP_FRAC,
    KMV_K,
    LINE_DF,
    LINE_W,
    q_docs_kmv_distinct,
    q_docs_line_dedup,
)
from deja_view_spark.queries_graph import (
    q_docs_duplicate_clusters,
    q_events_triangles,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ line dedup
def test_line_dedup_flags_planted_boilerplate(spark, tmp_path):
    """A segment shared verbatim by LINE_DF docs is flagged in both;
    unique segments never are; the doc-level keep flag follows the
    duplicated fraction."""
    boiler = " ".join(f"b{i}" for i in range(LINE_W))
    uniq = lambda d, s: " ".join(f"u{d}x{s}n{i}" for i in range(LINE_W))  # noqa: E731
    rows = [
        # doc 0: all boilerplate (2 segments, both shared with doc 1)
        (0, boiler + " " + boiler, "en", "a", 0),
        (1, boiler + " " + boiler, "en", "a", 0),
        # doc 2: half boilerplate -> dup_frac == 0.5 stays kept
        (2, boiler + " " + uniq(2, 0), "en", "a", 0),
        # doc 3: fully unique
        (3, uniq(3, 0) + " " + uniq(3, 1), "en", "a", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in q_docs_line_dedup(spark, d).collect()
    }
    assert out[0]["n_segs"] == 2 and out[0]["n_dup_segs"] == 2
    assert not out[0]["keep"] and not out[1]["keep"]
    assert out[2]["n_dup_segs"] == 1 and out[2]["dup_frac"] == 0.5
    assert out[2]["keep"]  # exactly at the threshold -> kept
    assert out[3]["n_dup_segs"] == 0 and out[3]["keep"]
    assert LINE_DF == 2 and DOC_DUP_FRAC == 0.5  # values the plants assume


def test_line_dedup_deterministic_rerun(spark):
    a = q_docs_line_dedup(spark, SF)
    b = q_docs_line_dedup(spark, SF)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ------------------------------------------------------------ KMV sketch
def test_kmv_estimate_accuracy(spark):
    """The KMV estimate must land within the sketch's statistical
    error of the true per-language distinct-shingle count. The
    relative standard error of a K-minimum-values estimator is
    ~1/sqrt(K-2); 5 sigma at K=64 is ~64%, we assert 50% which the
    deterministic md5 hash comfortably meets on this corpus."""
    from deja_view_spark.queries_text import _shingle_col
    from deja_view_spark.sources.catalog import load_table

    est = {
        r["lang"]: (r["n_seen"], r["est_distinct"])
        for r in q_docs_kmv_distinct(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    truth = {
        r["lang"]: r["d"]
        for r in docs.select(
            "lang",
            F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh"),
        )
        .groupBy("lang")
        .agg(F.countDistinct("sh").alias("d"))
        .collect()
    }
    assert set(est) == set(truth)
    for lang, (n_seen, e) in est.items():
        t = truth[lang]
        if n_seen >= KMV_K:
            assert abs(e - t) / t < 0.5, (lang, e, t)
        else:  # sampling fallback: inverse-probability scaled survivors
            assert e == n_seen * 4


# ------------------------------------------------------------ HLL sketch
def test_hll_matches_python_twin(spark):
    """docs_hll_distinct == a pure-python dense HLL with the same
    md5-derived 60-bit hash, register split and scaled-integer
    harmonic sum — register table AND estimate must agree."""
    import hashlib
    import re

    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_P,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        q_docs_hll_distinct,
    )
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select("lang", "text").toPandas()
    tok = re.compile(r"[a-z0-9_]+")
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = tok.findall(text.lower())
        for i in range(len(toks) - 2):
            sh = " ".join(toks[i : i + 3])
            exact.setdefault(lang, set()).add(sh)
            h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
            reg, v = h % HLL_M, h >> HLL_P
            rho = (HLL_W + 1) - v.bit_length() if v else HLL_W + 1
            r = regs.setdefault(lang, {})
            r[reg] = max(r.get(reg, 0), rho)
    out = {r.lang: r for r in q_docs_hll_distinct(spark, SF).collect()}
    assert set(out) == set(regs)
    for lang, r in regs.items():
        s_int = sum(1 << (HLL_W + 1 - mr) for mr in r.values())
        zeros = HLL_M - len(r)
        s_int += zeros << (HLL_W + 1)
        est = _HLL_NUM / s_int
        if est <= _HLL_LC_CUT and zeros > 0:
            import math

            est = HLL_M * math.log(HLL_M / zeros)
        got = out[lang]
        assert got.registers_hit == len(r)
        assert got.zero_registers == zeros
        assert abs(got.hll_est - est) < 1e-3, (lang, got.hll_est, est)
        assert got.exact_distinct == len(exact[lang])


def test_hll_small_set_linear_counting(spark, tmp_path):
    """A tiny vocabulary (fewer distinct shingles than registers) must
    take the linear-counting branch and come out near-exact — dense
    HLL alone would be badly biased here."""
    # 30 docs sharing a 40-token rotating vocabulary -> few hundred
    # distinct shingles << 2.5 * HLL_M raw-estimate cutoff
    rows = [
        (
            i,
            " ".join(f"w{(i * 7 + j) % 40}" for j in range(25)),
            "en",
            "a",
            0,
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "tiny")
    df.write.parquet(d + "/documents.parquet")
    from deja_view_spark.queries_corpus import q_docs_hll_distinct

    row = q_docs_hll_distinct(spark, d).collect()[0]
    assert row.zero_registers > 0
    assert abs(row.hll_est - row.exact_distinct) / row.exact_distinct < 0.25


# -------------------------------------------- histogram-quantile sketch
def test_hist_quantiles_within_bin_of_exact(spark):
    """The histogram estimate must land within one bin width of the
    exact continuous quantile (the sketch's worst-case error bound)."""
    from deja_view_spark.queries_relational import (
        HIST_BIN_W,
        q_docs_length_hist_quantiles,
    )
    from deja_view_spark.sources.catalog import load_table

    est = {
        r["lang"]: (r["h50"], r["h90"])
        for r in q_docs_length_hist_quantiles(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    exact = {
        r["lang"]: (r["e50"], r["e90"])
        for r in docs.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.5)").alias("e50"),
            F.expr("percentile(n_chars, 0.9)").alias("e90"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for lang in est:
        for e, x in zip(est[lang], exact[lang]):
            assert abs(e - x) <= HIST_BIN_W, (lang, e, x)


# ----------------------------------------------------- duplicate clusters
def test_duplicate_clusters_transitive_chain(spark, tmp_path):
    """A ~ B and B ~ C (but A !~ C) must land in ONE cluster with the
    min doc_id as representative: the transitive closure a pairwise
    dedup can't see. Block construction: 12-token blocks X, Y; doc1 =
    X+U1, doc2 = X+Y, doc3 = Y+U3 -> shingle Jaccard(1,2) = 10/34 ≈
    0.29 >= 0.2, Jaccard(1,3) = 0."""
    blk = lambda p: " ".join(f"{p}{i}" for i in range(12))  # noqa: E731
    rows = [
        (1, blk("x") + " " + blk("u"), "en", "a", 0),
        (2, blk("x") + " " + blk("y"), "en", "a", 0),
        (3, blk("y") + " " + blk("w"), "en", "a", 0),
        (9, blk("q") + " " + blk("r"), "en", "a", 0),  # no near-dups
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "chain")
    df.write.parquet(d + "/documents.parquet")
    out = q_docs_duplicate_clusters(spark, d).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["n_docs"], r["is_rep"]) for r in out}
    assert got == {1: (1, 3, True), 2: (1, 3, False), 3: (1, 3, False)}


# ------------------------------------------------------------- triangles
def _brute_triangles(edges):
    """All-triples oracle over an explicit undirected edge set."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in es for v in e})
    counts = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for v in (a, b, c):
                counts[v] += 1
    return {v: c for v, c in counts.items() if c > 0}


@pytest.mark.parametrize("seed", [3, 11])
def test_triangles_match_bruteforce(spark, tmp_path, seed):
    """Degree-oriented counting equals the all-triples oracle on a
    random graph, planted via an events table whose co-engagement
    chains reproduce exactly the wanted edge set (one 2-user item per
    edge)."""
    n = 40
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if (a * 131 + b * 17 + seed) % 7 == 0
    ]
    rows = []
    for i, (a, b) in enumerate(edges):
        for u in (a, b):
            rows.append((u, "touch", f'{{"k": {i}}}', "2024-01-01T00:00:00"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, props string, ts string"
    ).select(
        "user_id", "event_type", "props", F.col("ts").cast("timestamp").alias("ts")
    )
    d = str(tmp_path / "ev")
    ev.write.parquet(d + "/events.parquet")
    got = {
        r["node"]: r["n_triangles"]
        for r in q_events_triangles(spark, d).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangles_each_emitted_once_total(spark, tmp_path):
    """Sum of per-vertex counts is exactly 3x the number of distinct
    triangles (here: K4 = 4 triangles, every vertex in 3)."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    rows = []
    for i, (a, b) in enumerate(edges):
        for u in (a, b):
            rows.append((u, "touch", f'{{"k": {i}}}', "2024-01-01T00:00:00"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, props string, ts string"
    ).select(
        "user_id", "event_type", "props", F.col("ts").cast("timestamp").alias("ts")
    )
    d = str(tmp_path / "k4")
    ev.write.parquet(d + "/events.parquet")
    got = {
        r["node"]: r["n_triangles"]
        for r in q_events_triangles(spark, d).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


# ------------------------------------------------- count-min sketch
def test_cm_sketch_matches_python_twin(spark):
    """events_cm_sketch == a pure-python count-min with the same
    md5-prefix bucket hash; and the one-sided guarantee est >= exact
    holds for every audited key."""
    import hashlib
    import json as _json

    from deja_view_spark.queries_events import (
        CM_DEPTH,
        CM_TOP,
        CM_WIDTH,
        q_events_cm_sketch,
    )
    from deja_view_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select("props").toPandas()
    items = [int(_json.loads(p)["k"]) for p in ev["props"]]

    def bucket(item: int, r: int) -> int:
        h = hashlib.md5(f"{item}:{r}".encode()).hexdigest()
        return int(h[:8], 16) % CM_WIDTH

    sketch = [[0] * CM_WIDTH for _ in range(CM_DEPTH)]
    exact: dict[int, int] = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1
        for r in range(CM_DEPTH):
            sketch[r][bucket(it, r)] += 1
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CM_TOP]

    out = q_events_cm_sketch(spark, SF).collect()
    assert [(r.item, r.exact_count) for r in out] == top
    for r in out:
        want = min(sketch[d][bucket(r.item, d)] for d in range(CM_DEPTH))
        assert r.cm_estimate == want, r.item
        assert r.overestimate >= 0
        assert r.cm_estimate >= r.exact_count


# ------------------------------------------------- KMV set algebra
def test_kmv_overlap_matches_python_twin(spark):
    """docs_kmv_lang_overlap == a pure-python twin of the same sketch
    algebra (per-lang k-min md5-60 sketches -> merged k', kth-min
    union estimate, matched-fraction Jaccard), plus the accuracy
    property the sketch exists for (est within sampling error of
    exact)."""
    import hashlib
    import re

    from deja_view_spark.queries_corpus import (
        KMV_INV_P,
        KMV_OV_CUT,
        KMV_OV_K,
        _HEX60,
        q_docs_kmv_lang_overlap,
    )
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select("lang", "text").toPandas()
    tok = re.compile(r"[a-z0-9_]+")
    full: dict[str, set] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = tok.findall(text.lower())
        full.setdefault(lang, set()).update(
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[
                    :15
                ],
                16,
            )
            for i in range(len(toks) - 2)
        )
    sk = {
        lang: sorted(h for h in hs if h < KMV_OV_CUT)[:KMV_OV_K]
        for lang, hs in full.items()
    }
    want = {}
    for la in sorted(sk):
        for lb in sorted(sk):
            if la >= lb:
                continue
            merged = sorted(set(sk[la]) | set(sk[lb]))
            kp = min(KMV_OV_K, len(merged))
            u = merged[:kp]
            both = set(sk[la]) & set(sk[lb])
            m = sum(1 for h in u if h in both)
            if len(merged) >= KMV_OV_K:
                est_union = (KMV_OV_K - 1) * _HEX60 // merged[kp - 1]
            else:
                est_union = len(merged) * KMV_INV_P
            est_inter = m * est_union // kp
            exact_i = len(full[la] & full[lb])
            exact_u = len(full[la] | full[lb])
            want[(la, lb)] = (
                kp,
                round(m / kp, 4),
                est_inter,
                est_union,
                exact_i,
                exact_u,
                round(exact_i / exact_u, 4),
            )
    out = q_docs_kmv_lang_overlap(spark, SF).collect()
    got = {
        (r.lang_a, r.lang_b): (
            r.k_used,
            r.est_jaccard,
            r.est_intersection,
            r.est_union,
            r.exact_intersection,
            r.exact_union,
            r.exact_jaccard,
        )
        for r in out
    }
    assert got == want
    # accuracy: the estimates must be within sampling error of exact
    for kp, ej, ei, eu, xi, xu, xj in want.values():
        assert abs(eu - xu) / xu < 0.35  # ~5.6 sigma at K=256
        assert abs(ej - xj) < 0.15


# ------------------------------------------- sliding-window HLL merge
def test_hll_sliding_merge_equals_direct_window_build(spark):
    """The mergeability invariant the operator relies on: register-max
    merging per-day HLL state over a trailing window produces the
    IDENTICAL registers (hence identical estimate) as building one HLL
    directly over the window's events — asserted via a python twin on
    sf0.001; the query's rows must match the twin exactly."""
    import hashlib
    from collections import defaultdict

    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_P,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
    )
    from deja_view_spark.queries_events import (
        HLL_SLIDE_DAYS,
        q_events_hll_sliding,
    )
    from deja_view_spark.sources.catalog import load_table

    ev = (
        load_table(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS day", "user_id", "props")
        .toPandas()
    )
    day_regs: dict = defaultdict(dict)
    day_sets: dict = defaultdict(set)
    for day, uid, props in zip(ev["day"], ev["user_id"], ev["props"]):
        key = f"{uid}|{props}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        reg, v = h % HLL_M, h >> HLL_P
        rho = (HLL_W + 1) - v.bit_length() if v else HLL_W + 1
        r = day_regs[day]
        r[reg] = max(r.get(reg, 0), rho)
        day_sets[day].add(key)
    days = sorted(day_regs)
    want = {}
    for end in days:
        window = [d for d in days if 0 <= (end - d).days < HLL_SLIDE_DAYS]
        # merged per-day state
        merged: dict = {}
        direct: dict = {}
        exact = set()
        for d in window:
            for reg, mr in day_regs[d].items():
                merged[reg] = max(merged.get(reg, 0), mr)
            exact |= day_sets[d]
        # direct build over the window's raw keys
        for key in exact:
            h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
            reg, v = h % HLL_M, h >> HLL_P
            rho = (HLL_W + 1) - v.bit_length() if v else HLL_W + 1
            direct[reg] = max(direct.get(reg, 0), rho)
        assert merged == direct  # the mergeability invariant
        cnt = len(merged)
        s_int = sum(1 << (HLL_W + 1 - mr) for mr in merged.values())
        s_int += (HLL_M - cnt) * (1 << (HLL_W + 1))
        raw = _HLL_NUM / s_int
        import math

        if raw <= _HLL_LC_CUT and cnt < HLL_M:
            est = HLL_M * math.log(HLL_M / (HLL_M - cnt))
        else:
            est = raw
        want[str(end)] = (
            cnt,
            round(est, 4),
            len(exact),
            round((est - len(exact)) / len(exact) * 100, 4),
        )
    out = q_events_hll_sliding(spark, SF).collect()
    got = {
        r.end_day: (
            r.registers_hit,
            r.hll_est,
            r.exact_distinct,
            r.rel_err_pct,
        )
        for r in out
    }
    assert got == want
