"""Dedup family: MinHash LSH recall vs exact Jaccard, SimHash hamming
correctness, fingerprint stability."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.operators.dedup import (
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)

DOCS = [
    # near-dup cluster: same text with one-token edits (high jaccard)
    (0, "the cache invalidation races with concurrent writers under heavy load and the fix needs review"),
    (1, "the cache invalidation races with concurrent writers under heavy load and the fix needs testing"),
    (2, "the cache invalidation races with concurrent writers under heavy load and the patch needs review"),
    # exact duplicate pair
    (3, "pagination returns duplicate entries across page boundaries in the api"),
    (4, "pagination returns duplicate entries across page boundaries in the api"),
    # unrelated
    (5, "websocket connections drop silently behind the load balancer after deploys"),
    (6, "the scheduler starves low priority jobs when the queue depth grows"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_minhash_finds_near_dups(docs):
    pairs = minhash_dedup_pairs(docs, threshold=0.5).collect()
    found = {(r.src_doc, r.dst_doc) for r in pairs}
    # the exact pair and the heavy-overlap cluster must be found
    assert (3, 4) in found
    assert (0, 1) in found and (0, 2) in found
    # unrelated docs never pair
    assert not any(5 in p or 6 in p for p in found)
    # jaccard of the exact pair is 1.0
    exact = [r.jaccard for r in pairs if (r.src_doc, r.dst_doc) == (3, 4)]
    assert exact == [1.0]


def test_simhash_near_dups(docs):
    pairs = simhash_dedup_pairs(docs, max_hamming=10).collect()
    found = {(r.src_doc, r.dst_doc) for r in pairs}
    assert (3, 4) in found
    ham = {(r.src_doc, r.dst_doc): r.hamming for r in pairs}
    assert ham[(3, 4)] == 0  # identical text -> identical fingerprint


def test_simhash_deterministic(docs):
    a = sorted(map(tuple, simhash_dedup_pairs(docs, max_hamming=6).collect()))
    b = sorted(map(tuple, simhash_dedup_pairs(docs, max_hamming=6).collect()))
    assert a == b


def test_minhash_recall_vs_exact_on_testdata(spark):
    """On the real documents table: every exact-Jaccard pair >= 0.8
    must be recovered by the LSH path (recall 1.0 for true near-dups),
    and precision is exact by construction (verify step)."""
    from deja_view_spark.queries_text import q_docs_jaccard_pairs

    sf_dir = "/root/testdata/sf0.001"
    exact = {
        (r.src_doc, r.dst_doc)
        for r in q_docs_jaccard_pairs(spark, sf_dir).collect()
        if r.jaccard >= 0.8
    }
    lsh = {
        (r.src_doc, r.dst_doc)
        for r in minhash_dedup_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.8
        ).collect()
    }
    assert exact, "testdata should contain near-duplicate documents"
    assert exact <= lsh
    assert lsh <= exact  # verify step filters to the same threshold


def test_incremental_dedup_planted_pair(spark):
    """Incremental probe of a new batch against an indexed corpus:
    planted cross-split near-dup found with exact jaccard, corpus-side
    internal duplicates NOT re-emitted, and the new-batch band table is
    broadcast (no corpus shuffle)."""
    from deja_view_spark.operators.dedup import incremental_minhash_pairs

    corpus = spark.createDataFrame(
        [r for r in DOCS if r[0] != 1], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [r for r in DOCS if r[0] == 1], "doc_id long, text string"
    )
    out = incremental_minhash_pairs(new, corpus, threshold=0.5)
    rows = out.collect()
    found = {(r.src_doc, r.dst_doc) for r in rows}
    # the new doc pairs with both members of its cluster in the corpus
    assert (1, 0) in found and (1, 2) in found
    # the corpus-internal exact pair (3, 4) is NOT re-deduplicated
    assert all(r.src_doc == 1 for r in rows)
    # plan: candidate join must broadcast the (small) new side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_matches_full_pairs_subset(spark):
    """On the real documents table, the incremental query's output is
    exactly the cross-split subset of the full-corpus minhash pair set
    (same banding => same recall; disjoint split => src is always
    new-side)."""
    from deja_view_spark.queries import (
        q_docs_incremental_dedup,
        q_docs_minhash_pairs,
    )

    sf_dir = "/root/testdata/sf0.001"
    inc = {
        (r.src_doc, r.dst_doc, r.jaccard)
        for r in q_docs_incremental_dedup(spark, sf_dir).collect()
    }
    full = q_docs_minhash_pairs(spark, sf_dir).collect()
    new_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % 5
            == 0
        )
        .collect()
    }
    # full pairs are canonical (src < dst); incremental pairs are
    # directed new -> corpus. re-orient the cross-split subset.
    expect = set()
    for r in full:
        a, b = r.src_doc, r.dst_doc
        if (a in new_ids) != (b in new_ids):
            src, dst = (a, b) if a in new_ids else (b, a)
            expect.add((src, dst, r.jaccard))
    assert inc == expect
    assert expect, "split should cross at least one near-dup pair"


# ------------------------------------------------------------ winnowing
def test_winnow_guarantee_and_disjoint_control(spark, tmp_path):
    """SWA 2003 guarantee: a shared token run of >= W+K-1 produces at
    least one shared fingerprint — a 30-token shared run comfortably
    clears WINNOW_MIN_SHARED and the pair must surface. Docs with
    disjoint vocabularies share no shingle, hence no fingerprint, and
    must NOT pair."""
    from deja_view_spark.queries_text import (
        WINNOW_MIN_SHARED,
        WINNOW_W,
        q_docs_winnow_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(30))
    ua = " ".join(f"a{i}" for i in range(25))
    ub = " ".join(f"b{i}" for i in range(25))
    uc = " ".join(f"c{i}" for i in range(60))
    rows = [
        (1, ua + " " + shared, "en", "x", 0),
        (2, shared + " " + ub, "en", "x", 0),
        (3, uc, "en", "x", 0),  # disjoint vocabulary control
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "winnow")
    df.write.parquet(d + "/documents.parquet")
    out = q_docs_winnow_pairs(spark, d).collect()
    got = {(r.src_doc, r.dst_doc): r.n_shared for r in out}
    assert (1, 2) in got and got[(1, 2)] >= WINNOW_MIN_SHARED
    assert all(3 not in p for p in got)
    assert WINNOW_W == 4  # the run length the plant assumes


def test_winnow_matches_python_twin(spark):
    """docs_winnow_pairs == a pure-python winnower with the same
    md5-prefix 60-bit hash, window min, df cutoff and containment
    score, on the sf0.001 corpus."""
    import hashlib
    import re
    from collections import defaultdict

    from deja_view_spark.queries_text import (
        WINNOW_DF_CUTOFF,
        WINNOW_MIN_SHARED,
        WINNOW_W,
        q_docs_winnow_pairs,
    )
    from deja_view_spark.sources.catalog import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    tok = re.compile(r"[a-z0-9_]+")
    fps: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = tok.findall(text.lower())
        if len(toks) < WINNOW_W + 2:
            continue
        hs = [
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:15],
                16,
            )
            for i in range(len(toks) - 2)
        ]
        fps[int(doc_id)] = {
            min(hs[s : s + WINNOW_W]) for s in range(len(hs) - WINNOW_W + 1)
        }
    df_count = defaultdict(int)
    for s in fps.values():
        for h in s:
            df_count[h] += 1
    kept = {
        d: {h for h in s if df_count[h] <= WINNOW_DF_CUTOFF}
        for d, s in fps.items()
    }
    want = {}
    ids = sorted(kept)
    inv = defaultdict(list)
    for d in ids:
        for h in kept[d]:
            inv[h].append(d)
    pair_c = defaultdict(int)
    for h, ds in inv.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_c[(ds[i], ds[j])] += 1
    for (a, b), c in pair_c.items():
        if c >= WINNOW_MIN_SHARED:
            want[(a, b)] = (c, round(c / min(len(kept[a]), len(kept[b])), 4))
    out = q_docs_winnow_pairs(spark, "/root/testdata/sf0.001").collect()
    got = {
        (r.src_doc, r.dst_doc): (r.n_shared, r.fp_containment) for r in out
    }
    assert got == want


# ------------------------------------------------- sorted neighborhood
def test_sorted_neighborhood_reverse_pass_rescue(spark, tmp_path):
    """Two near-identical docs that DISAGREE on their first token land
    in different forward blocks (pass 1 blind) but share the reversed
    prefix — only the second pass can pair them. A vocabulary-disjoint
    control must stay unpaired."""
    from deja_view_spark.queries_corpus import q_docs_sorted_neighborhood

    body = " ".join(f"tail{i}" for i in range(20))
    rows = [
        (1, "zebra " + body, "en", "x", 0),
        (2, "apple " + body, "en", "x", 0),
        (3, " ".join(f"other{i}" for i in range(21)), "en", "x", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "snm")
    df.write.parquet(d + "/documents.parquet")
    out = {(r.src_doc, r.dst_doc): r.jaccard for r in q_docs_sorted_neighborhood(spark, d).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 0.9  # 20/22 distinct-token overlap
    assert all(3 not in p for p in out)


def test_sorted_neighborhood_candidates_linear(spark):
    """O(n·w) guarantee: the candidate count (pre-verification) is at
    most 2 passes x SN_W x n — the property that makes SNM safe where
    posting lists blow up."""
    from deja_view_spark.queries_corpus import SN_W, _sn_pass_pairs
    from deja_view_spark.queries_text import TOKEN_RE
    from deja_view_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    t = docs.select("doc_id", toks.alias("tk")).where(F.size("tk") >= 1)
    n = t.count()
    fwd = _sn_pass_pairs(
        t, F.element_at("tk", 1), F.concat_ws(" ", F.slice("tk", 1, 6))
    ).count()
    assert fwd <= SN_W * n


# ---------------------------------------------- prefix-filter join
def test_prefix_join_complete_vs_bruteforce(spark):
    """The PPJoin prefix filter's completeness guarantee, asserted:
    docs_prefix_join == brute-force ALL-PAIRS exact shingle-set
    Jaccard >= PP_T on the sf0.001 corpus (same md5-60 hash space) —
    recall is provably 1.0, not sampled."""
    import hashlib
    import re
    from itertools import combinations

    from deja_view_spark.queries_text import PP_T, q_docs_prefix_join
    from deja_view_spark.sources.catalog import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    tok = re.compile(r"[a-z0-9_]+")
    sets: dict[int, frozenset] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = tok.findall(text.lower())
        hs = frozenset(
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[
                    :15
                ],
                16,
            )
            for i in range(len(toks) - 2)
        )
        if hs:
            sets[int(doc_id)] = hs
    want = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if not inter:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if round(j, 4) >= PP_T:
            want[(a, b)] = round(j, 4)
    out = q_docs_prefix_join(spark, "/root/testdata/sf0.001").collect()
    got = {(r.src_doc, r.dst_doc): r.jaccard for r in out}
    assert got == want
    assert want, "sf0.001 should contain at least one planted near-dup"
