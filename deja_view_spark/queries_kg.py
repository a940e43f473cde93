"""KG triple-store query processing — the post-materialization stage
of the knowledge-graph build (driver-checkable, exact-arithmetic
oracles).

The pipeline (plans/pipeline.py) materializes (subj, pred, obj)
triples; a production KG deployment then runs a standard battery of
statistics and pattern queries over that table. This module implements
that battery over a DERIVED triple view built deterministically from
the driver's testdata tables (documents + events), so every query has
a full value-hash DuckDB oracle:

  (doc:<id>,  has_term,    term:<t>)   — t from a fixed 6-term vocab,
                                         token-exact containment
  (doc:<id>,  in_lang,     lang:<l>)
  (doc:<id>,  from_source, src:<s>)
  (user:<id>, <event_type>, item:<k>)  — distinct engagement edges

Queries:

``kg_predicate_stats`` — per-predicate cardinality profile: triple
count, distinct subjects/objects, max subject fanout, and the
functional-predicate flag (max fanout == 1). This is the statistics
table a KG query planner keeps per predicate (selectivity estimation)
and the integrity monitor a build pipeline re-checks per ingest (a
predicate that silently stops being functional is a data bug). Scale
shape: one (pred, subj) partial agg + one per-pred rollup, plus one
distinct-obj agg — all map-side combinable; output is |predicates|
rows.

``kg_star_join`` — SPARQL-style basic-graph-pattern evaluation:
?d has_term 'term:spark' AND ?d has_term 'term:vector' AND
?d in_lang ?l, grouped per binding of ?l. Evaluated the way a
predicate-partitioned triple store does it: constant-bound patterns
become filtered scans (Catalyst folds the pred literal into each
union branch and prunes non-matching branches to empty relations),
joined on the shared subject variable. At 100x the two bound-pattern
sides are the small sides (one row per matching doc) and broadcast;
the join key is the subject, never the full triple.

``kg_characteristic_sets`` — Neumann & Moerkotte's characteristic
sets (ICDE 2011): group subjects by their exact set of emitted
predicates, count entities and triples per set. THE published RDF
statistic for star-query cardinality estimation, and simultaneously
the KG schema-discovery report (each row is an inferred entity
class: docs that mention vocab terms vs docs that don't; users per
combination of event types). Scale: one (subj) agg building the
sorted predicate set, one agg over set strings — both shuffles carry
one fixed-width row per subject, not per triple.

``kg_degree_topk`` — top-25 entities by total degree (subject role +
object role). The super-node detector: the entities this query
surfaces are exactly the join keys that need salting / AQE skew
splitting in every downstream traversal (hot items in the engagement
graph, ubiquitous vocab terms). Two partial-agg degree counts and a
full-outer merge on entity id; output is 25 rows.

Reference parity: the reference materializes its duplicate graph in
Chroma and answers only fixed lookups (github_similarity_service.py
find_similar / find_all_duplicates); these four queries are the
standard triple-table analytics a real KG deployment adds on top —
cited in SURVEY.md §2 as the round-3 KG-analytics extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.sources.catalog import load_table

# fixed vocab for has_term edges (token-exact containment, both engines)
KG_VOCAB = ("spark", "vector", "hash", "merge", "stream", "window")
STAR_TERM_A = "term:spark"
STAR_TERM_B = "term:vector"
DEGREE_TOP_K = 25


def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived triple view (see module docstring). All-JVM column
    expressions; the event branch dedupes engagement edges exactly as
    operators/triples.py dedupes mention edges."""
    docs = load_table(spark, sf_dir, "documents")
    doc_subj = F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))
    vocab_arr = F.array(*[F.lit(t) for t in KG_VOCAB])
    term = docs.select(
        doc_subj.alias("subj"),
        F.lit("has_term").alias("pred"),
        F.explode(
            F.array_intersect(F.array_distinct(F.split("text", " ")), vocab_arr)
        ).alias("t"),
    ).select("subj", "pred", F.concat(F.lit("term:"), F.col("t")).alias("obj"))
    lang = docs.select(
        doc_subj.alias("subj"),
        F.lit("in_lang").alias("pred"),
        F.concat(F.lit("lang:"), F.col("lang")).alias("obj"),
    )
    src = docs.select(
        doc_subj.alias("subj"),
        F.lit("from_source").alias("pred"),
        F.concat(F.lit("src:"), F.col("source")).alias("obj"),
    )
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select(
            F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias(
                "subj"
            ),
            F.col("event_type").alias("pred"),
            F.concat(
                F.lit("item:"),
                F.get_json_object("props", "$.k").cast("long").cast("string"),
            ).alias("obj"),
        )
        .where(F.col("obj").isNotNull())
        .distinct()
    )
    return term.unionByName(lang).unionByName(src).unionByName(act)


SQL_KG_TRIPLES = """
triples AS (
  SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS subj,
         'has_term' AS pred,
         'term:' || v.t AS obj
  FROM documents
  CROSS JOIN (SELECT unnest(['spark','vector','hash','merge','stream',
                             'window']) AS t) v
  WHERE list_contains(str_split(text, ' '), v.t)
  UNION ALL
  SELECT 'doc:' || CAST(doc_id AS VARCHAR), 'in_lang', 'lang:' || lang
  FROM documents
  UNION ALL
  SELECT 'doc:' || CAST(doc_id AS VARCHAR), 'from_source',
         'src:' || source
  FROM documents
  UNION ALL
  SELECT DISTINCT 'user:' || CAST(user_id AS VARCHAR), event_type,
         'item:' || CAST(CAST(json_extract_string(props, '$.k')
                              AS BIGINT) AS VARCHAR)
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL)
"""


# ------------------------------------------------- predicate profile
def q_kg_predicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    fan = t.groupBy("pred", "subj").agg(F.count("*").alias("fanout"))
    per_pred = fan.groupBy("pred").agg(
        F.sum("fanout").alias("n_triples"),
        F.count("*").alias("n_subj"),
        F.max("fanout").alias("max_fanout"),
    )
    nobj = t.groupBy("pred").agg(F.countDistinct("obj").alias("n_obj"))
    return (
        per_pred.join(F.broadcast(nobj), "pred")
        .select(
            "pred",
            "n_triples",
            "n_subj",
            "n_obj",
            "max_fanout",
            (F.col("max_fanout") == 1).alias("functional"),
        )
        .orderBy("pred")
    )


ORACLE_KG_PREDICATE_STATS = f"""
WITH {SQL_KG_TRIPLES},
fan AS (
  SELECT pred, subj, count(*) AS fanout FROM triples GROUP BY pred, subj),
per_pred AS (
  SELECT pred, CAST(sum(fanout) AS BIGINT) AS n_triples,
         count(*) AS n_subj, CAST(max(fanout) AS BIGINT) AS max_fanout
  FROM fan GROUP BY pred),
nobj AS (
  SELECT pred, count(DISTINCT obj) AS n_obj FROM triples GROUP BY pred)
SELECT pred, n_triples, n_subj, n_obj, max_fanout,
       max_fanout = 1 AS functional
FROM per_pred JOIN nobj USING (pred)
ORDER BY pred
"""


# ------------------------------------------- star-join BGP evaluation
def q_kg_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    p1 = t.where(
        (F.col("pred") == "has_term") & (F.col("obj") == STAR_TERM_A)
    ).select("subj")
    p2 = t.where(
        (F.col("pred") == "has_term") & (F.col("obj") == STAR_TERM_B)
    ).select("subj")
    p3 = t.where(F.col("pred") == "in_lang").select(
        "subj", F.col("obj").alias("lang")
    )
    return (
        p1.join(p2, "subj")
        .join(p3, "subj")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


ORACLE_KG_STAR_JOIN = f"""
WITH {SQL_KG_TRIPLES}
SELECT p3.obj AS lang, count(*) AS n_docs
FROM (SELECT subj FROM triples
      WHERE pred = 'has_term' AND obj = '{STAR_TERM_A}') p1
JOIN (SELECT subj FROM triples
      WHERE pred = 'has_term' AND obj = '{STAR_TERM_B}') p2 USING (subj)
JOIN (SELECT subj, obj FROM triples WHERE pred = 'in_lang') p3
     USING (subj)
GROUP BY p3.obj
ORDER BY lang
"""


# ------------------------------------------------ characteristic sets
def q_kg_characteristic_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    cs = t.groupBy("subj").agg(
        F.array_join(F.array_sort(F.collect_set("pred")), ",").alias(
            "charset"
        ),
        F.count("*").alias("nt"),
    )
    return (
        cs.groupBy("charset")
        .agg(F.count("*").alias("n_subjects"), F.sum("nt").alias("n_triples"))
        .select(
            "charset",
            "n_subjects",
            "n_triples",
            F.expr("n_triples * 1000000 DIV n_subjects").alias(
                "avg_fanout_ppm"
            ),
        )
        .orderBy(F.desc("n_subjects"), F.asc("charset"))
    )


ORACLE_KG_CHARACTERISTIC_SETS = f"""
WITH {SQL_KG_TRIPLES},
cs AS (
  SELECT subj,
         array_to_string(list_sort(list_distinct(list(pred))), ',')
           AS charset,
         count(*) AS nt
  FROM triples GROUP BY subj)
SELECT charset, count(*) AS n_subjects,
       CAST(sum(nt) AS BIGINT) AS n_triples,
       CAST(sum(nt) * 1000000 // count(*) AS BIGINT) AS avg_fanout_ppm
FROM cs GROUP BY charset
ORDER BY n_subjects DESC, charset ASC
"""


# ------------------------------------------------ super-node detector
def q_kg_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    out_deg = t.groupBy(F.col("subj").alias("entity")).agg(
        F.count("*").alias("out_deg")
    )
    in_deg = t.groupBy(F.col("obj").alias("entity")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_deg.join(in_deg, "entity", "full_outer")
        .select(
            "entity",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (
                F.coalesce("out_deg", F.lit(0))
                + F.coalesce("in_deg", F.lit(0))
            ).alias("degree"),
        )
        .orderBy(F.desc("degree"), F.asc("entity"))
        .limit(DEGREE_TOP_K)
    )


ORACLE_KG_DEGREE_TOPK = f"""
WITH {SQL_KG_TRIPLES},
o AS (SELECT subj AS entity, count(*) AS out_deg FROM triples
      GROUP BY subj),
i AS (SELECT obj AS entity, count(*) AS in_deg FROM triples
      GROUP BY obj)
SELECT coalesce(o.entity, i.entity) AS entity,
       coalesce(out_deg, 0) AS out_deg,
       coalesce(in_deg, 0) AS in_deg,
       coalesce(out_deg, 0) + coalesce(in_deg, 0) AS degree
FROM o FULL OUTER JOIN i ON o.entity = i.entity
ORDER BY degree DESC, entity ASC
LIMIT {DEGREE_TOP_K}
"""


# ------------------------------------------- predicate co-occurrence
def q_kg_pred_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate co-occurrence matrix: for each unordered predicate
    pair (p1 < p2), the number of subjects emitting BOTH, each side's
    subject count, and the subject-set Jaccard in exact ppm. The
    companion statistic to the characteristic sets: a KG planner uses
    it to estimate star-pattern join selectivity between two bound
    predicates, and schema discovery reads high-Jaccard pairs as
    attributes of the same entity class (in_lang/from_source at 1e6)
    vs near-zero pairs as disjoint classes (doc vs user predicates).
    Scale shape: the (subj, pred) distinct projection is one shuffle
    of fixed-width rows; the self-join is subject-local (a subject
    holds at most |predicates| rows, so pair generation is bounded
    per key like the LSH bucket join); per-pred counts broadcast."""
    t = kg_triples(spark, sf_dir)
    sp = t.select("subj", "pred").distinct()
    a, b = sp.alias("a"), sp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.pred") < F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count("*").alias("n_both"))
    )
    per = sp.groupBy("pred").agg(F.count("*").alias("n_subj"))
    pa = per.select(
        F.col("pred").alias("pred_a"), F.col("n_subj").alias("n_a")
    )
    pb = per.select(
        F.col("pred").alias("pred_b"), F.col("n_subj").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(pa), "pred_a")
        .join(F.broadcast(pb), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("n_both * 1000000 DIV (n_a + n_b - n_both)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy(F.desc("n_both"), F.asc("pred_a"), F.asc("pred_b"))
    )


ORACLE_KG_PRED_COOCCURRENCE = f"""
WITH {SQL_KG_TRIPLES},
sp AS (SELECT DISTINCT subj, pred FROM triples),
pairs AS (
  SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_both
  FROM sp a JOIN sp b ON a.subj = b.subj AND a.pred < b.pred
  GROUP BY a.pred, b.pred),
per AS (SELECT pred, count(*) AS n_subj FROM sp GROUP BY pred)
SELECT pred_a, pred_b, n_both, pa.n_subj AS n_a, pb.n_subj AS n_b,
       CAST(n_both * 1000000 // (pa.n_subj + pb.n_subj - n_both)
            AS BIGINT) AS jaccard_ppm
FROM pairs
JOIN per pa ON pred_a = pa.pred
JOIN per pb ON pred_b = pb.pred
ORDER BY n_both DESC, pred_a ASC, pred_b ASC
"""


# ------------------------------------------------- type signatures
def q_kg_type_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed domain/range signature per predicate: the
    (subject-type, object-type) distribution with exact-ppm share of
    the predicate's triples — entity types read off the id prefix
    (doc:/user:/term:/lang:/src:/item:), the KG convention the
    pipeline's triple ids follow. This is schema induction (RDFS
    domain/range inference from data) AND the integrity monitor's
    baseline: a predicate suddenly emitting a second signature row is
    an extraction bug surfacing as data. Scale shape: prefix parsing
    is map-side, one (pred, types) partial agg, per-pred totals
    re-aggregate from the signature rows (never a second scan) and
    broadcast back; output is |predicates| x |type pairs| rows."""
    t = kg_triples(spark, sf_dir)
    sig = t.select(
        "pred",
        F.split_part(F.col("subj"), F.lit(":"), F.lit(1)).alias(
            "subj_type"
        ),
        F.split_part(F.col("obj"), F.lit(":"), F.lit(1)).alias("obj_type"),
    )
    rows = sig.groupBy("pred", "subj_type", "obj_type").agg(
        F.count("*").alias("n_triples")
    )
    totals = rows.groupBy("pred").agg(
        F.sum("n_triples").alias("pred_total")
    )
    return (
        rows.join(F.broadcast(totals), "pred")
        .select(
            "pred",
            "subj_type",
            "obj_type",
            "n_triples",
            F.expr("n_triples * 1000000 DIV pred_total").alias(
                "share_ppm"
            ),
        )
        .orderBy("pred", F.desc("n_triples"), "subj_type", "obj_type")
    )


ORACLE_KG_TYPE_SIGNATURES = f"""
WITH {SQL_KG_TRIPLES},
sig AS (
  SELECT pred, split_part(subj, ':', 1) AS subj_type,
         split_part(obj, ':', 1) AS obj_type
  FROM triples),
rows_ AS (
  SELECT pred, subj_type, obj_type, count(*) AS n_triples
  FROM sig GROUP BY pred, subj_type, obj_type),
totals AS (
  SELECT pred, CAST(sum(n_triples) AS BIGINT) AS pred_total
  FROM rows_ GROUP BY pred)
SELECT pred, subj_type, obj_type, n_triples,
       CAST(n_triples * 1000000 // pred_total AS BIGINT) AS share_ppm
FROM rows_ JOIN totals USING (pred)
ORDER BY pred, n_triples DESC, subj_type, obj_type
"""


QUERIES = {
    "kg_predicate_stats": q_kg_predicate_stats,
    "kg_star_join": q_kg_star_join,
    "kg_characteristic_sets": q_kg_characteristic_sets,
    "kg_degree_topk": q_kg_degree_topk,
    "kg_pred_cooccurrence": q_kg_pred_cooccurrence,
    "kg_type_signatures": q_kg_type_signatures,
}

ORACLES = {
    "kg_predicate_stats": ORACLE_KG_PREDICATE_STATS,
    "kg_star_join": ORACLE_KG_STAR_JOIN,
    "kg_characteristic_sets": ORACLE_KG_CHARACTERISTIC_SETS,
    "kg_degree_topk": ORACLE_KG_DEGREE_TOPK,
    "kg_pred_cooccurrence": ORACLE_KG_PRED_COOCCURRENCE,
    "kg_type_signatures": ORACLE_KG_TYPE_SIGNATURES,
}


# ------------------------------------------------- WL structural roles
# Weisfeiler-Lehman color refinement over the user↔item engagement
# graph: R rounds of color(v) := md5(color(v) || '|' || sorted multiset
# of neighbor colors), starting from the entity-type partition
# ('user' / 'item'). After R rounds two entities share a color iff
# their R-hop neighborhood trees are isomorphic — the classic
# structural-role / graph-fingerprint primitive (1-WL), used in KG
# construction as a blocking key for structural entity resolution
# (role-equivalent entities are candidate merges even when their
# surface forms differ) and as the node feature GIN-style graph
# models train on. The reference has no structural-role machinery;
# this extends its duplicate-entity linking (semantic similarity)
# with the structural axis — cited in SURVEY.md §2 KG extension.
#
# Determinism / oracle story: the refinement is pure string hashing —
# md5 over '|'-joined sorted neighbor-color lists — so Spark and
# DuckDB produce bit-identical colors (both emit lowercase-hex md5 and
# both sort with binary collation over ASCII hex strings). No floats
# anywhere.
#
# Scale shape: each round is ONE groupBy(dst-side entity) building the
# sorted neighbor-color list + ONE join back to the color table — the
# canonical message-passing round (same join+agg skeleton as
# events_pagerank, which localCheckpoints; at WL_ROUNDS=3 the lineage
# is linear and short enough to skip that). The collect_list per
# entity is bounded by the entity's degree; at 100 TB the known hubs
# (kg_degree_topk surfaces them) would switch the multiset encoding
# to a commutative per-neighbor hash-sum — noted, not needed at this
# corpus. Output is the top-WL_TOP role classes under a total order.

WL_ROUNDS = 3
WL_TOP = 100


def q_kg_wl_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pair = (
        ev.select(
            F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias(
                "u"
            ),
            F.concat(
                F.lit("item:"),
                F.get_json_object("props", "$.k").cast("long").cast("string"),
            ).alias("i"),
        )
        .where(F.col("i").isNotNull())
        .distinct()
    )
    edges = pair.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("i").alias("dst")),
                F.struct(F.col("i").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    colors = (
        edges.select(F.col("src").alias("entity"))
        .distinct()
        .select("entity", F.substring_index("entity", ":", 1).alias("color"))
    )
    for _ in range(WL_ROUNDS):
        nb = (
            edges.join(
                colors.withColumnRenamed("entity", "dst"), "dst"
            )
            .groupBy("src")
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("color")), ","
                ).alias("nb")
            )
            .withColumnRenamed("src", "entity")
        )
        colors = colors.join(nb, "entity").select(
            "entity", F.md5(F.concat_ws("|", "color", "nb")).alias("color")
        )
    return (
        colors.withColumn(
            "is_user", F.col("entity").startswith("user:").cast("long")
        )
        .groupBy("color")
        .agg(
            F.count("*").alias("n_entities"),
            F.sum("is_user").alias("n_users"),
            F.min("entity").alias("min_entity"),
        )
        .orderBy(F.desc("n_entities"), F.asc("color"))
        .limit(WL_TOP)
    )


def _wl_oracle() -> str:
    rounds = []
    for r in range(1, WL_ROUNDS + 1):
        prev = f"c{r - 1}"
        rounds.append(
            f"""n{r} AS (
  SELECT e.src AS entity, string_agg(c.color, ',' ORDER BY c.color) AS nb
  FROM edges e JOIN {prev} c ON e.dst = c.entity GROUP BY e.src),
c{r} AS (
  SELECT n{r}.entity, md5(p.color || '|' || n{r}.nb) AS color
  FROM n{r} JOIN {prev} p USING (entity))"""
        )
    chain = ",\n".join(rounds)
    return f"""
WITH pair AS (
  SELECT DISTINCT 'user:' || CAST(user_id AS VARCHAR) AS u,
         'item:' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                         AS VARCHAR) AS i
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
edges AS (SELECT u AS src, i AS dst FROM pair
          UNION ALL SELECT i, u FROM pair),
c0 AS (SELECT DISTINCT src AS entity, split_part(src, ':', 1) AS color
       FROM edges),
{chain}
SELECT color, count(*) AS n_entities,
       CAST(sum(CASE WHEN entity LIKE 'user:%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_users,
       min(entity) AS min_entity
FROM c{WL_ROUNDS}
GROUP BY color
ORDER BY n_entities DESC, color ASC
LIMIT {WL_TOP}
"""


QUERIES["kg_wl_colors"] = q_kg_wl_colors
ORACLES["kg_wl_colors"] = _wl_oracle()


# --------------------------------------------- predicate-drift alarm
# Week-over-week drift of the KG build's predicate mix — the ingest
# monitor a production triple pipeline runs on every load: a predicate
# whose share of emitted assertions jumps means an upstream extractor
# or source changed (new event taxonomy, broken parser, source
# outage). Works on the time-carrying branch of the triple stream
# (event-derived assertions, counted per emission — ingest
# monitoring, deliberately NOT deduped like kg_triples' edge view).
# Shares are exact ppm integers; drift is the share delta vs the
# predicate's PREVIOUS OBSERVED week (lag over the per-pred weekly
# series — gap weeks compare across the gap, identically in both
# engines); first observations carry no drift row.
#
# Scale shape: one column-pruned event scan folding to a
# (weeks × |predicates|)-row table in one partial agg; the weekly
# totals join is a broadcast of |weeks| rows; the lag window sorts
# the metadata-sized weekly series, never events.


def q_kg_predicate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    tr = ev.select(
        F.date_trunc("week", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("week"),
        F.col("event_type").alias("pred"),
        F.get_json_object("props", "$.k").alias("k"),
    ).where(F.col("k").isNotNull())
    wk = tr.groupBy("week", "pred").agg(F.count("*").alias("n_triples"))
    tot = wk.groupBy("week").agg(F.sum("n_triples").alias("week_total"))
    shares = wk.join(F.broadcast(tot), "week").withColumn(
        "share_ppm", F.expr("n_triples * 1000000 DIV week_total")
    )
    w = Window.partitionBy("pred").orderBy("week")
    return (
        shares.withColumn("prev_share_ppm", F.lag("share_ppm").over(w))
        .where(F.col("prev_share_ppm").isNotNull())
        .select(
            "week",
            "pred",
            "n_triples",
            "share_ppm",
            "prev_share_ppm",
            (F.col("share_ppm") - F.col("prev_share_ppm")).alias(
                "drift_ppm"
            ),
        )
        .orderBy("week", "pred")
    )


ORACLE_KG_PREDICATE_DRIFT = """
WITH tr AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         event_type AS pred
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
wk AS (SELECT week, pred, count(*) AS n_triples FROM tr GROUP BY 1, 2),
tot AS (SELECT week, CAST(sum(n_triples) AS BIGINT) AS week_total
        FROM wk GROUP BY week),
shares AS (
  SELECT wk.week, wk.pred, wk.n_triples,
         wk.n_triples * 1000000 // t.week_total AS share_ppm
  FROM wk JOIN tot t USING (week)),
lagged AS (
  SELECT week, pred, n_triples, share_ppm,
         lag(share_ppm) OVER (PARTITION BY pred ORDER BY week)
           AS prev_share_ppm
  FROM shares)
SELECT week, pred, n_triples, share_ppm, prev_share_ppm,
       share_ppm - prev_share_ppm AS drift_ppm
FROM lagged
WHERE prev_share_ppm IS NOT NULL
ORDER BY week, pred
"""


QUERIES["kg_predicate_drift"] = q_kg_predicate_drift
ORACLES["kg_predicate_drift"] = ORACLE_KG_PREDICATE_DRIFT


# ---------------------------------------------- merge-integrity audit
# Attribute-consistency audit of the near-duplicate clusters the
# canonicalization stage is about to merge — the link-integrity QA
# gate of entity resolution: a cluster whose members disagree on an
# identifying attribute (language, source) is a probable FALSE MERGE
# (the LSH/Jaccard blocker linked lookalikes that are not the same
# entity), exactly the class of error P/R metrics computed on pair
# samples miss. Reuses the registered cluster assignment
# (docs_duplicate_clusters is called UNCHANGED, the composition
# pattern of docs_dedup_method_eval) joined back to document
# attributes; per cluster it emits member/attribute cardinalities,
# the sorted distinct language list, and the mixed-language flag.
#
# Scale shape: the cluster table carries one fixed-width row per
# CLUSTERED doc (near-dup members only, a small fraction of the
# corpus); one join to the pruned documents scan, one partial-agg
# rollup per cluster, top-MERGE_AUDIT_TOP under a total order.

MERGE_AUDIT_TOP = 50


def q_kg_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.queries_graph import q_docs_duplicate_clusters

    clusters = q_docs_duplicate_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    joined = clusters.join(docs, "doc_id")
    per = joined.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.array_join(
            F.sort_array(F.array_distinct(F.collect_list("lang"))), ","
        ).alias("langs"),
    )
    return (
        per.select(
            "cluster_id",
            "n_members",
            "n_langs",
            "n_sources",
            "langs",
            (F.col("n_langs") > 1).cast("long").alias("mixed_lang"),
        )
        .orderBy(F.desc("n_members"), F.asc("cluster_id"))
        .limit(MERGE_AUDIT_TOP)
    )


def _merge_audit_oracle() -> str:
    from deja_view_spark.queries_graph import ORACLE_DOCS_DUPLICATE_CLUSTERS

    return f"""
WITH clusters AS (
  SELECT doc_id, cluster_id FROM ({ORACLE_DOCS_DUPLICATE_CLUSTERS})),
joined AS (
  SELECT c.cluster_id, d.lang, d.source
  FROM clusters c JOIN documents d USING (doc_id)),
langs AS (
  SELECT cluster_id, string_agg(lang, ',' ORDER BY lang) AS langs
  FROM (SELECT DISTINCT cluster_id, lang FROM joined)
  GROUP BY cluster_id),
per AS (
  SELECT cluster_id, count(*) AS n_members,
         count(DISTINCT lang) AS n_langs,
         count(DISTINCT source) AS n_sources
  FROM joined GROUP BY cluster_id)
SELECT p.cluster_id, p.n_members, p.n_langs, p.n_sources, l.langs,
       CAST(CASE WHEN p.n_langs > 1 THEN 1 ELSE 0 END AS BIGINT)
         AS mixed_lang
FROM per p JOIN langs l USING (cluster_id)
ORDER BY n_members DESC, cluster_id ASC
LIMIT {MERGE_AUDIT_TOP}
"""


QUERIES["kg_merge_audit"] = q_kg_merge_audit
ORACLES["kg_merge_audit"] = _merge_audit_oracle()


# ------------------------------------------------- walk-count census
# Length-k walk counts between entity TYPES (k = 1..WALK_CENSUS_K)
# over the triple graph traversed in BOTH directions (each triple
# contributes subj→obj and its inverse obj→subj — exactly the
# traversal space of SPARQL property paths with ^inverse steps; the
# raw subj→obj graph here is bipartite, so forward-only chains of
# length ≥ 2 do not exist) — the join-fanout statistic an RDF / KG
# query planner needs to size multi-hop traversals before running
# them: n_walks(k, A, B) IS the expected intermediate-result
# cardinality of a k-hop path pattern anchored on type A ending in
# type B (kg_characteristic_sets prices star queries; this prices
# CHAINS, immediate backtracks included — walks, not simple paths,
# are what join cardinality follows). Exact BIGINT counts.
#
# Scale shape: the state is one (start_type, entity, count) row per
# reachable entity per start type — bounded by |entities| × |types|,
# NOT by walk multiplicity; each round is ONE equi-join on the
# current frontier + ONE partial-agg regroup (the same message-
# passing skeleton as PageRank, with counts instead of mass). At
# k=WALK_CENSUS_K the per-entity counts stay well inside BIGINT at
# any corpus this engine targets (hub-degree^(k-1) scaling is the
# reason the census caps at k=3; a deeper census would switch to
# log-bucketed counts).

WALK_CENSUS_K = 3


def q_kg_walk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = kg_triples(spark, sf_dir).select("subj", "obj")
    tri = fwd.unionByName(
        fwd.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    )
    etype = lambda c: F.substring_index(c, ":", 1)  # noqa: E731
    state = tri.select(
        etype(F.col("subj")).alias("from_type"), F.col("obj").alias("v")
    ).groupBy("from_type", "v").agg(F.count("*").alias("n"))
    census = []
    for k in range(1, WALK_CENSUS_K + 1):
        census.append(
            state.groupBy(
                "from_type", etype(F.col("v")).alias("to_type")
            )
            .agg(F.sum("n").alias("n_walks"))
            .select(F.lit(k).alias("k"), "from_type", "to_type", "n_walks")
        )
        if k < WALK_CENSUS_K:
            state = (
                state.join(tri, state.v == tri.subj)
                .groupBy("from_type", F.col("obj").alias("v2"))
                .agg(F.sum("n").alias("n"))
                .withColumnRenamed("v2", "v")
            )
    out = census[0]
    for c in census[1:]:
        out = out.unionByName(c)
    return out.orderBy("k", "from_type", "to_type")


def _walk_census_oracle() -> str:
    states = ["""
bidi AS (
  SELECT subj, obj FROM triples
  UNION ALL SELECT obj, subj FROM triples),
s1 AS (
  SELECT split_part(subj, ':', 1) AS from_type, obj AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM bidi GROUP BY 1, 2)"""]
    for k in range(2, WALK_CENSUS_K + 1):
        states.append(f"""
s{k} AS (
  SELECT s.from_type, t.obj AS v, CAST(sum(s.n) AS BIGINT) AS n
  FROM s{k - 1} s JOIN bidi t ON s.v = t.subj
  GROUP BY 1, 2)""")
    census = "\nUNION ALL\n".join(
        f"""SELECT {k} AS k, from_type, split_part(v, ':', 1) AS to_type,
       CAST(sum(n) AS BIGINT) AS n_walks
FROM s{k} GROUP BY 1, 2, 3"""
        for k in range(1, WALK_CENSUS_K + 1)
    )
    return f"""
WITH {SQL_KG_TRIPLES.strip().lstrip()},
{",".join(states)}
SELECT k, from_type, to_type, n_walks FROM ({census})
ORDER BY k, from_type, to_type
"""


QUERIES["kg_walk_census"] = q_kg_walk_census
ORACLES["kg_walk_census"] = _walk_census_oracle()


# --------------------------------------- inverse-functional violations
# Dirty-key detector for entity linking: an inverse-functional
# predicate (one object should identify at most one subject — the
# email / SSN / content-hash class of keys) whose objects fan out to
# MANY subjects is exactly the record-linkage trap that collapses
# distinct entities into one (the "bob@gmail.com shared by 4 000
# accounts" failure). The query profiles obj→subject fanout per
# predicate and surfaces the top offending objects with their share
# of the predicate's assertions — the blocklist a linking stage
# feeds its "do not join on this value" filter. Complements
# kg_predicate_stats (which profiles the subject→object direction).
#
# Scale shape: one (pred, obj) partial agg over the triple scan
# (distinct-subject counts — assertions are already deduped per
# (subj, pred, obj) by construction of the derived view, so count(*)
# would equal count(DISTINCT subj); the DISTINCT spelling keeps the
# semantic contract explicit), a broadcast of the |preds|-row totals,
# TakeOrdered top-IFP_TOP finish.

IFP_TOP = 25


def q_kg_ifp_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = kg_triples(spark, sf_dir)
    fan = tri.groupBy("pred", "obj").agg(
        F.countDistinct("subj").alias("n_subjs")
    )
    totals = tri.groupBy("pred").agg(F.count("*").alias("pred_triples"))
    return (
        fan.where(F.col("n_subjs") > 1)
        .join(F.broadcast(totals), "pred")
        .select(
            "pred",
            "obj",
            "n_subjs",
            "pred_triples",
            F.expr("n_subjs * 1000000 DIV pred_triples").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("n_subjs"), F.asc("pred"), F.asc("obj"))
        .limit(IFP_TOP)
    )


ORACLE_KG_IFP_VIOLATIONS = f"""
WITH {SQL_KG_TRIPLES.strip().lstrip()},
fan AS (
  SELECT pred, obj, count(DISTINCT subj) AS n_subjs
  FROM triples GROUP BY 1, 2),
totals AS (
  SELECT pred, count(*) AS pred_triples FROM triples GROUP BY pred)
SELECT f.pred, f.obj, f.n_subjs, t.pred_triples,
       CAST(f.n_subjs * 1000000 // t.pred_triples AS BIGINT)
         AS share_ppm
FROM fan f JOIN totals t USING (pred)
WHERE f.n_subjs > 1
ORDER BY n_subjs DESC, pred ASC, obj ASC
LIMIT {IFP_TOP}
"""


QUERIES["kg_ifp_violations"] = q_kg_ifp_violations
ORACLES["kg_ifp_violations"] = ORACLE_KG_IFP_VIOLATIONS


# ------------------------------------------ planner-estimate QA table
# System-R join-cardinality estimates vs EXACT join cardinalities for
# every predicate pair joined on the shared object — the calibration
# report for the statistics this module maintains
# (kg_predicate_stats, kg_characteristic_sets, kg_walk_census): a
# planner is only as good as its estimator, and this table quantifies
# the independence-assumption error |R ⋈ S| ≈ |R|·|S| /
# max(V(R,o), V(S,o)) against ground truth, per pair. Self-pairs
# (p ⋈ p) are included — that row is exactly the candidate-count
# estimate vs reality of a self-join blocker (the LSH sizing
# question). err_ppm = |est − actual| · 1e6 / actual, all BIGINT.
#
# Scale shape: actual join cardinality is computed WITHOUT
# materializing the join — Σ_o fan1(o)·fan2(o) over the (pred, obj)
# fanout aggregate (one partial agg over the triple scan + one
# self-equi-join of the |preds|·|objs|-row fanout table on obj, tiny
# relative to the triple corpus); estimates ride in on a broadcast
# |preds|-row stats table. Output is |pred-pairs-sharing-objects|
# rows.


def q_kg_join_cardinality_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = kg_triples(spark, sf_dir)
    fan = tri.groupBy("pred", "obj").agg(F.count("*").alias("f"))
    stats = fan.groupBy("pred").agg(
        F.sum("f").alias("n"), F.count("*").alias("v")
    )
    a = fan.select(
        F.col("pred").alias("p1"), "obj", F.col("f").alias("f1")
    )
    b = fan.select(
        F.col("pred").alias("p2"), "obj", F.col("f").alias("f2")
    )
    actual = (
        a.join(b, "obj")
        .groupBy("p1", "p2")
        .agg(F.sum(F.col("f1") * F.col("f2")).alias("actual"))
    )
    s1 = stats.select(
        F.col("pred").alias("p1"),
        F.col("n").alias("n1"),
        F.col("v").alias("v1"),
    )
    s2 = stats.select(
        F.col("pred").alias("p2"),
        F.col("n").alias("n2"),
        F.col("v").alias("v2"),
    )
    return (
        actual.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .select(
            "p1",
            "p2",
            "n1",
            "n2",
            "v1",
            "v2",
            # n1*n2 can pass 2^63 at web-scale predicate cardinalities;
            # widen the product to DECIMAL(38,0) (DuckDB twin: HUGEINT)
            # so both engines stay exact instead of Spark wrapping
            # silently where DuckDB raises. The quotient itself can
            # ALSO pass 2^63 (Spark IntegralDivide -> NULL, DuckDB
            # CAST -> error), so clamp to BIGINT max with the overflow
            # test done on the exact product side (n1*n2 > max*den —
            # both operands fit DECIMAL(38,0): <= 8.5e37) instead of
            # dividing in lossy wide-decimal space.
            F.expr(
                "CASE WHEN CAST(n1 AS DECIMAL(38,0)) * n2"
                " > CAST(9223372036854775807 AS DECIMAL(38,0))"
                "   * greatest(v1, v2)"
                " THEN CAST(9223372036854775807 AS BIGINT)"
                " ELSE CAST(n1 AS DECIMAL(38,0)) * n2"
                "      DIV greatest(v1, v2) END"
            ).alias("est_sysr"),
            "actual",
        )
        .select(
            "p1",
            "p2",
            "n1",
            "n2",
            "v1",
            "v2",
            "est_sysr",
            "actual",
            # err_ppm has the same exposure (est/actual * 1e6 can pass
            # 2^63): clamp with the same exact product-side guard.
            F.expr(
                "CASE WHEN CAST(abs(CAST(est_sysr AS DECIMAL(38,0))"
                "               - actual) AS DECIMAL(38,0)) * 1000000"
                " > CAST(9223372036854775807 AS DECIMAL(38,0)) * actual"
                " THEN CAST(9223372036854775807 AS BIGINT)"
                " ELSE CAST(abs(CAST(est_sysr AS DECIMAL(38,0))"
                "          - actual) AS DECIMAL(38,0))"
                "      * 1000000 DIV actual END"
            ).alias("err_ppm"),
        )
        .orderBy("p1", "p2")
    )


ORACLE_KG_JOIN_CARDINALITY_QA = f"""
WITH {SQL_KG_TRIPLES},
fan AS (
  SELECT pred, obj, CAST(count(*) AS BIGINT) AS f
  FROM triples GROUP BY 1, 2),
stats AS (
  SELECT pred, CAST(sum(f) AS BIGINT) AS n, count(*) AS v
  FROM fan GROUP BY pred),
actual AS (
  SELECT a.pred AS p1, b.pred AS p2,
         CAST(sum(a.f * b.f) AS BIGINT) AS actual
  FROM fan a JOIN fan b USING (obj)
  GROUP BY 1, 2),
est AS (
  SELECT ac.p1, ac.p2, s1.n AS n1, s2.n AS n2, s1.v AS v1, s2.v AS v2,
         CASE WHEN CAST(s1.n AS HUGEINT) * s2.n
                   > CAST(9223372036854775807 AS HUGEINT)
                     * greatest(s1.v, s2.v)
              THEN CAST(9223372036854775807 AS BIGINT)
              ELSE CAST(CAST(s1.n AS HUGEINT) * s2.n
                        // greatest(s1.v, s2.v) AS BIGINT) END
           AS est_sysr,
         ac.actual
  FROM actual ac
  JOIN stats s1 ON ac.p1 = s1.pred
  JOIN stats s2 ON ac.p2 = s2.pred)
SELECT p1, p2, n1, n2, v1, v2, est_sysr, actual,
       CASE WHEN abs(CAST(est_sysr AS HUGEINT) - actual) * 1000000
                 > CAST(9223372036854775807 AS HUGEINT) * actual
            THEN CAST(9223372036854775807 AS BIGINT)
            ELSE CAST(abs(CAST(est_sysr AS HUGEINT) - actual)
                      * 1000000 // actual AS BIGINT) END AS err_ppm
FROM est
ORDER BY p1, p2
"""


QUERIES["kg_join_cardinality_qa"] = q_kg_join_cardinality_qa
ORACLES["kg_join_cardinality_qa"] = ORACLE_KG_JOIN_CARDINALITY_QA


# -------------------------------------------- degree histogram by type
# Log₂-bucketed total-degree histogram per entity type over the triple
# graph (subject role + object role) — the distribution behind
# kg_degree_topk's point list: the planner reads the TAIL (how many
# type-X entities sit in the 2^k+ bucket → how many join keys need
# salting), the schema monitor reads the SHAPE (a type whose histogram
# shifts a bucket between ingests changed character). Buckets are
# exact integer floor(log₂ degree) computed via bit length — no float
# log on the comparison path; both engines derive the bucket from the
# BIGINT degree with the same integer recurrence.
#
# Scale shape: two partial-agg degree counts (subject side, object
# side) merged with a full-outer on entity id — the kg_degree_topk
# skeleton — then one (type, bucket) census. Output is
# |types| × |buckets| rows.


def _bitlen_bucket(col):
    # floor(log2(d)) for BIGINT d >= 1, as a chain of range tests —
    # identical semantics in both engines, no floating log
    expr = F.lit(0)
    for b in range(1, 40):
        expr = F.when(col >= (1 << b), b).otherwise(expr)
    return expr


def q_kg_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    ends = t.select(F.col("subj").alias("entity")).unionByName(
        t.select(F.col("obj").alias("entity"))
    )
    deg = ends.groupBy("entity").agg(F.count("*").alias("deg"))
    typed = deg.select(
        F.substring_index("entity", ":", 1).alias("entity_type"),
        "deg",
    )
    return (
        typed.select(
            "entity_type", _bitlen_bucket(F.col("deg")).alias("bucket")
        )
        .groupBy("entity_type", "bucket")
        .agg(F.count("*").alias("n_entities"))
        .select(
            "entity_type",
            "bucket",
            F.expr("CAST(1 AS BIGINT) << bucket").alias("deg_min"),
            "n_entities",
        )
        .orderBy("entity_type", "bucket")
    )


def _degree_histogram_oracle() -> str:
    bucket = "CAST(floor(log2(deg)) AS BIGINT)"
    # DuckDB's log2 is float — use the same integer range-test chain
    cases = " ".join(
        f"WHEN deg >= {1 << b} THEN {b}"
        for b in range(39, 0, -1)
    )
    bucket = f"(CASE {cases} ELSE 0 END)"
    return f"""
WITH {SQL_KG_TRIPLES},
ends AS (
  SELECT subj AS entity FROM triples
  UNION ALL SELECT obj FROM triples),
deg AS (SELECT entity, count(*) AS deg FROM ends GROUP BY entity),
typed AS (
  SELECT split_part(entity, ':', 1) AS entity_type,
         {bucket} AS bucket
  FROM deg)
SELECT entity_type, bucket,
       CAST(1 AS BIGINT) << bucket AS deg_min,
       count(*) AS n_entities
FROM typed
GROUP BY 1, 2
ORDER BY entity_type, bucket
"""


QUERIES["kg_degree_histogram"] = q_kg_degree_histogram
ORACLES["kg_degree_histogram"] = _degree_histogram_oracle()


# -------------------------------------------------- triple novelty
# New-knowledge rate of the KG ingest: per week, how many DISTINCT
# assertions (subj, pred, obj) were active, how many were seen for
# the FIRST time, and the novelty share in ppm — the companion to
# kg_predicate_drift (that monitors the MIX, this monitors how much
# of the stream is new vs re-assertion; a crawl re-reading the same
# sources shows collapsing novelty long before volume moves). Runs on
# the time-carrying event-derived assertion stream; "first seen" is
# the min week over each distinct triple (one partial agg — the
# first-touch primitive shared with events_cumulative_reach, at
# triple grain). Also emits the running cumulative distinct-triple
# count (KG size over time).
#
# Scale shape: one distinct over (week, triple), one min-week partial
# agg per distinct triple, two per-week censuses joined on the
# |weeks|-sized table, one running-sum window over weeks.


def q_kg_triple_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    tr = (
        ev.select(
            F.date_trunc("week", F.col("ts").cast("timestamp"))
            .cast("date")
            .alias("week"),
            F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias(
                "subj"
            ),
            F.col("event_type").alias("pred"),
            F.concat(
                F.lit("item:"),
                F.get_json_object("props", "$.k").cast("long").cast("string"),
            ).alias("obj"),
        )
        .where(F.col("obj").isNotNull())
        .distinct()
    )
    active = tr.groupBy("week").agg(F.count("*").alias("n_active"))
    first = tr.groupBy("subj", "pred", "obj").agg(
        F.min("week").alias("week")
    )
    new = first.groupBy("week").agg(F.count("*").alias("n_new"))
    w = W.orderBy("week").rowsBetween(W.unboundedPreceding, 0)
    return (
        active.join(new, "week", "left")
        .select(
            "week",
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_triples", F.sum("n_new").over(w))
        .withColumn(
            "novelty_ppm", F.expr("n_new * 1000000 DIV n_active")
        )
        .orderBy("week")
    )


ORACLE_KG_TRIPLE_NOVELTY = """
WITH tr AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week,
         'user:' || CAST(user_id AS VARCHAR) AS subj,
         event_type AS pred,
         'item:' || CAST(CAST(json_extract_string(props, '$.k')
                              AS BIGINT) AS VARCHAR) AS obj
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
active AS (SELECT week, count(*) AS n_active FROM tr GROUP BY week),
first_ AS (
  SELECT subj, pred, obj, min(week) AS week FROM tr GROUP BY 1, 2, 3),
new_ AS (SELECT week, count(*) AS n_new FROM first_ GROUP BY week),
joined AS (
  SELECT a.week, a.n_active,
         CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new
  FROM active a LEFT JOIN new_ n USING (week))
SELECT week, n_active, n_new,
       CAST(sum(n_new) OVER (ORDER BY week
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_triples,
       n_new * 1000000 // n_active AS novelty_ppm
FROM joined
ORDER BY week
"""


QUERIES["kg_triple_novelty"] = q_kg_triple_novelty
ORACLES["kg_triple_novelty"] = ORACLE_KG_TRIPLE_NOVELTY


# ----------------------------------------------------- role-mix census
# Subject/object role census per entity type: how many entities of
# each type appear only as subjects, only as objects, or in BOTH
# roles — the KG-hygiene profile that separates identity-bearing
# entities (docs, users: subjects) from value entities (terms, langs:
# objects) and flags role-mixing (an entity type that starts
# appearing on both sides usually means an extractor emitted
# malformed triples, or the schema genuinely has a hierarchy — either
# way the planner and the integrity monitor need to know). The
# quantitative basis for kg_walk_census's bipartite observation.
#
# Scale shape: one union of two pruned projections with role flags,
# one per-entity max-flag partial agg, one per-type census.


def q_kg_role_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kg_triples(spark, sf_dir)
    roles = t.select(
        F.col("subj").alias("entity"),
        F.lit(1).alias("s"),
        F.lit(0).alias("o"),
    ).unionByName(
        t.select(
            F.col("obj").alias("entity"),
            F.lit(0).alias("s"),
            F.lit(1).alias("o"),
        )
    )
    per = roles.groupBy("entity").agg(
        F.max("s").alias("is_subj"), F.max("o").alias("is_obj")
    )
    return (
        per.groupBy(
            F.substring_index("entity", ":", 1).alias("entity_type")
        )
        .agg(
            F.count("*").alias("n_entities"),
            F.sum(
                ((F.col("is_subj") == 1) & (F.col("is_obj") == 0)).cast(
                    "long"
                )
            ).alias("n_subj_only"),
            F.sum(
                ((F.col("is_subj") == 0) & (F.col("is_obj") == 1)).cast(
                    "long"
                )
            ).alias("n_obj_only"),
            F.sum(
                ((F.col("is_subj") == 1) & (F.col("is_obj") == 1)).cast(
                    "long"
                )
            ).alias("n_both"),
        )
        .orderBy("entity_type")
    )


ORACLE_KG_ROLE_MIX = f"""
WITH {SQL_KG_TRIPLES},
roles AS (
  SELECT subj AS entity, 1 AS s, 0 AS o FROM triples
  UNION ALL
  SELECT obj, 0, 1 FROM triples),
per AS (
  SELECT entity, max(s) AS is_subj, max(o) AS is_obj
  FROM roles GROUP BY entity)
SELECT split_part(entity, ':', 1) AS entity_type,
       count(*) AS n_entities,
       CAST(sum(CASE WHEN is_subj = 1 AND is_obj = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_subj_only,
       CAST(sum(CASE WHEN is_subj = 0 AND is_obj = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_obj_only,
       CAST(sum(CASE WHEN is_subj = 1 AND is_obj = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_both
FROM per
GROUP BY 1
ORDER BY entity_type
"""


QUERIES["kg_role_mix"] = q_kg_role_mix
ORACLES["kg_role_mix"] = ORACLE_KG_ROLE_MIX
