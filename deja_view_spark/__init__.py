"""deja_view_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-design of the capabilities of bdougie/deja-view
(semantic issue similarity / duplicate detection / discussion metrics /
release notes) as a distributed, Spark-first KG pipeline:

    source table (repo, path, commit, lang, content)
      -> documents (doc_text templating, sha256 lineage)
      -> embeddings (vectorized pandas-UDF embedder, L2-normalized)
      -> candidate pairs (LSH band self-join, salted for hot-repo skew)
      -> duplicate/similarity triples (exact cosine verify, top-k per src)
      -> canonical entities (connected components)
      -> kg.triples / kg.lineage (partitioned parquet, idempotent, resumable)

Everything is expressed with the DataFrame API so Catalyst handles
predicate pushdown, column pruning, partial aggregation and AQE; Python
only crosses the Arrow boundary in two vectorized UDFs (embed, minhash).

The reference semantics being preserved are cited per-function as
``file:line`` pointers into /root/reference (bdougie/deja-view).
"""

__version__ = "0.1.0"

from deja_view_spark.session import get_spark  # noqa: F401
