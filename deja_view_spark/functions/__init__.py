"""Column-expression library (the reference's scalar-function surface).

Everything here is pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen friendly, optimizer-transparent. The only Python
UDFs in the engine live in :mod:`deja_view_spark.functions.embedding`
and :mod:`deja_view_spark.functions.hashing` (Arrow-vectorized).
"""

from deja_view_spark.functions.text import (  # noqa: F401
    doc_text,
    doc_id,
    parse_issue_number,
    truncate_body,
    labels_to_csv,
    csv_to_labels,
)
from deja_view_spark.functions.similarity import (  # noqa: F401
    cosine_sim,
    distance_to_similarity,
    similarity_band,
    confidence_bucket,
    clamp01,
)
