"""Package shipping — the ``spark-submit --py-files`` model.

Executors' Python workers don't share the driver's ``sys.path``; on a
real cluster the package is distributed via ``spark-submit --py-files
deja_view_spark.zip`` (north_rule). ``ensure_py_files(spark)`` is the
programmatic equivalent: zip the package once and ``addPyFile`` it to
whatever SparkSession we were handed (the driver harness creates its
own), so every pandas-UDF worker can import ``deja_view_spark``
regardless of the driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[str] = set()


def build_zip(target: str | None = None) -> str:
    """Zip the deja_view_spark package (idempotent per process)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if target is None:
        target = os.path.join(tempfile.gettempdir(), "deja_view_spark_pyfiles.zip")
    if not os.path.exists(target):
        tmp = target + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "deja_view_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp, target)
    return target


def ensure_py_files(spark) -> None:
    """Ship the package to this session's executors (once per session)."""
    key = spark.sparkContext.applicationId
    if key in _shipped:
        return
    spark.sparkContext.addPyFile(build_zip())
    _shipped.add(key)
