"""Self-shipping: make citydata_etl_spark importable on executor Python
workers regardless of how the driver process found it.

The external driver imports __spark_entry__ by path from /root/repo but
builds its own SparkSession from an arbitrary cwd — so executor Python
workers do NOT inherit the sys.path entry that located this package, and
any cloudpickled function that references a module-level symbol (e.g. the
mapInPandas decode body) would fail to unpickle on the worker. The standard
Spark deployment fix: zip the package once and sc.addPyFile it — workers
unpack the archive onto their sys.path. On a real cluster the same call
ships the package to every executor; no-op cost after the first call.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ZIP_PATH: str | None = None
_SHIPPED: set[int] = set()


def _build_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    fd, tmp = tempfile.mkstemp(suffix=".zip", prefix="citydata_pkg_")
    os.close(fd)
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))
    _ZIP_PATH = tmp
    return tmp


def ship_package(spark: SparkSession) -> None:
    """Idempotently register the package archive with this session's
    SparkContext so Python workers can import citydata_etl_spark."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(_build_zip())
    _SHIPPED.add(key)
