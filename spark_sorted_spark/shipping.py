"""Make the package importable on executor Python workers.

Closures shipped to workers (mapInPandas/applyInPandas/mapInArrow
functions) reference module-level names — the streaming engine's
``iter_key_runs``, constants in ``queries``, the multimodal
``decode_stub`` — which cloudpickle serializes BY REFERENCE: the
worker must be able to ``import spark_sorted_spark``. That holds when
the driver's working directory or PYTHONPATH exposes the repo (workers
inherit both), but silently breaks for a driver launched from
elsewhere with only a ``sys.path`` insert.

``ensure_workers_can_import`` closes the gap the standard way: zip the
package once per process and ``SparkContext.addPyFile`` it, which
distributes the zip and prepends it to every worker's ``sys.path`` —
the same mechanism spark-submit's ``--py-files`` uses on a real
cluster. Idempotent per SparkContext; a few hundred KB once.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def ensure_workers_can_import(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_spark_sorted_spark_shipped", False):
        return
    import spark_sorted_spark

    pkg_dir = os.path.dirname(os.path.abspath(spark_sorted_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"spark_sorted_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._spark_sorted_spark_shipped = True
