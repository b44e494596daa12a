"""Workers must import the package regardless of the driver's cwd.

Closures shipped to Python workers reference module-level names by
module path; a driver launched outside the repo (sys.path insert only,
like the verification harness) must still run every UDF-bearing
operator. Pinned via a subprocess whose cwd is a tempdir — before
shipping.ensure_workers_can_import, this died with
ModuleNotFoundError in the worker.
"""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[2]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from spark_sorted_spark.queries import QUERIES
sf = "/root/testdata/sf0.001"
# one stream-tier query (iter_key_runs by module ref) and one
# mapInPandas query (decode_stub by module ref)
assert QUERIES["sessionize_stream"](spark, sf).count() > 0
assert QUERIES["multimodal_features"](spark, sf).count() > 0
print("SHIPPING-OK")
"""


def test_worker_imports_from_foreign_cwd(tmp_path):
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SHIPPING-OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
