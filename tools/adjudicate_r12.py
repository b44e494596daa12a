"""Round-12 perf adjudications (VERDICT r11 items 2 + 3).

b27 auto-depth anomaly: at 10x data the auto-depth single-table LSH
index (auto_planes -> 10 planes) measured reproducibly SLOWER than a
fixed-8 index AND returned fewer near-dup pairs (888 vs 1405). This
probe isolates the two effects:

* RECALL: the single-table index has NO OR-construction, so per-pair
  collision probability is p_plane^n_planes — every extra plane
  multiplies recall at a given cosine by ~p_plane (< 1). Auto depth
  was tuned for the MULTI-table constructions (knn_join_lsh,
  cosine_neardup_pairs_lsh) where n_tables=8 buys the recall back.
* COST: deeper banding means more bucket directories (2^planes) and
  smaller files at this corpus size — the listing/task overhead can
  swamp the candidate-count saving.

For each depth it reports min-of-3 probe wall-clock, output pairs,
pre-verify candidate count, and index file/dir counts.

b31_ann_pq: min-of-3 isolation rerun of the gated similarity_ann_pq
query at sf0.1 (the one >1.3x r10->r11 regression sitting on changed
code), with its simple-mode plan for diffing.

Usage: python tools/adjudicate_r12.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed3(fn):
    fn()  # warmup
    best = None
    n = 0
    for _ in range(3):
        t0 = time.monotonic()
        n = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def count_files(root):
    nf, nd = 0, 0
    for _, dirs, files in os.walk(root):
        nd += len(dirs)
        nf += sum(1 for f in files if not f.startswith(("_", ".")))
    return nf, nd


def main():
    from pyspark.sql import functions as F

    from spark_sorted_spark.functions.similarity import (
        auto_planes,
        build_ann_lsh_index,
        cosine_neardup_against_index,
    )
    from spark_sorted_spark.session import get_spark
    from spark_sorted_spark.sources.tpch import load_table
    from tools.scale_probe import replicate_embeddings

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adjudicate_r12"
    spark = get_spark("adjudicate-r12")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, "embeddings", sf_dir)
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    replicate_embeddings(emb).write.parquet(f"{work}/embeddings10")
    emb10 = spark.read.parquet(f"{work}/embeddings10")
    odd = emb10.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    even = emb10.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", "embedding"
    )
    n_odd = odd.count()
    auto = auto_planes(n_odd, 32)
    print(f"b27: |odd|={n_odd} |even|={even.count()} auto_planes={auto}")

    for depth in sorted({8, auto - 1, auto}):
        path = f"{work}/idx_d{depth}"
        build_ann_lsh_index(odd, path, n_planes=depth)
        nf, nd = count_files(path)

        # pre-verify candidate count (the bucket equi-join, ids only)
        from spark_sorted_spark.functions.similarity import (
            _multi_table_buckets,
        )

        idx = spark.read.parquet(path)
        bb = _multi_table_buckets(
            even, depth, 1, 64, "embedding", "vec_id"
        ).select(F.col("vec_id").alias("doc_new"), "bucket")
        cands = (
            bb.join(
                idx.select(F.col("vec_id").alias("doc_old"), "bucket"),
                on="bucket",
            )
            .filter(F.col("doc_old") != F.col("doc_new"))
            .select("doc_old", "doc_new")
            .distinct()
            .count()
        )

        t, rows = timed3(
            lambda p=path: cosine_neardup_against_index(even, p, 0.4).count()
        )
        print(
            f"b27 depth={depth}: min3={t:.2f}s rows={rows} "
            f"candidates={cands} files={nf} dirs={nd}"
        )

    # ---- b31_ann_pq isolation rerun (gated query at sf0.1) ----
    from spark_sorted_spark.queries import QUERIES

    def run_b31():
        df = QUERIES["similarity_ann_pq"](spark, sf_dir)
        return len(df.collect())

    t, rows = timed3(run_b31)
    print(f"b31_ann_pq: min3={t:.2f}s rows={rows}")
    df = QUERIES["similarity_ann_pq"](spark, sf_dir)
    print("b31 plan (simple):")
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    )


if __name__ == "__main__":
    main()
