"""Dump .explain('formatted') for the round-6-touched queries into
plans/r06/<query>_{before,after}.txt.

Usage: python tools/dump_r06_plans.py <repo_root> <suffix> [out_dir]
  repo_root: tree to import the engine from (round-start worktree for
             'before', the live repo for 'after')
  suffix:    'before' | 'after'
Plans are built at sf0.01 (plan-only; operators whose plan construction
runs routing jobs execute those small jobs).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

QUERIES = [
    "cellid_encode",
    "pip_contains",
    "near_polygon",
    "tolerant_pairs",
    "knn_cell",
    "closest_edge",
    "furthest_edge",
    "dedup_exact",
    "dedup_clusters",
    "minhash_signatures",
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "doc_stats",
]


def main():
    repo_root, suffix = sys.argv[1], sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, repo_root)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from s2_geometry_library_java_spark import queries as q

    registry = q.all_queries()
    for extra in ("pip_indexed", "pricing_summary", "nation_revenue"):
        registry.setdefault(extra, getattr(q, f"q_{extra}"))
    for name in QUERIES:
        try:
            df = registry[name](spark, "/root/testdata/sf0.01")
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # record the failure rather than abort the dump
            text = f"ERROR building plan: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"dumped {name}_{suffix}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
