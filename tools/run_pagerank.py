"""spark-submit entry point: PageRank to 1e-6 over the derived edge table,
resumable via CheckpointManager (north rule's cluster launch shape).

Usage (via tools/submit.sh):
    spark-submit --py-files paragrapher_spark.zip tools/run_pagerank.py \
        <sf_dir> <checkpoint_dir>

Rerunning with the same checkpoint_dir resumes from the newest complete
superstep recorded in the manifest.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pg_spark_ckpt"

    spark = SparkSession.builder.appName("pg-spark-pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from paragrapher_spark.kernels.pagerank import pagerank
    from paragrapher_spark.plans.checkpoint import CheckpointManager
    from paragrapher_spark.sources.edges import copurchase_edges

    edges = copurchase_edges(spark, sf_dir).persist()
    n_edges = edges.count()
    ckpt = CheckpointManager(ckpt_dir, job_name="pagerank")
    t0 = time.monotonic()
    res = pagerank(edges, tol=1e-6, max_iter=100, checkpoint=ckpt)
    res.ranks.count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "edges": n_edges,
                "iterations": res.iterations,
                "converged": res.converged,
                "final_delta": res.final_delta,
                "seconds": round(dt, 3),
                "edges_per_sec": round(n_edges * res.iterations / dt) if dt else 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
