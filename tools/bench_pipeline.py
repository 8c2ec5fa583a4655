"""Full KG-construction job benchmark: sharded, resumable, lineage-audited.

Runs plans.pipeline.run_pipeline (mention scan → broadcast linking →
file edges per shard → entity-edge merge phase, manifests + sha256
rollups) over a materialized synthetic corpus on a 4-executor
local-cluster, then proves checkpoint resume by deleting two shard
manifests and re-running. Prints one JSON line.

Usage: python tools/bench_pipeline.py [n_files] (default 4,000,000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("SPARK_GRAFT_PIPE_CORPUS", "/tmp/curies_spark_pipe_corpus")
OUT = "/tmp/curies_spark_pipe_out"


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local-cluster[4,2,3072]")
        .appName("bench-kg-pipeline")
        .config("spark.driver.memory", "6g")
        .config("spark.executor.memory", "2g")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from curies_spark.plans.pipeline import run_pipeline, validate_content_invariant
    from curies_spark.sources.synthetic import generate_repos

    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        generate_repos(spark, n_files, partitions=64).write.mode("overwrite").parquet(
            CORPUS
        )
    repos = spark.read.parquet(CORPUS)
    n_files = repos.count()

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.perf_counter()
    totals = run_pipeline(spark, repos, OUT, n_shards=8)
    wall = time.perf_counter() - t0

    invariant_ok = validate_content_invariant(repos, totals["manifests"])

    # resume: drop two shard manifests, re-run, totals must be identical
    for shard in (2, 5):
        os.remove(os.path.join(OUT, "_manifests", f"shard-{shard}.json"))
    t0 = time.perf_counter()
    resumed = run_pipeline(spark, repos, OUT, n_shards=8)
    resume_wall = time.perf_counter() - t0
    spark.stop()

    assert resumed["triples"] == totals["triples"], (resumed, totals)
    assert resumed["resumed_shards"] == 6

    print(
        json.dumps(
            {
                "metric": "kg_pipeline_end_to_end",
                "cluster": "local-cluster[4,2]",
                "input_files": n_files,
                "mentions": totals["mentions"],
                "linked_mentions": totals["linked_mentions"],
                "triples": totals["triples"],
                "wall_sec": round(wall, 2),
                "files_per_sec": int(n_files / wall),
                "triples_per_sec": int(totals["triples"] / wall),
                "content_sha256_invariant": "OK" if invariant_ok else "VIOLATED",
                "resume_wall_sec": round(resume_wall, 2),
                "resume_recomputed_shards": 2,
            }
        )
    )


if __name__ == "__main__":
    main()
