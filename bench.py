"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced through the ``noop`` sink so every plan runs fully
(scan → convert → shuffle → aggregate) without measuring disk writes.

Set ``SPARK_GRAFT_SCALING=1`` to additionally run the same workload at
local[8] and local[32] and report throughput scaling efficiency — the
sandbox proxy for the N→4N-executor criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "compress",
    "expand",
    "compress_or_standardize",
    "standardize_uri",
    "expand_all",
    "triple_hash",
    "many_to_many",
    "dedup_exact",
    "discover",
]


def _build_spark(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("curies-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def _run_suite(spark, sf_dir: str) -> "tuple[dict[str, float], int]":
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # warm the JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    times: dict[str, float] = {}
    rows = 0
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    return times, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = _build_spark(cpus)
    times, lineitem_rows = _run_suite(spark, sf_dir)
    spark.stop()

    total = round(sum(times.values()), 3)
    # compress+expand each process one derived value per lineitem row
    conv_secs = times["compress"] + times["expand"]
    conversions_per_sec = int(2 * lineitem_rows / conv_secs) if conv_secs else None

    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "cpus": int(cpus),
        "lineitem_rows": lineitem_rows,
        "uri_curie_conversions_per_sec": conversions_per_sec,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = {}
        for n in (8, 32):
            s = _build_spark(str(n))
            t, rows = _run_suite(s, sf_dir)
            s.stop()
            wall = sum(t.values())
            scaling[str(n)] = {
                "seconds": round(wall, 3),
                "rows_per_sec": int(rows * len(HEADLINE) / wall),
            }
        eff = (
            scaling["32"]["rows_per_sec"] / scaling["8"]["rows_per_sec"]
        ) / (32 / 8)
        result["scaling"] = scaling
        result["scaling_efficiency_8_to_32"] = round(eff, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
