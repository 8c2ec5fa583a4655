"""spark-submit entrypoint for the KG-construction pipeline.

Usage (cluster)::

    spark-submit --py-files curies_spark.zip \\
        curies_spark/plans/submit_job.py \\
        --input /data/repos_parquet --output /data/kg_out \\
        --epm /conf/bioregistry.epm.json --shards 256

Usage (sandbox, synthetic corpus)::

    python curies_spark/plans/submit_job.py --synthetic 100000 \\
        --output /tmp/kg_out --shards 8

The job is resumable: re-submitting with the same ``--output`` skips
shards that already have lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# when invoked as a script (python .../submit_job.py) rather than via
# spark-submit --py-files, put the repo root on the path
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv: "list[str] | None" = None) -> int:
    parser = argparse.ArgumentParser(description="curies-spark KG construction")
    parser.add_argument("--input", help="parquet/Iceberg path of the repos table")
    parser.add_argument("--synthetic", type=int, help="generate N synthetic files instead")
    parser.add_argument("--output", required=True)
    parser.add_argument("--epm", help="extended prefix map JSON (default: builtin fixture)")
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--validate-invariant", action="store_true")
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("curies-spark-kg-construct")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from curies_spark.core.converter import Converter
    from curies_spark.plans.pipeline import run_pipeline, validate_content_invariant
    from curies_spark.sources.synthetic import generate_repos, pipeline_converter

    if args.synthetic:
        repos = generate_repos(spark, args.synthetic)
    elif args.input:
        repos = spark.read.parquet(args.input)
    else:
        parser.error("one of --input or --synthetic is required")

    converter = (
        Converter.from_extended_prefix_map(args.epm) if args.epm else pipeline_converter()
    )

    totals = run_pipeline(
        spark,
        repos,
        args.output,
        converter=converter,
        n_shards=args.shards,
        resume=not args.no_resume,
    )
    summary = {k: v for k, v in totals.items() if k != "manifests"}

    if args.validate_invariant:
        ok = validate_content_invariant(repos, totals["manifests"])
        summary["content_sha256_invariant"] = "OK" if ok else "VIOLATED"
        if not ok:
            print(json.dumps(summary))
            return 2

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
