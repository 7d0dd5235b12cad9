"""Cluster entry point for the KG-construction pipeline.

Deployed via spark-submit with the package zipped as --py-files::

    python3 -m zipfile -c /tmp/rdf_canonize_spark.zip rdf_canonize_spark
    spark-submit --master <cluster> \\
        --py-files /tmp/rdf_canonize_spark.zip \\
        tools/run_pipeline.py \\
        --pages-parquet <iceberg/parquet pages table> \\
        --out /path/to/output --batch-id 0

(or ``--synth-docs N`` / ``--sf-dir DIR`` for generated input).
Re-running with the same --out resumes past completed urls via the
checkpoint manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-parquet",
                     help="path to a pages table (input_hint schema)")
    src.add_argument("--sf-dir",
                     help="testdata dir; pages derived from documents")
    src.add_argument("--synth-docs", type=int,
                     help="generate N synthetic pages")
    p.add_argument("--out", help="output dir (enables checkpointed write)")
    p.add_argument("--batch-id", type=int, default=0)
    p.add_argument("--max-work-factor", type=float, default=3)
    p.add_argument("--master", default=None,
                   help="override master (default: spark-submit's)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    if args.master:
        from rdf_canonize_spark.session import get_spark

        spark = get_spark(app_name="kg-pipeline", master=args.master)
    else:
        spark = SparkSession.builder.appName("kg-pipeline").getOrCreate()

    from rdf_canonize_spark.pipeline.pages import (
        pages_from_documents,
        synthesize_pages,
    )
    from rdf_canonize_spark.pipeline.runner import run_pipeline

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    elif args.sf_dir:
        pages = pages_from_documents(spark, args.sf_dir)
    else:
        pages = synthesize_pages(spark, args.synth_docs)

    t0 = time.time()
    results = run_pipeline(
        spark,
        pages,
        max_work_factor=args.max_work_factor,
        out_dir=args.out,
        batch_id=args.batch_id,
    )
    stats = results["canonical"].agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_quads").alias("quads"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "errors"
        ),
    ).collect()[0]
    out = {
        "docs": stats["docs"],
        "quads": stats["quads"],
        "errors": stats["errors"],
        "sec": round(time.time() - t0, 2),
        "out_dir": args.out,
        "batch_id": args.batch_id,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
