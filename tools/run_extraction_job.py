"""spark-submit entry point for the resumable extraction job.

Cluster usage (the north rule's launch shape):

    python tools/build_pyfiles.py          # -> dist/v2_ocr_spark.zip
    spark-submit --py-files dist/v2_ocr_spark.zip \
        tools/run_extraction_job.py \
        --input <iceberg-or-parquet path> --out <table dir> \
        --num-partitions 4096

Local smoke: spark-submit --master 'local[8]' --py-files dist/v2_ocr_spark.zip
tools/run_extraction_job.py --input /root/repo/data/sf0.001/transcripts.parquet
--out /tmp/extracted --num-partitions 8
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--max-attempts", type=int, default=3)
    ap.add_argument("--incremental", action="store_true",
                    help="also re-extract committed partitions whose "
                         "input fingerprint changed (appended data)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from v2_ocr_spark.pipeline.runner import ExtractionJob

    spark = SparkSession.builder.appName("v2-ocr-extraction").getOrCreate()
    job = ExtractionJob(
        spark,
        args.input,
        args.out,
        num_partitions=args.num_partitions,
        max_attempts=args.max_attempts,
    )
    result = job.run(incremental=args.incremental)
    rows = job.read_output().count()
    print(json.dumps({**result, "total_rows_visible": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
