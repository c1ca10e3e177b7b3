"""Structured Streaming variant of the extraction pipeline.

readStream (file source) -> the SAME zero-shuffle extract_turns pass ->
parquet sink with checkpointing. Exactly-once end-to-end: the file
source tracks processed files and the sink commits through the
streaming commit log, so a crashed query resumes without duplicates —
the streaming analog of the batch pipeline's checkpoint claim loop.

``availableNow`` processes the current backlog and stops (the shape the
driver/test harness needs); drop it for a continuously-running query.

Scale notes: state here is only source-progress metadata (no
aggregation state), so there is no state-store growth; watermarks are
unnecessary because extraction is per-row. A windowed variant (e.g.
turns/minute metrics) would add ``withWatermark("ts", ...)`` +
``groupBy(window(...))`` on top of the same plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from v2_ocr_spark.operators.extract import extract_turns

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    reader = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    extracted = extract_turns(stream)

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
