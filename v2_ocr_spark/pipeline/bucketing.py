"""Bucketed tables — co-located conv_id joins with zero shuffle.

At 100 TB every conv_id-keyed join (extracted ⋈ conversations,
extracted ⋈ annotations, resume reconciliation) shuffles BOTH sides
unless the storage layout already agrees on the partitioning. Writing
the big tables bucketed on conv_id with one shared bucket count makes
those joins exchange-free: each task reads bucket i of both sides and
sort-merges locally (plan shows ``Bucketed: true`` scans, a
SortMergeJoin, and NO Exchange — pinned in tests/test_bucketing.py).

Iceberg analog (pipeline/iceberg.py): ``PARTITIONED BY (bucket(256,
conv_id))`` plus storage-partitioned joins
(spark.sql.sources.v2.bucketing.enabled) — same layout contract,
catalog-managed.

``sortBy(turn_idx)`` makes every bucket file turn-ordered at rest
(W1), so per-conversation reads need no sort either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 256,
    key: str = "conv_id",
    sort_by: tuple[str, ...] = ("turn_idx",),
) -> None:
    """Persist df bucketed (and per-bucket sorted) on the join key."""
    writer = df.write.bucketBy(buckets, key)
    cols = [c for c in sort_by if c in df.columns]
    if cols:
        writer = writer.sortBy(*cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str = "conv_id"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With
    matching bucketing this plans with no Exchange on either side."""
    return spark.table(left).join(spark.table(right), key)
