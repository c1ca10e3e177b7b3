"""Iceberg table-format bindings — capability-gated.

The north rule targets Iceberg tables for input, output, checkpoints
and metrics.  This sandbox ships no Iceberg runtime jar, so the engine
runs on the transactional parquet MergeSink (pipeline/sink.py), which
reproduces the two Iceberg properties the pipeline depends on:
idempotent keyed replacement and atomic snapshot visibility.

On a real cluster (spark-submit with the iceberg-spark-runtime jar and
a catalog configured), the SAME call sites switch to genuine Iceberg
DDL/DML through this module; every statement builder below is pure and
unit-tested, and the executors are gated on ``iceberg_available``.

Reference parity: the MERGE statement is the engine's analog of the
reference's Postgres upsert ``onConflict 'document_id,page_number,
user_id'`` (results-service.ts:125,137); DELETE/expire map S7/S8
(queue-service.ts:233-283; stats-service.ts:143-201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# canonical output/lineage tables (SURVEY §1.3 mapping)
EXTRACTED_TABLE_DDL = (
    "conv_id STRING, turn_idx INT, extracted_text STRING, "
    "spans ARRAY<STRUCT<start: INT, end: INT, kind: STRING>>, error STRING"
)
# bucket on conv_id so per-conversation reads prune; days(ts) is the
# natural partition for the INPUT transcripts table instead.
EXTRACTED_PARTITION = "bucket(256, conv_id)"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# pure statement builders (unit-tested; no cluster needed)
# ---------------------------------------------------------------------------

def create_table_sql(
    table: str,
    schema_ddl: str = EXTRACTED_TABLE_DDL,
    partition_by: str = EXTRACTED_PARTITION,
) -> str:
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) "
        f"USING iceberg PARTITIONED BY ({partition_by}) "
        "TBLPROPERTIES ('write.distribution-mode' = 'hash', "
        "'format-version' = '2')"
    )


def merge_upsert_sql(
    table: str, source_view: str, columns: list[str], keys: list[str]
) -> str:
    """Idempotent keyed upsert — S5 (results-service.ts:125,137)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    # key-only source (presence merge): an empty 'UPDATE SET ' clause
    # is a parse error — matched rows already equal their update, so
    # the MERGE degrades to insert-if-absent
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def delete_conversations_sql(table: str, ids_view: str) -> str:
    """Row-level delete cascade — S7 (queue-service.ts:233-283)."""
    return (
        f"DELETE FROM {table} WHERE conv_id IN "
        f"(SELECT conv_id FROM {ids_view})"
    )


def retention_delete_sql(table: str, ts_col: str, cutoff_iso: str) -> str:
    """Retention cleanup — S8 (stats-service.ts:143-201)."""
    return f"DELETE FROM {table} WHERE {ts_col} < TIMESTAMP '{cutoff_iso}'"


def repair_status_sql(table: str) -> str:
    """P9 self-heal write-back — the Iceberg form of
    maintenance.repair_status_violations (reference clears doc.error
    for every queued+error row, document-status-validation.ts:39-46).
    Idempotent: the WHERE matches nothing on a second run."""
    return (
        f"UPDATE {table} SET error = NULL "
        "WHERE status = 'queued' AND error IS NOT NULL"
    )


def clear_all_sql(table: str) -> str:
    """Clear-all-data — DELETE keeps the table + snapshot lineage (the
    lastCleared audit trail lives in table history; expire_snapshots
    later reclaims the data files)."""
    return f"DELETE FROM {table} WHERE true"


def expire_snapshots_sql(catalog: str, table: str, older_than_iso: str) -> str:
    """Physical cleanup after S8 — Iceberg maintenance procedure."""
    return (
        f"CALL {catalog}.system.expire_snapshots("
        f"table => '{table}', older_than => TIMESTAMP '{older_than_iso}')"
    )


# ---------------------------------------------------------------------------
# gated executors
# ---------------------------------------------------------------------------

def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath; run via spark-submit "
            "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 "
            "with a catalog configured, or use pipeline.sink.MergeSink "
            "(the transactional parquet stand-in this sandbox tests)."
        )


def ensure_table(spark: SparkSession, table: str, **kw) -> None:
    _require(spark)
    spark.sql(create_table_sql(table, **kw))


def merge_upsert(
    spark: SparkSession, table: str, updates: DataFrame, keys: list[str]
) -> None:
    """MERGE the updates DataFrame into an Iceberg table on `keys`."""
    import uuid as _uuid

    _require(spark)
    # unique view per call: a FIXED name lets two concurrent merges in
    # one session clobber each other's source view between create and
    # MERGE — the loser silently upserts the other merge's rows
    view = f"v2ocr_merge_updates_{_uuid.uuid4().hex[:12]}"
    updates.createOrReplaceTempView(view)
    try:
        spark.sql(merge_upsert_sql(table, view, updates.columns, keys))
    finally:
        spark.catalog.dropTempView(view)
