"""The Iceberg bindings are capability-gated: statement builders are
pure and pinned here; executors must refuse clearly without the
runtime jar (this sandbox has none) instead of failing deep in Spark."""

from __future__ import annotations

import pytest

from v2_ocr_spark.pipeline import iceberg as ice


def test_merge_upsert_sql_shape():
    sql = ice.merge_upsert_sql(
        "cat.db.extracted",
        "updates",
        ["conv_id", "turn_idx", "extracted_text"],
        ["conv_id", "turn_idx"],
    )
    assert sql == (
        "MERGE INTO cat.db.extracted t USING updates s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED THEN UPDATE SET t.extracted_text = s.extracted_text "
        "WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, extracted_text) "
        "VALUES (s.conv_id, s.turn_idx, s.extracted_text)"
    )


def test_create_table_sql_partitions_by_conv_bucket():
    sql = ice.create_table_sql("cat.db.extracted")
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(256, conv_id))" in sql
    assert "'write.distribution-mode' = 'hash'" in sql


def test_delete_and_retention_sql():
    assert ice.delete_conversations_sql("t", "ids") == (
        "DELETE FROM t WHERE conv_id IN (SELECT conv_id FROM ids)"
    )
    assert ice.retention_delete_sql("t", "ts", "2025-01-01 00:00:00") == (
        "DELETE FROM t WHERE ts < TIMESTAMP '2025-01-01 00:00:00'"
    )
    assert ice.expire_snapshots_sql("cat", "db.t", "2025-01-01 00:00:00") == (
        "CALL cat.system.expire_snapshots(table => 'db.t', "
        "older_than => TIMESTAMP '2025-01-01 00:00:00')"
    )


def test_gate_refuses_without_runtime(spark):
    if ice.iceberg_available(spark):
        pytest.skip("iceberg runtime present; gate is open")
    with pytest.raises(NotImplementedError, match="MergeSink"):
        ice.ensure_table(spark, "cat.db.extracted")


def test_repair_and_clear_all_sql():
    from v2_ocr_spark.pipeline.iceberg import clear_all_sql, repair_status_sql

    assert repair_status_sql("cat.db.conversations") == (
        "UPDATE cat.db.conversations SET error = NULL "
        "WHERE status = 'queued' AND error IS NOT NULL"
    )
    assert clear_all_sql("cat.db.extracted") == (
        "DELETE FROM cat.db.extracted WHERE true"
    )


def test_merge_upsert_sql_key_only_source_omits_update_clause():
    """Review regression (r4): a source with ONLY the key columns used
    to emit 'UPDATE SET ' with nothing after it — a parse error; the
    MERGE degrades to insert-if-absent."""
    sql = ice.merge_upsert_sql(
        "t", "v", ["conv_id", "turn_idx"], ["conv_id", "turn_idx"]
    )
    assert "WHEN MATCHED" not in sql
    assert "WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx)" in sql
