"""Degenerate-input and schema-derivation regressions from the round-1
advice pass: all-equal histogram values, non-string normalize keys."""

from __future__ import annotations

import pyspark.sql.functions as F

from v2_ocr_spark.operators.relational import value_histogram_for
from v2_ocr_spark.operators.textstats import normalize_nfc


def test_value_histogram_all_equal_values_bin_zero(spark):
    e = spark.createDataFrame(
        [("click", 7.5)] * 10 + [("view", 7.5)] * 3,
        "event_type string, value double",
    )
    rows = {
        (r.event_type, r.bin): r.n for r in value_histogram_for(e).collect()
    }
    # width 0 must collapse to bin 0, never NaN
    assert rows == {("click", 0): 10, ("view", 0): 3}


def test_value_histogram_normal_path_unchanged(spark):
    e = spark.createDataFrame(
        [("t", 0.0), ("t", 10.0), ("t", 19.99), ("t", 20.0)],
        "event_type string, value double",
    )
    got = {r.bin: r.n for r in value_histogram_for(e, n_bins=20).collect()}
    assert got == {0: 1, 10: 1, 19: 2}


def test_normalize_nfc_derives_key_types_from_schema(spark):
    d = spark.createDataFrame(
        [(17, "café"), (18, None)], "doc_id long, text string"
    )
    out = normalize_nfc(d, ["doc_id"])
    assert dict(out.dtypes)["doc_id"] == "bigint"
    rows = {r.doc_id: r.nfc_text for r in out.collect()}
    assert rows[17] == "café"  # combining accent composed
    assert rows[18] == ""


def test_status_labels_full_rate_limit_and_cancelled_progress(spark):
    """Full getStatusText parity: rate-limited rows count down with the
    reference arithmetic; cancelled-with-progress shows the processed
    count (document-list.tsx:229-246)."""
    from v2_ocr_spark.kernels.textfns import rate_limit_countdown
    from v2_ocr_spark.operators.relational import status_labels_full

    now_ms = 1_000_000.0
    rows = [
        # (status, total_turns, current_page, retry_after_s, rl_start_ms)
        ("processing", 10, 3, None, None),
        ("cancelled", 10, 4, None, None),
        ("cancelled", 10, 0, None, None),
        ("cancelled", 10, None, None, None),
        ("queued", 10, None, None, None),
        ("processing", 10, 3, 30.0, now_ms - 12_500),   # 17.5s left -> 18
        ("queued", 10, None, 5.0, now_ms - 60_000),     # expired -> 0
    ]
    df = spark.createDataFrame(
        rows,
        "status string, total_turns int, current_page int, "
        "retry_after_s double, rate_limit_start_ms double",
    )
    got = [r.label for r in status_labels_full(df, now_ms).collect()]
    assert got == [
        "Processing 3/10",
        "Cancelled (4 processed)",
        "Cancelled",
        "Cancelled",
        "queued",
        "Resuming in 18s",
        "Resuming in 0s",
    ]
    # the scalar kernel agrees with the column arithmetic
    assert rate_limit_countdown(30.0, 12_500) == 18
    assert rate_limit_countdown(5.0, 60_000) == 0
