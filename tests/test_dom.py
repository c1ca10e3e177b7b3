"""The flattened DOM-node-table route (operators/dom.py) must agree
byte-for-byte with the fused kernel route (kernels/htmlx.py) — the two
faces of the north star's "Readability-style scoring over a flattened
DOM-node table"."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from v2_ocr_spark.operators.dom import (
    classify_nodes,
    flatten_dom,
    node_stats,
    reassemble_content,
)
from v2_ocr_spark.operators.extract import extract_turns, with_payload_kind


@pytest.fixture(scope="module")
def html_turns(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/transcripts.parquet")
    return with_payload_kind(df).where(F.col("payload_kind") == "html")


def test_dom_route_equals_kernel_route(spark, sf_small, html_turns):
    kernel = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in extract_turns(html_turns).collect()
    }
    dom = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in reassemble_content(
            classify_nodes(flatten_dom(html_turns))
        ).collect()
    }
    assert kernel, "fixture should contain html turns"
    # node-less turns (empty html) have no DOM row; kernel says "" there
    for key, text in kernel.items():
        assert dom.get(key, "") == text, key
    assert set(dom) <= set(kernel)


def test_node_stats_match_expected_table(spark, sf_small, html_turns):
    stats = {
        (r["conv_id"], r["turn_idx"]): r
        for r in node_stats(flatten_dom(html_turns)).collect()
    }
    exp = (
        spark.read.parquet(f"{sf_small}/transcripts_expected.parquet")
        .where(F.col("payload_kind") == "html")
        .collect()
    )
    n_checked = 0
    for r in exp:
        key = (r["conv_id"], r["turn_idx"])
        if r["html_blocks"] == 0:
            assert key not in stats
            continue
        got = stats[key]
        assert got["n_blocks"] == r["html_blocks"], key
        assert got["n_kept"] == r["html_kept"], key
        assert got["kept_chars"] == r["html_kept_chars"], key
        assert got["link_chars"] == r["html_link_chars"], key
        n_checked += 1
    assert n_checked > 50


def test_classification_is_jvm_side(html_turns):
    """Scoring/classification over the node table must stay in
    whole-stage codegen — only the flatten parse may touch Python."""
    plan = classify_nodes(flatten_dom(html_turns))._jdf.queryExecution().executedPlan().toString()
    # exactly one Python stage: the mapInPandas flatten
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
