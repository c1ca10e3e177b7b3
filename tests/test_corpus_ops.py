"""Decontamination — per-document benchmark n-gram contamination.

The driver gate sits at its 50-entry cap (CLAUDE.md), so this operator
is verified by an IN-PYTEST DuckDB twin at the gate's rigor — full
sorted-row value equality on the real sf0.001 documents table — plus a
planted-contamination unit test and a physical-plan audit of the
broadcast/zero-corpus-shuffle shape.
"""

from __future__ import annotations

import duckdb

from v2_ocr_spark.operators.corpus import decontaminate, decontaminate_for

SF = "/root/testdata/sf0.001"


def _shingle_sql(n: int) -> str:
    # same word-shingle idiom as __spark_entry__._shingle_ctes (which
    # is pinned n=3 for the gate), parametrized on n: slice [i:i+n-1]
    # is inclusive in DuckDB, so it spans n tokens
    return (
        "unnest(list_distinct(list_transform("
        f"range(1, greatest(len(string_split(text, ' ')) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))))"
    )


def test_decontaminate_matches_duckdb_twin(spark):
    got = [
        (r.doc_id, r.n_shingles, r.bench_hits, r.hit_frac, r.contaminated)
        for r in decontaminate(spark, SF).orderBy("doc_id").collect()
    ]
    n = 5
    sql = f"""
    WITH bsh AS MATERIALIZED (
      SELECT DISTINCT shingle FROM (
        SELECT {_shingle_sql(n)} AS shingle
        FROM read_parquet('{SF}/documents.parquet')
        WHERE source IS NOT DISTINCT FROM 'src0' AND text IS NOT NULL)),
    dsh AS MATERIALIZED (
      SELECT doc_id, {_shingle_sql(n)} AS shingle
      FROM read_parquet('{SF}/documents.parquet')
      WHERE source IS DISTINCT FROM 'src0' AND text IS NOT NULL),
    agg AS (
      SELECT d.doc_id, count(*) AS n_shingles,
             count(b.shingle) AS bench_hits
      FROM dsh d LEFT JOIN bsh b ON d.shingle = b.shingle
      GROUP BY d.doc_id)
    SELECT t.doc_id,
      CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
      CAST(coalesce(a.bench_hits, 0) AS BIGINT) AS bench_hits,
      round(CASE WHEN coalesce(a.n_shingles, 0) = 0 THEN 0.0
            ELSE CAST(a.bench_hits AS DOUBLE) / a.n_shingles END,
            6) AS hit_frac,
      coalesce(a.bench_hits, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
          WHERE source IS DISTINCT FROM 'src0') t
    LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """
    exp = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == exp
    assert len(got) == 475  # every non-benchmark doc reported


def test_decontaminate_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no overlap whatsoever here"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "benchmark says the quick brown fox jumps over everything")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in decontaminate_for(docs, bench).collect()}
    assert len(rows) == 3
    # doc 1 shares exactly 2 of its 6 5-gram shingles with the benchmark
    assert rows[1].contaminated
    assert rows[1].n_shingles == 6 and rows[1].bench_hits == 2
    assert rows[1].hit_frac == round(2 / 6, 6)
    assert not rows[2].contaminated and rows[2].bench_hits == 0
    # NULL-text doc: kept in the report with zero shingles, not flagged
    assert rows[3].n_shingles == 0 and not rows[3].contaminated
    assert rows[3].hit_frac == 0.0


def test_decontaminate_self_is_total(spark):
    # benchmark == corpus: every one of a doc's shingles is in the
    # bench set by construction, so hit_frac is exactly 1.0 for every
    # text-bearing doc — a containment invariant no fixture can fake.
    # The subtree is re-executed per pass inside decontaminate_for, so
    # the 50-doc slice must be deterministic (bare LIMIT is not).
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .limit(50)
    )
    rows = decontaminate_for(docs, docs).collect()
    assert len(rows) == 50
    for r in rows:
        if r.n_shingles:
            assert r.bench_hits == r.n_shingles
            assert r.hit_frac == 1.0 and r.contaminated
        else:
            assert not r.contaminated


def test_decontaminate_null_source_is_training_side(spark, tmp_path):
    # a NULL-source doc is NOT the benchmark: it lands on the training
    # side and stays in the report. The plain != / == split evaluated
    # NULL on both predicates and silently dropped it from BOTH sides.
    text = "the quick brown fox jumps over the lazy dog"
    spark.createDataFrame(
        [(1, "src0", text), (2, "src1", text), (3, None, text)],
        "doc_id bigint, source string, text string",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r.doc_id: r for r in decontaminate(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {2, 3}
    assert rows[3].contaminated and rows[3].hit_frac == 1.0


def test_decontaminate_plan_broadcasts_benchmark(spark):
    p = (
        decontaminate(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shingle pass per side, nothing else drops into Python
    assert p.count("MapInPandas") == 2
    # the eval-set shingle table is the broadcast side; the corpus side
    # never shuffles before its single map-side-partial doc_id agg
    assert "BroadcastHashJoin" in p
    assert "partial_count" in p
