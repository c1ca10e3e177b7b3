"""Corpus-level training-data operators over the `documents` table —
the jobs that sit between cleaning and tokenizer-feeding in a
pretraining pipeline:

  * vocabulary_topk      — global token frequency table (the vocab /
                           frequency-cutoff job)
  * token_pack           — deterministic sequence packing: assign docs
                           to fixed token-budget context windows
  * cross_source_overlap — n-gram contamination check between corpus
                           sources (the benchmark-decontamination shape)

All three are pure DataFrame/SQL shapes with DuckDB oracle twins; the
token regexes are the same Java/RE2-agreeing patterns as textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from v2_ocr_spark.operators.textstats import BPE_ISH


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def vocabulary_topk(spark, sf_dir, k: int = 100) -> DataFrame:
    """Top-k corpus tokens by frequency (deterministic tiebreak on the
    token) — the vocabulary/frequency-cutoff pass.

    Scale shape: explode + hash groupBy with map-side partials, then a
    distributed TakeOrdered for the top-k — no global sort, no single-
    partition window. At 10^12 turns the token-count table is the only
    shuffle, keyed by token (high cardinality, well spread)."""
    # F.lit keeps the pattern out of the SQL parser (a '\d' inside an
    # F.expr string literal would be eaten as an escape)
    toks = _docs(spark, sf_dir).select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(BPE_ISH), F.lit(0)
            )
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )


def token_pack(spark, sf_dir, budget: int = 2048) -> DataFrame:
    """Deterministic sequence packing over the WHOLE documents table
    (the oracled query surface); see token_pack_for."""
    return token_pack_for(_docs(spark, sf_dir), budget)


def token_pack_for(docs: DataFrame, budget: int = 2048) -> DataFrame:
    """Deterministic sequence packing over any (doc_id, source, text)
    table: concatenate each SOURCE's docs in doc_id order into a
    running token stream and assign every doc the context window (bin)
    its first token lands in — the standard pretraining packing job,
    made reproducible (no RNG, no greedy first-fit whose result depends
    on visit order). Pass the ALREADY-FILTERED survivors when packing
    for training: packing before filtering would leave every window
    underfilled by the tokens of later-dropped docs.

    Scale shape: the cumulative sum windows PARTITION BY source — the
    shard unit a real packing job uses — so no single-partition window
    ever sees the whole corpus; each shard's stream is independent and
    the window is one shuffle on the shard key."""
    d = docs.select(
        "doc_id",
        "source",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_token"
    )
    out = d.select("source", "doc_id", "n_tokens", start)
    return out.select(
        "source",
        "doc_id",
        "n_tokens",
        F.col("start_token").cast("bigint").alias("start_token"),
        F.floor(F.col("start_token") / budget).cast("int").alias("bin"),
    )


def corpus_filter(
    spark, sf_dir,
    min_quality: float = 0.5,
    min_chars: int = 100,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    dedup_threshold: float = 0.5,
) -> DataFrame:
    """The composed C4/Gopher-style cleaning decision: per document, a
    keep/drop verdict with an auditable reason string — the join of the
    quality heuristic, language ID, length floor, and near-dup keeper
    selection that an actual pretraining data pipeline applies before
    tokenization. Reasons compose in a FIXED order (length, lang,
    quality, dup) so the first failing check names the row.

    Scale shape: three narrow codegen projections joined on doc_id
    (broadcast-size here, co-partitioned hash joins at corpus scale)
    plus the memoized LSH keeper list — nothing quadratic anywhere."""
    from v2_ocr_spark.operators.dedup import dedup_keep_list
    from v2_ocr_spark.operators.textstats import lang_id, quality_score

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = lang_id(spark, sf_dir)
    keep = dedup_keep_list(spark, sf_dir, threshold=dedup_threshold).select(
        "doc_id", F.col("keep").alias("dedup_keep")
    )
    j = (
        docs.join(q, "doc_id")
        .join(lang, "doc_id")
        .join(keep, "doc_id")
    )
    reason = (
        F.when(F.col("n_chars") < min_chars, F.lit("too_short"))
        .when(~F.col("pred_lang").isin(*langs), F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~F.col("dedup_keep"), F.lit("near_duplicate"))
        .otherwise(F.lit("kept"))
    )
    return (
        j.select(
            "doc_id",
            "pred_lang",
            "quality",
            reason.alias("reason"),
            (reason == "kept").alias("keep"),
        )
        .orderBy("doc_id")
    )


def corpus_filter_stats(spark, sf_dir, **filter_kwargs) -> DataFrame:
    """The number every data meeting asks for: docs and token budget
    per filter outcome — how much survives cleaning, and what each
    rule costs. One rollup over corpus_filter joined to the token
    counts (map-side partial aggregation; the reason key has 5
    values, so the final shuffle is trivial)."""
    return _filter_stats_for(
        spark, sf_dir, corpus_filter(spark, sf_dir, **filter_kwargs)
    )


def _filter_stats_for(spark, sf_dir, decisions: DataFrame) -> DataFrame:
    """Per-reason rollup over an EXISTING decisions table — the shared
    body of corpus_filter_stats and run_clean_pipeline's summary (one
    definition, so the gate query and the pipeline lineage can't
    drift)."""
    from v2_ocr_spark.operators.textstats import token_counts

    toks = token_counts(spark, sf_dir).select("doc_id", "bpe_tokens")
    return (
        decisions.join(toks, "doc_id")
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe_tokens").cast("bigint").alias("bpe_tokens"),
        )
        .orderBy("reason")
    )


def run_clean_pipeline(
    spark, sf_dir: str, out_dir: str, budget: int = 2048, **filter_kwargs
) -> dict:
    """The composed END-TO-END cleaning job: filter (quality + lang +
    length + near-dup) -> keep survivors -> pack into token-budget
    windows -> write parquet + a lineage summary. One call takes a raw
    documents table to training-ready packed shards — the pipeline a
    user of the individual operators would otherwise hand-wire.

    Writes:
      out_dir/clean/      kept docs with their filter columns
      out_dir/packed/     (source, doc_id, n_tokens, start_token, bin)
      out_dir/summary.json  docs/tokens per outcome + kept bins

    Scale notes: every stage is the audited operator (nothing new
    here); the only materialization between stages is the keep
    decision, persisted once and reused by the pack join. out_dir must
    be a DRIVER-LOCAL path: the parquet shards go through Hadoop
    writers (any scheme would work) but summary.json is written with
    plain file IO — on an object store, collect the returned summary
    and persist it yourself."""
    import json
    import os

    decisions = corpus_filter(spark, sf_dir, **filter_kwargs).persist()
    try:
        kept = decisions.where(F.col("keep")).select(
            "doc_id", "pred_lang", "quality"
        )
        docs = _docs(spark, sf_dir)
        clean = docs.join(kept, "doc_id")
        clean.write.mode("overwrite").parquet(f"{out_dir}/clean")

        # pack the SURVIVORS, not the raw corpus: packing before the
        # filter would assign offsets/bins that include later-dropped
        # docs, leaving every training window underfilled
        survivors = docs.join(kept.select("doc_id"), "doc_id")
        packed = token_pack_for(survivors, budget=budget)
        packed.write.mode("overwrite").parquet(f"{out_dir}/packed")

        # stats straight off the persisted decisions — calling
        # corpus_filter_stats here would recompute the whole filter
        stats = {
            r["reason"]: {"n_docs": r["n_docs"], "bpe_tokens": r["bpe_tokens"]}
            for r in _filter_stats_for(spark, sf_dir, decisions).collect()
        }
        # count bins from the files just written, not by re-running the
        # pack plan (window + scan + join) a second time
        n_bins = (
            spark.read.parquet(f"{out_dir}/packed")
            .select("source", "bin")
            .distinct()
            .count()
        )
        summary = {
            "outcomes": stats,
            "kept_docs": int(stats.get("kept", {}).get("n_docs", 0)),
            "kept_bins": int(n_bins),
            "budget": budget,
        }
        tmp = f"{out_dir}/summary.json.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(summary, f)
        os.replace(tmp, f"{out_dir}/summary.json")
        return summary
    finally:
        decisions.unpersist()


def cross_source_overlap(spark, sf_dir, shingle_n: int = 5) -> DataFrame:
    """Contamination check: for every pair of corpus sources, the count
    of distinct word n-gram shingles they share — the shape of a
    benchmark-decontamination pass (train side vs eval side keyed by a
    'source' label).

    Scale shape: distinct (source, shingle) projection, then a shingle
    equi-join between source groups — the same inverted-index idiom as
    ngram_jaccard_pairs, cost proportional to truly-shared content.
    NULL-text docs contribute no shingles."""
    from v2_ocr_spark.operators.dedup import shingle_explode

    docs = _docs(spark, sf_dir)
    sh = shingle_explode(
        docs.select("doc_id", "text"), shingle_n
    ).join(docs.select("doc_id", "source"), "doc_id")
    src_sh = sh.select("source", "shingle").distinct()
    a = src_sh.select(F.col("source").alias("source_a"), "shingle")
    b = src_sh.select(F.col("source").alias("source_b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_shingles"))
        .orderBy("source_a", "source_b")
    )
