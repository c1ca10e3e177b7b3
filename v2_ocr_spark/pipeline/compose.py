"""The composed FLAGSHIP-to-TRAINING-DATA job: resumable transcript
extraction -> conversation assembly -> corpus cleaning (quality +
language + length + conversation-level near-dup keeper) -> token
packing, as ONE pipeline run.

This wires the two halves the repo otherwise exposes separately:

  * the extraction path (ExtractionJob: per-partition checkpointed
    extract of every transcript turn, lease-owned sink, lineage
    metrics — the north-rule flagship), and
  * the training-data path (corpus_filter -> keeper selection ->
    token_pack — run_clean_pipeline's shape, previously only runnable
    over the synthetic `documents` fixture).

Stage boundary discipline: the extraction output is COMMITTED parquet
(the MergeSink table), so the cleaning stages re-read a real table
exactly as a production pipeline would — a crash in cleaning never
invalidates the extraction commits, and a re-run resumes extraction
as up-to-date and recomputes only the cleaning tail.

Scale notes per stage: extraction is the audited zero-shuffle
MapInPandas; assembly the two-phase chunked merge (turn-derived salt);
near-dup over assembled conversations is selectable — the exact
shingle inverted index (ngram_jaccard_pairs_for, default, max_df cap
available) or the sub-quadratic MinHash->LSH->verify cascade
(minhash_lsh_pairs_for, `dedup_method="minhash"`, the tunable at
100 TB); both are string-id generic. Packing is the two-phase
distributed prefix sum, sharded for STRING ids via seeded-sample
boundaries (see token_pack_for). Nothing here is new machinery — the
compose step is joins over the already-audited operators.

Reference parity: the reference's processing chain (queue claim ->
per-page OCR cleanup -> document assembly -> export) is
file-processor.ts:229-330 + the export path page.tsx:629-655; the
cleaning tail is the training-data extension the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

from v2_ocr_spark.operators.assemble import assemble
from v2_ocr_spark.operators.corpus import _clean_pack_write, corpus_filter_for
from v2_ocr_spark.operators.dedup import (
    dedup_keep_list_for,
    duplicate_clusters,
    minhash_lsh_pairs_for,
    ngram_jaccard_pairs_for,
)
from v2_ocr_spark.operators.textstats import token_counts_for
from v2_ocr_spark.pipeline.runner import ExtractionJob


def run_extract_clean_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    num_partitions: int = 32,
    budget: int = 2048,
    min_quality: float = 0.5,
    min_chars: int = 100,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    dedup_threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = None,
    dedup_method: str = "ngram",
    incremental: bool = False,
) -> dict:
    """Extract every transcript turn, assemble conversations, filter
    them with the corpus-cleaning decision, and pack the survivors into
    token-budget windows.

    Writes (under ``out_dir``):
      extracted/    the committed per-partition extraction table
                    (resumable; re-runs skip committed partitions)
      clean/        kept conversations with their filter columns
      packed/       (source, doc_id, n_tokens, start_token, bin)
      summary.json  filter outcomes + pack bins + extraction lineage

    Returns the summary dict; ``summary["extraction"]`` carries the
    extraction-stage lineage (run id, status, per-run committed
    partitions, and the turn/char/error totals from the per-partition
    commit metrics) so ONE artifact covers both stages.
    """
    if dedup_method not in ("ngram", "minhash"):
        raise ValueError(
            f"dedup_method must be 'ngram' or 'minhash', got {dedup_method!r}"
        )
    job = ExtractionJob(
        spark, input_path, f"{out_dir}/extracted",
        num_partitions=num_partitions,
    )
    res = job.run(incremental=incremental)
    # extraction lineage computed NOW (the sink's committed metrics are
    # final once run() returns) so the cleaning tail can fold it into
    # summary.json's single atomic write — a cleaning-only summary that
    # is later re-written would leave a crash window where the file
    # exists without the promised extraction key
    metrics = [c.get("metrics", {}) for c in job.sink.committed().values()]
    extraction = {
        "run_id": res["run_id"],
        "status": res["status"],
        "committed_this_run": len(res.get("committed", [])),
        "partitions": len(metrics),
        "turns_seen": sum(m.get("turns_seen", 0) for m in metrics),
        "turns_errored": sum(m.get("turns_errored", 0) for m in metrics),
        "chars_out": sum(m.get("chars_out", 0) for m in metrics),
    }

    # errored turns stay rows in the extract table (P10) but carry no
    # text; the cleaning stages consume successful extractions only
    extracted = job.read_output().where(F.col("error").isNull())
    convs = assemble(extracted)
    docs = convs.select(
        F.col("conv_id").alias("doc_id"),
        F.col("document_text").alias("text"),
        F.lit("transcripts").alias("source"),
    ).persist()
    # every persisted intermediate this job OWNS is released on every
    # exit path — pairs (minhash hands back a persisted set) and the
    # cluster label table are created INSIDE the try so a failure in
    # any cleaning stage cannot leak them in executor storage for the
    # rest of a long-lived session (ADVICE r3)
    pairs = None
    clusters = None
    try:
        # near-dup pair finding: 'ngram' is the EXACT inverted-index
        # path (default; sum-of-df^2 cost, max_df skew cap available);
        # 'minhash' is the sub-quadratic signature->LSH->verify path —
        # the tunable at 100 TB, where even capped df^2 over assembled
        # conversations can dominate
        if dedup_method == "minhash":
            pairs = minhash_lsh_pairs_for(
                docs, threshold=dedup_threshold, shingle_n=shingle_n,
            )
        else:
            pairs = ngram_jaccard_pairs_for(
                docs, threshold=dedup_threshold, shingle_n=shingle_n,
                max_df=max_df,
            )
        clusters = duplicate_clusters(spark, None, pairs=pairs)
        keep = dedup_keep_list_for(docs, clusters)
        decisions = corpus_filter_for(
            docs, keep,
            min_quality=min_quality, min_chars=min_chars, langs=langs,
        ).persist()
        try:
            summary = _clean_pack_write(
                spark, docs, decisions,
                token_counts_for(docs, ["doc_id"]),
                out_dir, budget, extra={"extraction": extraction},
            )
        finally:
            decisions.unpersist()
    finally:
        if clusters is not None:
            # the pairs= path hands back a persisted label table the
            # caller owns (duplicate_clusters docstring)
            clusters.unpersist()
        if dedup_method == "minhash" and pairs is not None:
            # minhash_lsh_pairs_for hands back a persisted pair set
            # (the memoizing fixture wrapper owns its copies; here
            # the composed job does). The ngram path is lazy — nothing
            # to release.
            pairs.unpersist()
        docs.unpersist()

    return summary
