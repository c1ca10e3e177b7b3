"""Custom stateful streaming operators.

Two Structured Streaming shapes the batch surface doesn't cover:

* ``stream_turn_metrics`` — watermark + event-time windowed aggregation
  (late data handled by the watermark; the streaming analog of the
  reference's 1 s status heartbeat, queue-manager.ts:217, aggregated
  instead of polled).
* ``stream_sessionize`` — an arbitrary-stateful operator via
  ``applyInPandasWithState``: gap-based sessionization per user where
  the open session survives across micro-batches in the state store.
  Closed sessions are emitted as soon as the gap that closes them is
  seen; the still-open session stays in state (and would emit on an
  event-time timeout in a continuously-running query).

Scale notes: state is keyed by user_id — size is O(active users), one
small fixed-width row each, so the state store does not grow with
events. The shuffle partitions the stream by user_id once; skew =
hottest user, same as the batch window formulation
(operators/relational.sessionize).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
SESSION_OUT_DDL = (
    "user_id long, session_start double, session_end double, n_events long"
)
_SESSION_STATE_DDL = "start_ts double, last_ts double, n long"


def _advance_session(
    user_id, start, last, n, ts_seconds, gap_seconds: float
):
    """The gap-sessionization core, shared by the
    applyInPandasWithState fn and the transformWithState processor
    (they are pinned equal by test; one implementation means a fix can
    never land in only one of them).

    Cross-batch disorder: events are only sorted WITHIN a micro-batch
    (no watermark on this operator), so a late event belonging to the
    OPEN session may arrive after the state's high-water mark. It must
    never move that mark BACKWARD — `last = t` unconditionally would
    make the next on-time event measure its gap from the late
    timestamp and falsely split the session (the batch global-sort
    formulation keeps it whole). A late in-gap event folds into the
    open session, extending its start backward if needed; an ANCIENT
    straggler — more than gap_seconds before the open session's start
    — can never belong to it and is emitted as its own closed
    single-event session, leaving the open session untouched."""
    closed: list[tuple] = []
    for t in ts_seconds:
        if last is None:
            start = last = t
            n = 1
        elif t < start - gap_seconds:
            closed.append((user_id, t, t, 1))
        elif t - last > gap_seconds:
            closed.append((user_id, start, last, n))
            start = last = t
            n = 1
        else:
            last = max(last, t)
            start = min(start, t)
            n += 1
    return start, last, n, closed


def _sessionize_fn(gap_seconds: float):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic event order within the batch — same tiebreak as
        # the batch formulation (relational.sessionize)
        batch = batch.sort_values(["ts", "event_id"])
        start, last, n, closed = _advance_session(
            user_id, start, last, n,
            (ts.timestamp() for ts in batch["ts"]), gap_seconds,
        )
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    available_now: bool = True,
) -> StreamingQuery:
    """events stream -> closed sessions, open session held in state."""
    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60.0),
        outputStructType=SESSION_OUT_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tws_available() -> bool:
    """True when the transformWithState python protocol dependency
    (protobuf) is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_sessionize_tws(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    available_now: bool = True,
) -> StreamingQuery:
    """The same gap sessionizer on the NEWER arbitrary-state API,
    transformWithStateInPandas (Spark 4.x): a StatefulProcessor with a
    named ValueState instead of applyInPandasWithState's single state
    tuple. Semantically identical output to stream_sessionize — the
    tests pin the two against each other — but the processor model adds
    what a production sessionizer eventually needs: multiple named
    state variables, state TTL, and event-time timers (handleExpiredTimer)
    to flush still-open sessions without new input.

    transformWithState requires the RocksDB state store provider; this
    sets it session-wide (it is also the right provider at scale —
    incremental checkpoints, state larger than heap).

    ENVIRONMENT GATE: the transformWithState state-server protocol
    speaks protobuf — without the `protobuf` package the driver-side
    Python worker crashes opaquely mid-query, so the missing dependency
    is surfaced here as NotImplementedError instead (same pattern as
    the Iceberg and multimodal-codec gates; `pip install protobuf` on a
    real cluster lights this up with no other change).
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` package "
            "(google.protobuf) for its state-server protocol, which is "
            "not installed in this environment; use stream_sessionize "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    try:
        _prior_provider = spark.conf.get(_PROVIDER_KEY)
    except Exception:  # noqa: BLE001 — unset in this session
        _prior_provider = None
    spark.conf.set(
        _PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    gap_seconds = gap_minutes * 60.0

    class SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "session", _SESSION_STATE_DDL
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = self._state.get()
            if cur is not None:
                start, last, n = cur
            else:
                start = last = None
                n = 0
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            start, last, n, closed = _advance_session(
                user_id, start, last, n,
                (ts.timestamp() for ts in batch["ts"]), gap_seconds,
            )
            self._state.update((start, last, n))
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "user_id", "session_start", "session_end", "n_events",
                    ],
                )

        def close(self) -> None:
            pass

    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    sessions = stream.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(),
        outputStructType=SESSION_OUT_DDL,
        outputMode="append",
        timeMode="none",
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    try:
        return writer.start()
    finally:
        # the provider is captured per-query at start — restore the
        # session conf so LATER stateful queries in this session keep
        # the provider they would have had (a permanent session-wide
        # swap to RocksDB was a hidden side effect the caller of some
        # other operator never opted into)
        if _prior_provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, _prior_provider)


def stream_turn_metrics(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """transcripts stream -> per-window per-kind turn/char counts.

    ``withWatermark`` bounds state: windows older than the watermark
    close, emit once (append mode), and are evicted — late rows beyond
    the watermark are dropped rather than growing state forever.
    """
    from v2_ocr_spark.operators.extract import with_payload_kind
    from v2_ocr_spark.streaming.stream_extract import TRANSCRIPT_DDL

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    agg = (
        with_payload_kind(stream)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "payload_kind")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("chars_in"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "payload_kind",
            "n_turns",
            "chars_in",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_upsert(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming extraction landing in the transactional MergeSink via
    foreachBatch — the third Structured Streaming idiom next to the
    append sink (stream_extract) and arbitrary state (sessionizer).

    Each micro-batch extracts its files' turns and MERGEs them into the
    batch table keyed (conv_id, turn_idx). End-to-end effectively-once:
    the source commit log makes batch replay the only duplication mode,
    and merge_upsert is idempotent, so a replayed batch is a no-op.
    The same pattern targets Iceberg MERGE INTO on a real cluster
    (pipeline/iceberg.py).
    """
    from v2_ocr_spark.operators.extract import extract_turns
    from v2_ocr_spark.pipeline.maintenance import merge_upsert
    from v2_ocr_spark.streaming.stream_extract import TRANSCRIPT_DDL

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )

    def land(batch_df, batch_id: int) -> None:
        from v2_ocr_spark.pipeline.maintenance import (
            _affected_pids,
            _rewrite_partitions,
        )
        from v2_ocr_spark.pipeline.sink import MergeSink, held_lease
        from v2_ocr_spark.pipeline.runner import partition_id

        sink = MergeSink(out_dir)
        # with_metrics matches the BATCH staging schema — a narrow
        # bootstrap partition would otherwise become the table's first
        # parquet footer and silently drop metrics columns on read.
        # The key dedupe handles an at-least-once upstream writing one
        # turn into two files picked up by the same trigger: extraction
        # is deterministic per input row, so replayed keys carry
        # byte-identical payloads and dropDuplicates picks one of the
        # equals — without it the bootstrap path would commit both rows
        # (breaking the keyed table forever) and the merge path would
        # raise on its duplicate-key guard, replaying the same batch on
        # every restart (a permanent poison pill).
        extracted = (
            extract_turns(batch_df, with_metrics=True)
            .dropDuplicates(["conv_id", "turn_idx"])
            .persist()
        )
        try:
            # ONE lease spans the whole micro-batch (bootstrap + merge)
            # INCLUDING the partition-count pin — ensure_num_partitions
            # is a read-decide-write on _table.json, and pinning it
            # unleased could race a batch runner on a brand-new sink
            # (both read stored=None, both write, loser scatters rows)
            with held_lease(out_dir) as (_l, lost):
                np = sink.ensure_num_partitions(num_partitions)
                pids = _affected_pids(
                    extracted.select("conv_id").distinct(), np
                )
                done = set(sink.committed())
                fresh = sorted(set(pids) - done)
                if fresh:
                    # the stream IS the extraction for partitions it
                    # reaches first: bootstrap them through the
                    # copy-on-write commit path (merge_upsert's
                    # extraction-first policy is for BATCH maintenance
                    # callers, not this source)
                    _rewrite_partitions(
                        spark, sink,
                        extracted.where(
                            partition_id("conv_id", np).isin(fresh)
                        ),
                        fresh, np, "bootstrap", lease_lost=lost,
                    )
                touched = sorted(set(pids) & done)
                if touched:
                    merge_upsert(
                        spark, out_dir,
                        extracted.where(
                            partition_id("conv_id", np).isin(touched)
                        ),
                        num_partitions=np, lease=False, _lease_lost=lost,
                    )
        finally:
            # unpersist on EVERY exit — a failed micro-batch is retried
            # by the engine, and each retry would otherwise pin another
            # cached copy in executor storage for the session's life
            extracted.unpersist()

    writer = stream.writeStream.foreachBatch(land).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_turns(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact dedup on the turn key: dropDuplicatesWithinWatermark
    under an event-time watermark, so re-delivered turns (at-least-once
    upstreams, replayed producers) emit once and the key state EVICTS
    once the watermark passes the first sighting — bounded state, which
    plain dropDuplicates([keys]) does NOT give (without the event-time
    column in the key list its state grows with every distinct key
    forever). The traded contract: a replay arriving LATER than the
    watermark delay after the original is emitted again — at-least-once
    upstreams replay within their ack window, so size `watermark` to
    bound that window. Fourth Structured Streaming idiom here (append
    sink, arbitrary state, foreachBatch MERGE, keyed dedup)."""
    from v2_ocr_spark.streaming.stream_extract import TRANSCRIPT_DDL

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
