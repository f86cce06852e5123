"""Incremental KG construction over a streaming corpus source.

The reference is batch-only (SURVEY §1.4: "no streaming"); this module
is the Spark-first extension for continuously-arriving repository
snapshots: a file-source stream of corpus parquet drops is extracted,
linked, and appended to the mentions store each micro-batch, with the
dedup/canonicalize/build stages run as periodic batch compaction
(the classic lambda-free incremental-ETL split: append cheap,
re-derive heavy tables from the appended log).

Extraction and linking are stateless per-row → safe in a streaming
query. Triple dedup and connected components are global — they run in
``compact()`` against the accumulated mentions table, not per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgw_spark.model import CORPUS_SCHEMA
from kgw_spark.operators.canon import canonicalize, compose_mapping
from kgw_spark.operators.extract import extract_mentions
from kgw_spark.operators.graph import build_edges, build_nodes
from kgw_spark.sinks.store import TableStore


def stream_corpus(spark: SparkSession, drop_dir: str) -> DataFrame:
    """File-source stream: new parquet files under ``drop_dir`` are new
    corpus rows (exactly-once via checkpointed file tracking)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )


def start_incremental_extraction(
    spark: SparkSession,
    drop_dir: str,
    mentions_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Continuously extract mentions from arriving corpus files and
    append them (partitioned by predicate) to the mentions log."""
    stream = stream_corpus(spark, drop_dir)
    mentions = extract_mentions(stream)
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", mentions_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("pred")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(
    spark: SparkSession,
    mentions_dir: str,
    alias_df: DataFrame,
    store: TableStore,
    fingerprint: str,
) -> dict:
    """Batch compaction: canonicalize the accumulated mentions log and
    re-derive the nodes/edges tables (idempotent; safe to run on a
    schedule while the extraction stream keeps appending)."""
    mentions = spark.read.parquet(mentions_dir)
    canonical = canonicalize(mentions, compose_mapping(alias_df))
    edges_manifest = store.write(
        build_edges(canonical), "edges", partition_by="type",
        input_fingerprint=fingerprint,
    )
    edges = store.read(spark, "edges")
    nodes_manifest = store.write(
        build_nodes(edges), "nodes", partition_by="type",
        input_fingerprint=fingerprint,
    )
    return {"edges": edges_manifest, "nodes": nodes_manifest}


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming events
    source (ts, event_type, value): late rows beyond ``watermark_delay``
    are dropped, state for closed windows is evicted — the standard
    Structured Streaming pattern for unbounded aggregation. Works on a
    batch DataFrame too (watermark is a no-op there), which is how the
    test checks stream==batch equivalence."""
    from pyspark.sql import functions as F

    ts = F.col("ts").cast("timestamp")
    return (
        events_stream.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_dedup_exact(
    docs_stream: DataFrame,
    watermark_delay: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Ingestion-time exact dedup of a streaming document source: the
    first arrival of each content hash passes, re-arrivals within the
    watermark horizon are dropped
    (``dropDuplicatesWithinWatermark`` — state is evicted once the
    watermark passes, so it is bounded by arrival rate × delay, not by
    corpus size). The shuffle key is the 32-byte sha256, never the
    document — the same discipline as the batch ``exact_duplicates``.

    Trade-off, stated: a duplicate arriving AFTER the watermark horizon
    re-emits (its state is gone). A 100-TB pipeline composes this
    stream-side filter (kills the overwhelmingly-common near-in-time
    re-crawls cheaply) with the global batch dedup in the periodic
    ``compact()`` pass, which is exact over all time."""
    from pyspark.sql import functions as F

    return (
        docs_stream.withColumn("ts", F.col(ts_col).cast("timestamp"))
        .withColumn("text_sha256", F.sha2(F.col(text_col), 256))
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["text_sha256"])
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: streaming sessionization via
# applyInPandasWithState — per-user session assembly with gap timeout,
# the canonical "operator Spark's built-ins can't express" (session
# windows with per-session aggregates emitted on close). State is one
# small tuple per user; event batches arrive Arrow-vectorized.
# ---------------------------------------------------------------------------
SESSION_SCHEMA = "user_id long, session_start string, session_end string, n_events int"
_SESSION_STATE_SCHEMA = "pending array<bigint>"


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-user sessions from a streaming (user_id, ts, ...) source:
    a session closes when no event arrives within ``gap_sec``; closed
    sessions are emitted with start/end/count.

    OUT-OF-ORDER SAFE: event timestamps are buffered in state until the
    watermark proves no admissible event can still change a session —
    a session (start..end) is emitted only once ``end + gap <
    watermark``, because any not-yet-dropped event m satisfies m ≥
    watermark > end + gap and therefore belongs to a LATER session. A
    late event inside the watermark delay can thus extend, backfill, or
    merge still-buffered sessions and the result stays a pure function
    of the data (== sessionize_batch_oracle), regardless of arrival
    order across micro-batches. State per user is only the timestamps
    of not-yet-emittable sessions — bounded by the watermark horizon.
    The event-time timeout flushes everything once the watermark passes
    the last pending event's gap."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_sec * 1000

    def assemble(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        new_ms = []
        for pdf in pdfs:
            new_ms.extend(
                int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"])
            )
        closed = []

        def close(run):
            closed.append(
                (
                    user_id,
                    pd.Timestamp(run[0], unit="ms").strftime("%Y-%m-%d %H:%M:%S"),
                    pd.Timestamp(run[-1], unit="ms").strftime("%Y-%m-%d %H:%M:%S"),
                    len(run),
                )
            )

        def runs_of(ms):
            runs = [[ms[0]]]
            for m in ms[1:]:
                if m - runs[-1][-1] > gap_ms:
                    runs.append([m])
                else:
                    runs[-1].append(m)
            return runs

        if state.hasTimedOut:
            pending = sorted(state.get[0]) if state.exists else []
            if pending:
                for run in runs_of(pending):
                    close(run)
            state.remove()
        else:
            pending = sorted(
                (list(state.get[0]) if state.exists else []) + new_ms
            )
            wm = state.getCurrentWatermarkMs()
            keep: list[int] = []
            for run in runs_of(pending):
                if run[-1] + gap_ms < wm:
                    close(run)
                else:
                    keep.extend(run)
            if keep:
                state.update((keep,))
                # flush when the watermark proves the last session closed
                state.setTimeoutTimestamp(max(keep[-1] + gap_ms, wm + 1))
            else:
                state.remove()
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(events_pdf, gap_sec: int = 1800):
    """Pure-pandas reference for sessionize_stream on a bounded input
    (all sessions closed at end-of-data) — the stream==batch test
    oracle."""
    import pandas as pd

    out = []
    for user_id, g in events_pdf.groupby("user_id"):
        ms = sorted(int(t.value // 1_000_000) for t in pd.to_datetime(g["ts"]))
        start, last, n = ms[0], ms[0], 1
        for m in ms[1:]:
            if m - last > gap_sec * 1000:
                out.append((user_id, start, last, n))
                start, n = m, 0
            last, n = m, n + 1
        out.append((user_id, start, last, n))
    return sorted(
        (
            u,
            pd.Timestamp(s, unit="ms").strftime("%Y-%m-%d %H:%M:%S"),
            pd.Timestamp(e, unit="ms").strftime("%Y-%m-%d %H:%M:%S"),
            n,
        )
        for u, s, e, n in out
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = -7200,
    upper_sec: int = 0,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: all (left, right) pairs
    sharing ``key_cols`` with ``right_ts`` in ``[left_ts + lower_sec,
    left_ts + upper_sec]`` — the streaming twin of the batch
    ``operators.asof.range_join`` (same pair semantics, proven
    equivalent by test). Right-side columns come back prefixed ``r_``.

    Scale shape: both sides are watermarked and the join condition
    bounds the two event times against each other, which is exactly
    what Structured Streaming needs to EVICT buffered rows — state per
    side is arrival-rate × (watermark + window width), not unbounded.
    Works on batch frames too (watermark is a no-op there), which is
    how the stream==batch test closes the loop.
    """
    from pyspark.sql import functions as F

    if upper_sec <= lower_sec:
        raise ValueError(
            f"stream_interval_join needs upper > lower, got [{lower_sec}, {upper_sec}]"
        )
    l2 = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r2 = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]).withColumn(
        f"r_{right_ts}", F.col(f"r_{right_ts}").cast("timestamp")
    )
    if left.isStreaming or right.isStreaming:
        l2 = l2.withWatermark(left_ts, watermark_delay)
        r2 = r2.withWatermark(f"r_{right_ts}", watermark_delay)
    rt, lt = F.col(f"r_{right_ts}"), F.col(left_ts)
    cond = (
        (rt >= lt + F.expr(f"INTERVAL {lower_sec} SECOND"))
        & (rt <= lt + F.expr(f"INTERVAL {upper_sec} SECOND"))
    )
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    return l2.join(r2, cond, "inner")
