"""Incremental (Structured Streaming) extraction: streamed result must
equal the batch result on the same corpus, and compaction must produce
the same edges as the batch pipeline."""

from kgw_spark.model import triple_view
from kgw_spark.sinks.store import TableStore
from kgw_spark.sources.corpus import corpus_df
from kgw_spark.streaming.incremental import compact, start_incremental_extraction
from tests.conftest import alias_df_from_truth


def test_streaming_matches_batch(spark, small_corpus, tmp_path):
    rows, truth = small_corpus
    drop = str(tmp_path / "drop")
    # two parquet drops, as if snapshots arrived over time
    half = len(rows) // 2
    corpus_df(spark, rows[:half]).coalesce(1).write.mode("append").parquet(drop)
    corpus_df(spark, rows[half:]).coalesce(1).write.mode("append").parquet(drop)

    q = start_incremental_extraction(
        spark,
        drop,
        str(tmp_path / "mentions"),
        str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    adf = alias_df_from_truth(spark, truth)
    store = TableStore(str(tmp_path / "store"))
    manifests = compact(spark, str(tmp_path / "mentions"), adf, store, "s1")
    assert manifests["edges"]["rows"] > 0

    got = {
        (r.subj, r.pred, r.obj)
        for r in triple_view(store.read(spark, "edges")).collect()
    }
    assert got == truth.triples


def test_windowed_watermark_stream_matches_batch(spark, tmp_path):
    from kgw_spark.streaming.incremental import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    drop = str(tmp_path / "edrop")
    events.coalesce(2).write.mode("overwrite").parquet(drop)

    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(drop)
    out_dir = str(tmp_path / "wout")
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch result exactly
    assert got
    assert all(batch[k] == v for k, v in got.items())


def test_sessionize_stream_matches_batch_oracle(spark, tmp_path):
    """applyInPandasWithState session assembly: sessions close on gap
    or event-time timeout; over a bounded input (plus a watermark-
    advancing sentinel) the emitted set equals the pure-pandas oracle."""
    import pandas as pd

    from kgw_spark.streaming.incremental import (
        sessionize_batch_oracle,
        sessionize_stream,
    )

    base = pd.Timestamp("2025-01-01 00:00:00")
    rows = []
    for u in range(3):
        for k in range(3):  # session 1: 3 events, 10-minute spacing
            rows.append((u, base + pd.Timedelta(minutes=10 * k + u)))
        for k in range(2):  # session 2: 5 hours later
            rows.append((u, base + pd.Timedelta(hours=5, minutes=7 * k + u)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])

    drop, out, ck = (str(tmp_path / d) for d in ("drop", "out", "ck"))
    events = spark.createDataFrame(pdf)
    events.coalesce(1).write.mode("append").parquet(drop)

    def run_available():
        src = spark.readStream.schema(events.schema).parquet(drop)
        q = (
            sessionize_stream(src, gap_sec=1800, watermark_delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    # sentinel far in the future advances the watermark past every
    # session timeout on the second run
    sentinel = spark.createDataFrame(
        pd.DataFrame([(99, base + pd.Timedelta(days=30))], columns=["user_id", "ts"])
    )
    sentinel.coalesce(1).write.mode("append").parquet(drop)
    run_available()

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).filter("user_id < 99").collect()
    )
    assert got == sessionize_batch_oracle(pdf, gap_sec=1800)
    # two sessions per user, correct event counts
    assert len(got) == 6 and {g[3] for g in got} == {3, 2}


def test_sessionize_stream_out_of_order_across_batches(spark, tmp_path):
    """A late event (inside the watermark delay) arriving in a LATER
    micro-batch must backfill buffered sessions: batch 1 carries events
    at t0 and t0+35min (two sessions under a 30-min gap if finalized
    eagerly), batch 2 backfills t0+20min, fusing them into ONE 3-event
    session. The emitted result must equal the batch oracle over the
    full data — sessions are a pure function of the data, not of
    arrival order."""
    import pandas as pd

    from kgw_spark.streaming.incremental import (
        sessionize_batch_oracle,
        sessionize_stream,
    )

    base = pd.Timestamp("2025-01-01 12:00:00")
    batch1 = pd.DataFrame(
        [(1, base), (1, base + pd.Timedelta(minutes=35))],
        columns=["user_id", "ts"],
    )
    late = pd.DataFrame(
        [(1, base + pd.Timedelta(minutes=20))], columns=["user_id", "ts"]
    )
    drop, out, ck = (str(tmp_path / d) for d in ("drop", "out", "ck"))

    def run_available():
        src = spark.readStream.schema("user_id long, ts timestamp").parquet(drop)
        q = (
            sessionize_stream(src, gap_sec=1800, watermark_delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for df in (batch1, late):
        spark.createDataFrame(df).coalesce(1).write.mode("append").parquet(drop)
        run_available()
    sentinel = spark.createDataFrame(
        pd.DataFrame([(99, base + pd.Timedelta(days=30))], columns=["user_id", "ts"])
    )
    sentinel.coalesce(1).write.mode("append").parquet(drop)
    run_available()

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).filter("user_id < 99").collect()
    )
    full = pd.concat([batch1, late], ignore_index=True)
    assert got == sessionize_batch_oracle(full, gap_sec=1800)
    assert len(got) == 1 and got[0][3] == 3  # one fused session


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Ingestion-time streaming dedup: duplicates planted across two
    file drops (all within the watermark horizon) are dropped; the
    surviving content-hash set equals the batch exact dedup's."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kgw_spark.streaming.incremental import stream_dedup_exact

    rows1 = [(i, f"document body {i}", f"2024-01-01 10:{i:02d}:00") for i in range(20)]
    # second drop: 10 new docs + 10 re-arrivals of earlier content
    rows2 = [
        (100 + i, f"document body {100 + i}", f"2024-01-01 11:{i:02d}:00")
        for i in range(10)
    ] + [(200 + i, f"document body {i}", f"2024-01-01 11:3{i % 10}:00") for i in range(10)]
    drop = str(tmp_path / "drop")
    schema = "doc_id long, text string, ts string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(drop)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(drop)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    out_dir = str(tmp_path / "deduped")
    q = (
        stream_dedup_exact(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = spark.createDataFrame(rows1 + rows2, schema)
    expected_hashes = {
        r["h"] for r in batch.select(F.sha2("text", 256).alias("h")).distinct().collect()
    }
    assert got.count() == 30  # 20 + 10 new; the 10 re-arrivals dropped
    assert {r["text_sha256"] for r in got.collect()} == expected_hashes


def test_stream_interval_join_matches_batch_and_range_join(spark, tmp_path):
    """Stream-stream interval join == the same function on batch frames
    == the INDEPENDENT batch range_join (banded equi-join) on epoch
    micros: three implementations, one pair set."""
    from pyspark.sql import functions as F

    from kgw_spark.operators.asof import range_join
    from kgw_spark.streaming.incremental import stream_interval_join

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )

    def pairset(df, lcol, rcol):
        return {(r[lcol], r[rcol]) for r in df.collect()}

    batch = pairset(
        stream_interval_join(errors, clicks, ["user_id"], lower_sec=-7200),
        "event_id",
        "r_event_id",
    )

    # independent implementation: banded equi-join on integer micros
    tus = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2020-01-01 00:00:00', ts)"
    )
    e2 = errors.select(F.col("event_id").alias("lid"), "user_id", tus.alias("t"))
    c2 = clicks.select(F.col("event_id").alias("rid"), "user_id", tus.alias("t"))
    banded = pairset(
        range_join(e2, c2, ["user_id"], "t", "t", -7200 * 1_000_000, 0),
        "lid",
        "r_rid",
    )
    assert batch == banded and batch

    # streaming run over parquet drops of both sides
    ldrop, rdrop = str(tmp_path / "ldrop"), str(tmp_path / "rdrop")
    errors.coalesce(2).write.mode("overwrite").parquet(ldrop)
    clicks.coalesce(2).write.mode("overwrite").parquet(rdrop)
    ls = spark.readStream.schema(errors.schema).parquet(ldrop)
    rs = spark.readStream.schema(clicks.schema).parquet(rdrop)
    out = str(tmp_path / "ijout")
    q = (
        stream_interval_join(ls, rs, ["user_id"], lower_sec=-7200)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ijckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pairset(spark.read.parquet(out), "event_id", "r_event_id")
    assert got == batch
