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
