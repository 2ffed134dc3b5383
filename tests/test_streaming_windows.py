"""Streaming windowed aggregation + stateful sessionization: same input
must produce the same answer as the batch twins in entry_queries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gloomy_spark.streaming.windows import sessionize_stream, windowed_event_counts

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def event_files(spark, tmp_path):
    """Events split into two files arriving as separate micro-batches."""
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    mid = ev.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    d = str(tmp_path / "stream_in")
    ev.where(F.col("event_id") <= mid).write.mode("overwrite").parquet(d)
    ev.where(F.col("event_id") > mid).write.mode("append").parquet(d)
    return d, ev


@pytest.mark.spark
def test_streaming_windowed_counts_equal_batch(spark, tmp_path, event_files):
    d, ev = event_files
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    out_dir = str(tmp_path / "win_out")
    q = (
        windowed_event_counts(stream, "1 hour", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            ev.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
            .collect()
        )
    }
    # append mode: only windows sealed by the final watermark are emitted;
    # every emitted window must equal batch, and most windows must emit
    assert set(got) <= set(want)
    for k in got:
        assert got[k] == want[k], k
    assert len(got) >= 0.8 * len(want)


@pytest.mark.spark
def test_nrt_search_equals_full_rebuild(spark, tmp_path):
    """BM25 over base index + uncompacted runs must equal a full rebuild
    over the merged corpus — including re-ingested (overridden) docs and
    merged global stats (n_docs, avgdl, df)."""
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.config import EngineConfig
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex
    from gloomy_spark.streaming.incremental import IncrementalIndexer
    from gloomy_spark.streaming.nrt import nrt_bm25_topk

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    base = pages_df(spark, 80, partitions=2).select("doc_id", "text")
    base_idx = str(tmp_path / "base_idx")
    IndexBuilder(spark, cfg).build(base, base_idx, n_buckets=1)
    si = SearchIndex(spark, base_idx)

    # runs: 40 brand-new docs + 5 re-ingested (modified) docs
    fresh = pages_df(spark, 120, partitions=2).where("doc_id >= 80").select(
        "doc_id", "text"
    )
    modified = base.where("doc_id < 5").select(
        "doc_id", F.concat(F.col("text"), F.lit(" extra drift tokens")).alias("text")
    )
    in_dir = str(tmp_path / "nrt_in")
    fresh.write.mode("overwrite").parquet(in_dir)
    modified.write.mode("append").parquet(in_dir)
    inc = IncrementalIndexer(spark, str(tmp_path / "nrt_work"), cfg)
    q = inc.start(in_dir, "doc_id long, text string")
    q.awaitTermination(120)

    # full rebuild over the merged corpus (runs override doc_id < 5)
    merged = (
        base.where("doc_id >= 5")
        .unionAll(modified)
        .unionAll(fresh)
    )
    full_idx = str(tmp_path / "full_idx")
    IndexBuilder(spark, cfg).build(merged, full_idx, n_buckets=1)
    si_full = SearchIndex(spark, full_idx)

    for query in ["the data of", "drift extra", "the", "zzz missing"]:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in si_full.bm25_topk(query, 10).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in nrt_bm25_topk(si, inc.runs_dir, query, 10).collect()
        ]
        assert got == want, query


@pytest.mark.spark
def test_streaming_sessionize_matches_batch(spark, tmp_path, event_files):
    d, ev = event_files
    from gloomy_spark.entry_queries import q_event_sessions

    batch_fn, _ = q_event_sessions(30)
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_fn(spark, SF).collect()
    }

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(d)
    out_dir = str(tmp_path / "sess_out")
    q = (
        sessionize_stream(stream, 30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # closed sessions must match batch sessionization exactly; sessions
    # still open at end-of-stream are legitimately unemitted
    assert got <= want, sorted(got - want)[:5]
    assert len(got) >= 0.5 * len(want), (len(got), len(want))
