"""Structured Streaming crawl monitor — the streaming face of the engine.

The reference's Fetcher reports pages/s + kbit/s every second from a live
thread (fetcher/Fetcher.java:1244-1265) and kills low-throughput queues
(:1366-1386). In the Spark-first design those live signals become streams
over the tables the batch loop already commits:

- `stream_fetch_metrics`: readStream over the fetch_status table directory
  -> watermarked, windowed per-host throughput aggregation (the pages/s
  reporter re-expressed as a streaming group-by).
- `throughput_alerts`: hosts whose windowed success rate falls below a
  threshold (the kill-switch signal, emitted instead of acted on — the
  batch generator consumes it as a predicate next cycle).
- `stream_frontier_counts`: running status histogram of frontier deltas
  (CrawlDbReader stats as a live dashboard feed).
- `host_state_stream`: applyInPandasWithState politeness tracker — keeps
  per-host (last_fetch_ts, fetch_count, error_count) state across
  micro-batches; the streaming analogue of FetchItemQueue bookkeeping
  (fetcher/Fetcher.java:306-399).

All sources are file streams (parquet dirs the batch cycle appends to), so
the same code runs against cloud storage at production scale; tests drive
them with in-test parquet appends + `processAllAvailable()`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nutch_spark import schemas


def read_fetch_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the fetch_status parquet directory. The
    schema is the batch writer's FETCH_OUT_SCHEMA — ONE definition, so a
    column added to the fetch output (e.g. kernel_wall_ms) is visible to
    streaming consumers without a second hand-maintained copy."""
    from nutch_spark.operators.fetch import FETCH_OUT_SCHEMA

    return (
        spark.readStream.schema(FETCH_OUT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def stream_fetch_metrics(fetch_stream: DataFrame, window: str = "10 seconds",
                         watermark: str = "30 seconds") -> DataFrame:
    """Windowed per-host throughput: pages + success/gone counts per window.

    fetch_ts is the virtual clock (epoch ms) -> event time; the watermark
    bounds state for late partitions at scale.
    """
    ev = fetch_stream.withColumn("event_time", F.timestamp_millis(F.col("fetch_ts")))
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("pages"),
            F.sum(
                (F.col("fetch_status") == schemas.STATUS_FETCH_SUCCESS).cast("int")
            ).alias("ok"),
            F.sum(
                (F.col("fetch_status") == schemas.STATUS_FETCH_GONE).cast("int")
            ).alias("gone"),
            F.avg("content_length").alias("avg_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host", "pages", "ok", "gone", "avg_bytes",
        )
    )


def throughput_alerts(metrics: DataFrame, min_ok_ratio: float = 0.5,
                      min_pages: int = 5) -> DataFrame:
    """Kill-switch signal (Fetcher.java:1366-1386): windows where a host's
    success ratio drops below threshold."""
    return metrics.filter(
        (F.col("pages") >= min_pages)
        & ((F.col("ok") / F.col("pages")) < min_ok_ratio)
    ).select("window_start", "window_end", "host", "pages", "ok", "gone")


_HOST_STATE_SCHEMA = "last_fetch_ts long, fetch_count long, error_count long"
_HOST_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("last_fetch_ts", T.LongType(), True),
        T.StructField("fetch_count", T.LongType(), False),
        T.StructField("error_count", T.LongType(), False),
        T.StructField("min_gap_ms", T.LongType(), True),
    ]
)


def _host_state_fn(key, pdfs, state: GroupState):
    """Per-host politeness bookkeeping across micro-batches."""
    if state.exists:
        last_ts, n, errs = state.get
    else:
        last_ts, n, errs = None, 0, 0
    min_gap = None
    # ONE sort across all Arrow chunks of the micro-batch: chunks arrive in
    # storage order, not timestamp order, so sorting each chunk
    # independently while carrying last_ts across them can yield negative
    # gaps and leave last_fetch_ts at a non-max value in the saved state
    chunks = [pdf for pdf in pdfs if len(pdf)]
    batch = (pd.concat(chunks, ignore_index=True).sort_values("fetch_ts")
             if chunks else None)
    if batch is not None:
        pdf = batch
        for ts, status in zip(pdf["fetch_ts"], pdf["fetch_status"]):
            ts = int(ts)
            if last_ts is not None:
                gap = ts - last_ts
                min_gap = gap if min_gap is None else min(min_gap, gap)
            last_ts = ts
            n += 1
            if int(status) != schemas.STATUS_FETCH_SUCCESS:
                errs += 1
    state.update((last_ts, n, errs))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "last_fetch_ts": [last_ts],
            "fetch_count": [n],
            "error_count": [errs],
            "min_gap_ms": [min_gap],
        }
    )


def host_state_stream(fetch_stream: DataFrame) -> DataFrame:
    """applyInPandasWithState per-host tracker (custom stateful operator)."""
    return (
        fetch_stream.select("host", "fetch_ts", "fetch_status")
        .groupBy("host")
        .applyInPandasWithState(
            _host_state_fn,
            outputStructType=_HOST_OUT_SCHEMA,
            stateStructType=_HOST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append",
                  available_now: bool = True):
    """Start a memory-sink query (tests/dashboards); caller stops it.
    available_now=False keeps the query live across later file appends."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
