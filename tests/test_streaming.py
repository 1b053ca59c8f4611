"""Structured Streaming monitor tests: file-source fetch stream ->
windowed throughput, alerts, and the stateful per-host tracker."""

from __future__ import annotations

from nutch_spark import schemas
from nutch_spark.streaming.monitor import (
    host_state_stream,
    read_fetch_stream,
    run_to_memory,
    stream_fetch_metrics,
    throughput_alerts,
)

T0 = 1_700_000_000_000


def _write_batch(spark, path, rows):
    from nutch_spark.operators.fetch import FETCH_OUT_SCHEMA

    df = spark.createDataFrame(
        [
            (u, h, st, ts, i, None, None, 100, False, 1.0, 3600, 0, 0, None,
             None, 0, len(rows))
            for i, (u, h, st, ts) in enumerate(rows)
        ],
        schema=FETCH_OUT_SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(query):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)


def test_windowed_throughput_and_alerts(spark, tmp_path):
    path = str(tmp_path / "fetch_status")
    ok, gone = schemas.STATUS_FETCH_SUCCESS, schemas.STATUS_FETCH_GONE
    _write_batch(spark, path, [
        (f"http://a.com/{i}", "a.com", ok, T0 + i * 1000) for i in range(8)
    ] + [
        (f"http://b.com/{i}", "b.com", gone, T0 + i * 1000) for i in range(6)
    ])

    stream = read_fetch_stream(spark, path)
    metrics = stream_fetch_metrics(stream, window="10 seconds")
    q = run_to_memory(metrics, "m1", output_mode="complete")
    _drain(q)
    out = spark.sql("select * from m1").collect()
    assert out, "no windows emitted"
    a_pages = sum(r.pages for r in out if r.host == "a.com")
    b_gone = sum(r.gone for r in out if r.host == "b.com")
    assert a_pages == 8
    assert b_gone == 6

    alerts = throughput_alerts(metrics, min_ok_ratio=0.5, min_pages=5)
    q2 = run_to_memory(alerts, "m2", output_mode="complete")
    _drain(q2)
    alert_hosts = {r.host for r in spark.sql("select * from m2").collect()}
    assert "b.com" in alert_hosts     # all gone -> alert
    assert "a.com" not in alert_hosts  # all ok -> no alert


def test_host_state_tracker_across_batches(spark, tmp_path):
    path = str(tmp_path / "fetch_status2")
    ok, retry = schemas.STATUS_FETCH_SUCCESS, schemas.STATUS_FETCH_RETRY
    # batch 1: three fetches for host c, 2s apart
    _write_batch(spark, path, [
        (f"http://c.com/{i}", "c.com", ok, T0 + i * 2000) for i in range(3)
    ])
    stream = read_fetch_stream(spark, path)
    tracked = host_state_stream(stream)
    q = run_to_memory(tracked, "hs", output_mode="update", available_now=False)
    q.processAllAvailable()

    # batch 2: two more incl. an error, 5s later
    _write_batch(spark, path, [
        ("http://c.com/9", "c.com", retry, T0 + 11000),
        ("http://c.com/10", "c.com", ok, T0 + 13000),
    ])
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = spark.sql(
        "select * from hs order by fetch_count desc limit 1"
    ).collect()
    assert rows
    final = rows[0]
    # state persisted across micro-batches: counts accumulate
    assert final.fetch_count == 5
    assert final.error_count == 1
    assert final.last_fetch_ts == T0 + 13000
    assert final.min_gap_ms == 2000
