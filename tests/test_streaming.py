"""Structured Streaming semantics tests (memory sink + processAllAvailable).

Mirrors the reference's incremental behaviors: message dedupe
(sqs.py:161-185), invalid-message diversion (sqs.py:95-108), last-event-wins
pooling (mit.py:186-197), event-time windows (F1 analog)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoharvest_spark.streaming import (
    EVENT_STREAM_SCHEMA,
    dedupe_messages,
    last_event_per_url_batch,
    read_event_stream,
    split_invalid,
    synth_event_batch,
    windowed_event_counts,
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    # two "arrivals" (micro-batches)
    for batch_i, (i0, n) in enumerate([(0, 60), (60, 60)]):
        pdf = pd.DataFrame(synth_event_batch(i0, n))
        spark.createDataFrame(pdf, EVENT_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return str(d)


def _run_to_memory(df, name: str, mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def test_stream_dedupe_and_split(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    valid, invalid = split_invalid(stream)
    deduped = dedupe_messages(valid)
    _run_to_memory(deduped, "dedup_out")
    out = spark.sql("SELECT * FROM dedup_out").toPandas()
    # batch truth
    all_rows = pd.DataFrame(synth_event_batch(0, 60) + synth_event_batch(60, 60))
    valid_rows = all_rows[
        all_rows.event.isin(["created", "deleted"]) & all_rows.url.notna()
    ]
    expected_ids = valid_rows.message_id.nunique()
    assert len(out) == expected_ids
    assert out.message_id.is_unique

    _run_to_memory(invalid, "invalid_out")
    inv = spark.sql("SELECT * FROM invalid_out").toPandas()
    assert len(inv) == len(all_rows) - len(valid_rows)
    assert len(inv) > 0  # side-channel caught the bad ones


def test_stream_windowed_counts(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    valid, _ = split_invalid(stream)
    agg = windowed_event_counts(valid, window="10 minutes")
    _run_to_memory(agg, "win_out", mode="append")
    out = spark.sql("SELECT * FROM win_out").toPandas()
    # append mode emits only watermark-closed windows; at least the early
    # ones must have been finalized, with sane counts
    assert (out.n > 0).all()
    assert (out.win_end > out.win_start).all()


def test_last_event_per_url_batch_kernel(spark):
    rows = synth_event_batch(0, 40)
    df = spark.createDataFrame(pd.DataFrame(rows), EVENT_STREAM_SCHEMA)
    out = last_event_per_url_batch(df.where(F.col("url").isNotNull())).toPandas()
    assert out.url.is_unique
    # the kept row per url is the max-seq row
    truth = (
        pd.DataFrame(rows)
        .dropna(subset=["url"])
        .sort_values("seq")
        .groupby("url")
        .last()
        .reset_index()
    )
    m = out.merge(truth, on="url", suffixes=("_got", "_want"))
    assert (m.seq_got == m.seq_want).all()
    assert (m.event_got == m.event_want).all()


def test_streaming_last_event_foreachbatch(spark, stream_dir, tmp_path):
    from geoharvest_spark.streaming import run_last_event_stream

    stream = read_event_stream(spark, stream_dir)
    valid, _ = split_invalid(stream)
    q = run_last_event_stream(valid, "pool", str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    out = spark.table("global_temp.pool_state").toPandas()
    assert out.url.is_unique and len(out) > 0
    # equal to the batch kernel over the whole input
    whole = spark.read.schema(EVENT_STREAM_SCHEMA).parquet(stream_dir)
    whole_valid = split_invalid(whole)[0]
    truth = last_event_per_url_batch(whole_valid).toPandas()
    m = out.merge(truth, on="url", suffixes=("_s", "_t"))
    assert len(m) == len(truth)
    assert (m.seq_s == m.seq_t).all()


def test_last_event_stateful_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): state carries the
    winner ACROSS micro-batches — a later batch with a lower seq must not
    displace an earlier batch's higher seq (the foreachBatch emulation and
    the batch kernel agree)."""
    import datetime as dt

    from geoharvest_spark.streaming import last_event_stateful

    d = tmp_path / "sstream"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    # batch 1: u1 seq 5 (deleted), u2 seq 3
    b1 = [
        {"message_id": "a", "event_ts": t0, "event": "created", "url": "u1", "seq": 1},
        {"message_id": "b", "event_ts": t0, "event": "deleted", "url": "u1", "seq": 5},
        {"message_id": "c", "event_ts": t0, "event": "created", "url": "u2", "seq": 3},
    ]
    # batch 2: u1 seq 4 (LOWER - must lose), u2 seq 9 (wins), u3 new
    b2 = [
        {"message_id": "d", "event_ts": t0, "event": "created", "url": "u1", "seq": 4},
        {"message_id": "e", "event_ts": t0, "event": "deleted", "url": "u2", "seq": 9},
        {"message_id": "f", "event_ts": t0, "event": "created", "url": "u3", "seq": 7},
    ]
    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(pd.DataFrame(rows), EVENT_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(d))

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .parquet(str(d))
    )
    out = last_event_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_last")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    res = spark.table("stateful_last").toPandas()
    # last update per url across the whole run
    final = (
        res.sort_values("seq").groupby("url").last().reset_index()
    )
    got = {r.url: (r.seq, r.event) for r in final.itertuples()}
    assert got["u1"] == (5, "deleted")  # batch-2 seq 4 did NOT displace
    assert got["u2"] == (9, "deleted")
    assert got["u3"] == (7, "created")


def test_sessionize_stateful_event_time_timeout(spark, tmp_path):
    """Custom stateful sessionization (applyInPandasWithState +
    EventTimeTimeout): gap-exceeding rows close sessions inline, and an
    IDLE key's open session is closed by the event-time timeout once the
    watermark passes last+gap — proving bounded state eviction."""
    import datetime as dt

    from geoharvest_spark.streaming import sessionize_stateful

    t0 = dt.datetime(2024, 1, 1)

    def row(mid, url, sec):
        return {
            "message_id": mid,
            "event_ts": t0 + dt.timedelta(seconds=sec),
            "event": "created",
            "url": url,
            "seq": sec,
        }

    batches = [
        [row("a1", "a", 0), row("a2", "a", 10), row("a3", "a", 20),
         row("i1", "idle", 5)],
        [row("a4", "a", 200)],   # closes a:[0,20] (gap 60 exceeded)
        [row("a5", "a", 10000)],  # closes a:[200,200]; watermark passes
                                  # idle's 5+60 -> timeout fires
    ]
    d = tmp_path / "sess_stream"
    d.mkdir()
    for rows in batches:
        spark.createDataFrame(pd.DataFrame(rows), EVENT_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(d))
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withWatermark("event_ts", "10 seconds")
    )
    q = (
        sessionize_stateful(stream, gap_seconds=60)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("sess_out").toPandas()
    got = {
        (r.url, r.sess_start.second + r.sess_start.minute * 60,
         (r.sess_end - r.sess_start).total_seconds(), r.n_events)
        for r in out.itertuples()
    }
    assert ("a", 0, 20.0, 3) in got       # closed inline by the 200s row
    assert ("a", 200, 0.0, 1) in got      # closed inline by the 10000s row
    assert any(u == "idle" and n == 1 for (u, _s, _d, n) in got)  # TIMEOUT
    # the final open session (a @ 10000s) must NOT be emitted
    assert len(out) == 3


def test_streaming_pii_scrub_and_quality_narrow_ops(spark, tmp_path):
    """The r5 corpus ops are narrow codegen transforms, so they compose
    directly into a streaming plan: micro-batched docs flow through
    redact_pii + stratified_hash_sample + hash_split inside readStream ->
    memory sink, and the streamed results equal the batch run exactly."""
    import json
    import os

    from geoharvest_spark import textops as tx

    d = tmp_path / "docs"
    d.mkdir()
    rows = [
        {
            "doc_id": i,
            "lang": ["en", "fr"][i % 2],
            "text": f"doc {i} mail u{i}@ex{i % 3}.com ip 10.0.0.{i % 250}",
        }
        for i in range(120)
    ]
    for b, sl in enumerate([rows[:60], rows[60:]]):
        with open(d / f"b{b}.json", "w") as f:
            for r in sl:
                f.write(json.dumps(r) + "\n")
        os.utime(d / f"b{b}.json", (1_700_000_000 + b, 1_700_000_000 + b))

    def pipeline(df):
        return tx.hash_split(
            tx.stratified_hash_sample(
                tx.redact_pii(df.select("doc_id", "lang", "text"),
                              id_col="doc_id"),
                "lang",
                {"en": 10000, "fr": 5000},
            )
        )

    batch_df = spark.read.json(str(d))
    expect = {
        r["doc_id"]: (r["text"], r["n_email"], r["sampled"], r["split"])
        for r in pipeline(batch_df).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(d))
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["sampled"], r["split"])
        for r in spark.sql("SELECT * FROM pii_stream").collect()
    }
    assert got == expect
    assert all("@" not in v[0] and v[1] == 1 for v in got.values())
