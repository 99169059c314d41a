"""applyInPandasWithState: state must persist across microbatches (via
the checkpoint) and accumulate exactly; foreachBatch must land parquet."""

from __future__ import annotations

import datetime as dt

from discogs_xml_to_parquet_spark.streaming.stateful import running_user_totals

SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _latest(spark, qname):
    # update-mode memory sink accumulates one row per (key, batch);
    # n_events is monotone per user, so max() is the latest state
    return {
        r["user_id"]: (r["n"], r["v"])
        for r in spark.sql(
            f"SELECT user_id, max(n_events) AS n, max(total_value) AS v "
            f"FROM {qname} GROUP BY user_id"
        ).collect()
    }


def test_state_accumulates_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)

    # one continuously-running query; state lives in its state store
    # across microbatches (memory sink does not support checkpoint
    # *recovery*, so two availableNow runs would be rejected)
    _write_batch(spark, src, [
        (1, t, 100, "click", 1.5, "{}"),
        (2, t, 100, "click", 2.25, "{}"),
        (3, t, 200, "view", 10.0, "{}"),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_user_totals(stream.select("user_id", "value"))
        .writeStream.format("memory")
        .queryName("state_run")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = _latest(spark, "state_run")
        assert first[100] == (2, 3.75)
        assert first[200] == (1, 10.0)

        _write_batch(spark, src, [(4, t, 100, "click", 0.25, "{}")])
        q.processAllAvailable()
        second = _latest(spark, "state_run")
        assert second[100] == (3, 4.0)  # 2+1 events, 3.75+0.25 exactly
        assert second[200] == (1, 10.0)  # untouched key unchanged
    finally:
        q.stop()


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch: the streaming->parquet landing pattern (per-batch
    custom sink logic, e.g. partitioned appends + metrics)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [
        (1, t, 1, "click", 1.0, "{}"),
        (2, t, 2, "view", 2.0, "{}"),
    ])

    def land(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_cdc_latest_state_matches_batch_compaction(spark, tmp_path):
    """Streaming CDC compaction (latest_keyed_state) must converge to
    the batch q_cdc_apply answer on the same changelog, regardless of
    how the rows are split across microbatches -- the replay-safety
    property that makes the operator usable as an incremental
    materialization of the batch query."""
    import pandas as pd  # noqa: F401

    from discogs_xml_to_parquet_spark.streaming.stateful import (
        latest_keyed_state,
    )

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)

    # out-of-order arrivals across batches; user 300's final op is a
    # delete ('error'), user 100 gets its newest row in batch 1 and an
    # OLDER row in batch 2 (must not regress state)
    _write_batch(spark, src, [
        (1, t + 5 * s, 100, "click", 1.5, "{}"),
        (2, t + 1 * s, 200, "signup", 2.0, "{}"),
        (3, t + 9 * s, 300, "view", 7.0, "{}"),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        latest_keyed_state(
            stream.select("user_id", "ts", "event_id", "event_type", "value")
        )
        .writeStream.format("memory")
        .queryName("cdc_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [
            (4, t + 2 * s, 100, "view", 9.0, "{}"),   # older than event 1
            (5, t + 8 * s, 200, "purchase", 3.5, "{}"),
            (6, t + 30 * s, 300, "error", 0.0, "{}"),  # delete wins
        ])
        q.processAllAvailable()
        # latest emitted state per key = the row with max n_ops
        rows = spark.sql(
            "SELECT * FROM (SELECT *, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY n_ops DESC) rn FROM cdc_state)"
            " WHERE rn = 1"
        ).collect()
        stream_state = {
            r["user_id"]: (r["last_op"], r["last_value"], r["n_ops"])
            for r in rows
        }
    finally:
        q.stop()

    # batch lane over the identical changelog
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.schema(SCHEMA).parquet(src)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wp = Window.partitionBy("user_id")
    batch = {
        r["user_id"]: (r["event_type"], r["value"], r["n_ops"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wp))
        .filter(F.col("rn") == 1)
        .collect()
    }
    # every key agrees on (last op, last value, op depth); the batch
    # query then drops deletes -- mirror that check here
    assert stream_state == batch
    assert stream_state[300][0] == "error"  # delete is the latest op
