"""Batch/streaming parity for sessionize: the SAME session_window
expression run under readStream (AvailableNow, watermarked, complete/
update output into memory) produces the batch operator's sessions."""

import datetime as dt

from pyspark.sql import functions as F

from tabbyld_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _rows():
    out = []
    eid = 0
    for user in (1, 2, 3):
        for burst in range(3):  # 3 sessions per user, 40min apart
            for k in range(4):  # 4 events per session, 5min apart
                out.append(
                    (
                        eid,
                        user,
                        T0 + dt.timedelta(minutes=burst * 40 + k * 5),
                        float(user * 10 + k),
                    )
                )
                eid += 1
    return out


def test_streaming_sessions_equal_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    schema = "event_id long, user_id long, ts timestamp, value double"
    batch_df = spark.createDataFrame(_rows(), schema)
    batch_df.write.parquet(in_dir)

    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize(batch_df, gap="20 minutes").collect()
    )
    assert len(batch) == 9  # 3 users x 3 bursts

    stream = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), "20 minutes").alias("w"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("w")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_sessions_stream").collect()
    )
    assert got == batch
