"""Watermarked windowed aggregation: bounded-lateness semantics
(SURVEY.md §2.13) — a late event beyond the watermark is dropped, a late
event within the watermark still counts, and each window emits exactly once.
"""

import datetime

from pyspark.sql import types as T

from magneto_matcher_spark.streaming.windows import windowed_event_counts_stream

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, offset_min, value=1.0):
    return (eid, T0 + datetime.timedelta(minutes=offset_min), value)


def test_watermark_drops_late_keeps_in_horizon(spark, tmp_path):
    in_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    emitted: list = []

    def drop(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / name)
        )
        q = (
            windowed_event_counts_stream(
                spark.readStream.schema(EV_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(str(in_dir)),
                window="10 minutes",
                watermark="10 minutes",
            )
            .writeStream.foreachBatch(
                lambda df, _b: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # drop 1: window A = [00:00, 00:10) gets one event; an event at 00:25
    # pushes the watermark to 00:15 > A.end, finalizing A
    drop([_ev(1, 1, 1.5), _ev(2, 25, 10.0)], "d1")
    # drop 2: event at 00:05 is LATER than the watermark (00:15) → dropped;
    # event at 00:22 is late-but-within (window B still open) → counted;
    # event at 00:55 advances the watermark past B.end, finalizing B
    drop([_ev(3, 5, 99.0), _ev(4, 22, 20.0), _ev(5, 55, 1.0)], "d2")

    got = {r["window_start"]: (r["events"], r["sum_value"]) for r in emitted}
    a_start = int(T0.timestamp())
    b_start = a_start + 20 * 60
    assert got[a_start] == (1, 1.5)          # late ev 3 NOT re-counted
    assert got[b_start] == (2, 30.0)         # in-horizon late ev 4 counted
    assert set(got) == {a_start, b_start}    # window C (00:50) still open
    assert len(emitted) == 2                 # exactly-once emission
