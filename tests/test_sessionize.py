"""Sessionization twins: batch gaps-and-islands vs applyInPandasWithState
stream (SURVEY.md §2.13 custom stateful operator)."""

import datetime

import pytest
from pyspark.sql import types as T

from magneto_matcher_spark.streaming.sessionize import (
    SESSION_OUT_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, offset_s, value=1.0):
    return (eid, T0 + datetime.timedelta(seconds=offset_s), user, value)


# user 1: two sessions (gap 2000s > 1800s); user 2: one session, sub-gap steps
EVENTS = [
    _ev(1, 1, 0, 1.5),
    _ev(2, 1, 100, 2.0),
    _ev(3, 1, 2100, 3.0),     # 2000s after event 2 → new session
    _ev(4, 1, 2200, 4.0),
    _ev(5, 2, 0, 10.0),
    _ev(6, 2, 1700, 20.0),    # 1700s < gap → same session
    _ev(7, 2, 3300, 30.0),    # 1600s < gap → same session
]


def test_batch_sessionize_islands(spark):
    out = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in sessionize_batch(
            spark.createDataFrame(EVENTS, EV_SCHEMA)
        ).collect()
    }
    base = T0.timestamp()
    assert out == {
        (1, 1): (base, base + 100, 2, 3.5),
        (1, 2): (base + 2100, base + 2200, 2, 7.0),
        (2, 1): (base, base + 3300, 3, 60.0),
    }


@pytest.mark.parametrize("split", [3, 5])
def test_stream_sessionize_matches_batch_closed_sessions(spark, tmp_path, split):
    """Drive the stateful stream in two availableNow drops; every session the
    batch twin closes (i.e. all but each user's tail session) must be emitted
    with identical bounds/aggregates, regardless of where the feed splits."""
    in_dir = tmp_path / f"in_{split}"
    ckpt = tmp_path / f"ckpt_{split}"
    in_dir.mkdir()
    emitted: list = []

    def drop(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / name)
        )
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(in_dir))
        )
        q = (
            sessionize_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop(EVENTS[:split], "d1")
    drop(EVENTS[split:], "d2")

    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in emitted
    }

    batch = sessionize_batch(spark.createDataFrame(EVENTS, EV_SCHEMA)).collect()
    open_tail = {}
    for r in batch:
        cur = open_tail.get(r["user_id"])
        if cur is None or r["session_idx"] > cur["session_idx"]:
            open_tail[r["user_id"]] = r
    expect = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in batch
        if open_tail[r["user_id"]]["session_idx"] != r["session_idx"]
    }
    assert got == expect and len(got) > 0


def test_stream_sessionize_schema(spark):
    assert SESSION_OUT_SCHEMA.count(",") == 4


def test_stream_sessionize_property_random_feeds(spark, tmp_path):
    """Property: for ANY random feed split into time-ordered drops, the
    stream's emitted sessions == the batch twin's closed sessions (all but
    each user's tail).  Deterministic seeded cases instead of a live
    hypothesis driver — each case costs two streaming restarts (~seconds),
    so the suite pins a fixed spread of shapes: single-user bursts,
    interleaved users, gap-boundary (exactly 1800s = same session,
    1800.001s = split), empty first drop."""
    import random

    for case, seed in enumerate([11, 23, 37]):
        rng = random.Random(seed)
        rows, eid = [], 0
        for user in range(1, rng.randint(2, 4)):
            t = rng.uniform(0, 600)
            for _ in range(rng.randint(3, 12)):
                eid += 1
                rows.append(
                    (eid, T0 + datetime.timedelta(seconds=t), user,
                     round(rng.uniform(0.5, 20.0), 2))
                )
                # mix sub-gap steps, the exact 1800s boundary, and splits
                t += rng.choice([60.0, 300.0, 1800.0, 1800.001, 2500.0])
        rows.sort(key=lambda r: (r[1], r[0]))
        cutoff = rows[len(rows) // 2][1]
        d1 = [r for r in rows if r[1] <= cutoff]
        d2 = [r for r in rows if r[1] > cutoff]

        in_dir = tmp_path / f"pin_{case}"
        ckpt = tmp_path / f"pckpt_{case}"
        in_dir.mkdir()
        emitted: list = []
        for name, drop_rows in (("d1", d1), ("d2", d2)):
            if not drop_rows:
                continue
            spark.createDataFrame(drop_rows, EV_SCHEMA).coalesce(1).write.parquet(
                str(in_dir / name)
            )
            q = (
                sessionize_stream(
                    spark.readStream.schema(EV_SCHEMA)
                    .option("recursiveFileLookup", "true")
                    .parquet(str(in_dir))
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

        batch = sessionize_batch(spark.createDataFrame(rows, EV_SCHEMA)).collect()
        tails = {}
        for r in batch:
            if r["user_id"] not in tails or r["session_idx"] > tails[r["user_id"]]:
                tails[r["user_id"]] = r["session_idx"]
        expect = {
            (r["user_id"], r["session_start"]): (
                r["session_end"], r["n_events"], r["sum_value"]
            )
            for r in batch
            if r["session_idx"] != tails[r["user_id"]]
        }
        got = {
            (r["user_id"], r["session_start"]): (
                r["session_end"], r["n_events"], r["sum_value"]
            )
            for r in emitted
        }
        assert got == expect, f"case {case} (seed {seed})"


def test_stream_sessionize_multichunk_group(spark, tmp_path):
    """A group whose rows span multiple Arrow chunks must still be processed
    in global event-time order — the state fn concats all chunks before
    sorting (chunk order is arbitrary; per-chunk sorting would make session
    assignment nondeterministic)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        rows = []
        t = 0.0
        for eid in range(1, 21):  # 20 events, sessions split every 5 events
            rows.append((eid, T0 + datetime.timedelta(seconds=t), 1, 1.0))
            t += 2500.0 if eid % 5 == 0 else 100.0
        in_dir = tmp_path / "mc"
        in_dir.mkdir()
        emitted: list = []
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / "d1")
        )
        q = (
            sessionize_stream(
                spark.readStream.schema(EV_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(str(in_dir))
            )
            .writeStream.foreachBatch(lambda df, _b: emitted.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "mc_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted((r["session_start"], r["n_events"]) for r in emitted)
        batch = sessionize_batch(spark.createDataFrame(rows, EV_SCHEMA)).collect()
        tail = max(r["session_idx"] for r in batch)
        expect = sorted(
            (r["session_start"], r["n_events"]) for r in batch
            if r["session_idx"] != tail
        )
        assert got == expect and all(n == 5 for _, n in expect)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_stream_cross_batch_late_events_island_merge(spark, tmp_path):
    """Cross-batch disorder: a later batch carrying earlier events must
    (a) bridge a chain of pre-start events into the open session when each
    hop is within the gap — one event alone vs the stale pre-batch start
    would look droppable (the round-3 review scenario) — and (b) emit a
    beyond-gap earlier island as its OWN closed session, exactly like the
    batch twin."""
    in_dir = tmp_path / "late_in"
    ckpt = tmp_path / "late_ckpt"
    in_dir.mkdir()
    emitted: list = []

    def drop(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / name)
        )
        q = (
            sessionize_stream(
                spark.readStream.schema(EV_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(str(in_dir))
            )
            .writeStream.foreachBatch(lambda df, _b: emitted.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: open session [10000, 11000] for user 7
    drop([_ev(1, 7, 10000, 1.0), _ev(2, 7, 11000, 1.0)], "b1")
    # batch 2: 8100→8300 chain bridges into the open session
    # (8300 → 10000 = 1700s < 1800s gap; 8100 alone is 1900s before 10000);
    # 100→200 is a beyond-gap earlier island → its own closed session;
    # 20000 closes the (now-extended) open session [8100, 11000]
    drop(
        [_ev(3, 7, 8100, 2.0), _ev(4, 7, 8300, 2.0),
         _ev(5, 7, 100, 5.0), _ev(6, 7, 200, 5.0),
         _ev(7, 7, 20000, 9.0)],
        "b2",
    )
    base = T0.timestamp()
    got = {
        (r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in emitted
    }
    assert got == {
        (base + 100, base + 200): (2, 10.0),
        (base + 8100, base + 11000): (4, 6.0),
    }
    # parity check: the batch twin over ALL events yields the same sessions
    all_rows = [_ev(1, 7, 10000, 1.0), _ev(2, 7, 11000, 1.0),
                _ev(3, 7, 8100, 2.0), _ev(4, 7, 8300, 2.0),
                _ev(5, 7, 100, 5.0), _ev(6, 7, 200, 5.0),
                _ev(7, 7, 20000, 9.0)]
    batch = sessionize_batch(spark.createDataFrame(all_rows, EV_SCHEMA)).collect()
    closed_by_batch = {
        (r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in batch
        if r["session_end"] != base + 20000  # drop the open tail
    }
    assert got == closed_by_batch


def _run_stream_drops(spark, in_dir, ckpt, drops, emitted, **kw):
    for name, batch_rows in drops:
        spark.createDataFrame(batch_rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / name)
        )
        q = (
            sessionize_stream(
                spark.readStream.schema(EV_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(str(in_dir)),
                **kw,
            )
            .writeStream.foreachBatch(lambda df, _b: emitted.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_stream_drop_late_beyond_gap_contract(spark, tmp_path):
    """drop_late_beyond_gap: (a) an in-contract split feed is EXACTLY equal
    to the batch twin with zero drops; (b) an out-of-contract straggler
    (older than the emitted horizon) is dropped and counted instead of
    fabricating a spurious session."""
    gap = 1800.0

    # (a) in-contract: the same EVENTS feed split mid-stream
    in_dir, ckpt = tmp_path / "ok_in", tmp_path / "ok_ck"
    in_dir.mkdir()
    emitted: list = []
    acc = spark.sparkContext.accumulator(0)
    _run_stream_drops(
        spark, in_dir, ckpt,
        [("d1", EVENTS[:4]), ("d2", EVENTS[4:]),
         ("d3", [_ev(99, 1, 99_000), _ev(98, 2, 99_000)])],  # closers
        emitted, drop_late_beyond_gap=True, dropped_acc=acc,
    )
    batch = sessionize_batch(
        spark.createDataFrame(EVENTS, EV_SCHEMA), gap_seconds=gap
    ).collect()
    key = lambda r: (r["user_id"], round(r["session_start"], 3),  # noqa: E731
                     round(r["session_end"], 3), r["n_events"])
    assert sorted(key(r) for r in emitted) == sorted(key(r) for r in batch)
    assert acc.value == 0

    # (b) out-of-contract: after user 1's first session [0, 100] was emitted
    # (closed by event 3 at 2100), a straggler at t=50 arrives — older than
    # the emitted horizon.  It must be dropped+counted, and emitted sessions
    # must stay exactly the in-contract set.
    in_dir, ckpt = tmp_path / "ooc_in", tmp_path / "ooc_ck"
    in_dir.mkdir()
    emitted2: list = []
    acc2 = spark.sparkContext.accumulator(0)
    _run_stream_drops(
        spark, in_dir, ckpt,
        [("d1", EVENTS[:4]),                      # emits user1 [0, 100]
         ("d2", [_ev(50, 1, 50)]),                # straggler below horizon
         ("d3", [_ev(97, 1, 99_000)])],           # closes the open session
        emitted2, drop_late_beyond_gap=True, dropped_acc=acc2,
    )
    assert acc2.value == 1
    got = sorted(key(r) for r in emitted2)
    base = T0.timestamp()
    assert got == [(1, round(base, 3), round(base + 100, 3), 2),
                   (1, round(base + 2100, 3), round(base + 2200, 3), 2)]


def test_stream_bounded_disorder_property(spark, tmp_path):
    """Property (seeded cases): for random feeds where a random subset of
    each drop-boundary's TAIL ISLAND slips into the next drop (bounded
    disorder — every displaced event is within the gap of the still-open
    session), the stream's closed sessions equal the batch twin's."""
    import random

    for case, seed in enumerate([7, 19, 53]):
        rng = random.Random(seed)
        rows, eid = [], 0
        for user in range(1, rng.randint(2, 4)):
            t = rng.uniform(0, 400)
            for _ in range(rng.randint(4, 10)):
                eid += 1
                rows.append(
                    (eid, T0 + datetime.timedelta(seconds=t), user,
                     round(rng.uniform(0.5, 9.0), 2))
                )
                t += rng.choice([60.0, 300.0, 900.0, 2000.0, 4000.0])
        rows.sort(key=lambda r: r[1])
        split = rng.randint(1, len(rows) - 1)
        d1, d2 = rows[:split], rows[split:]
        # bounded disorder: slip events from d1's per-user tail islands into
        # d2 (each is within the gap of that user's open session, so the
        # island merge must fold them back correctly)
        gap = 1800.0
        last_by_user = {}
        for r in d1:
            last_by_user[r[2]] = r  # d1 sorted → last wins
        slipped = [
            r for r in d1
            if r is last_by_user.get(r[2]) and rng.random() < 0.5
        ]
        d1 = [r for r in d1 if r not in slipped]
        d2 = slipped + d2  # arrives out of order inside the drop
        if not d1:
            d1, d2 = d2[:1], d2[1:]

        in_dir = tmp_path / f"din{case}"
        ckpt = tmp_path / f"dckpt{case}"
        in_dir.mkdir()
        emitted: list = []

        def drop(batch_rows, name):
            spark.createDataFrame(batch_rows, EV_SCHEMA).coalesce(1).write.parquet(
                str(in_dir / name)
            )
            q = (
                sessionize_stream(
                    spark.readStream.schema(EV_SCHEMA)
                    .option("recursiveFileLookup", "true")
                    .parquet(str(in_dir))
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

        drop(d1, "d1")
        if d2:
            drop(d2, "d2")

        got = {
            (r["user_id"], round(r["session_start"], 3)): (
                round(r["session_end"], 3), r["n_events"]
            )
            for r in emitted
        }
        batch = sessionize_batch(
            spark.createDataFrame(rows, EV_SCHEMA), gap_seconds=gap
        ).collect()
        tail = {}
        for r in batch:
            cur = tail.get(r["user_id"])
            if cur is None or r["session_idx"] > cur["session_idx"]:
                tail[r["user_id"]] = r
        expect = {
            (r["user_id"], round(r["session_start"], 3)): (
                round(r["session_end"], 3), r["n_events"]
            )
            for r in batch
            if tail[r["user_id"]]["session_idx"] != r["session_idx"]
        }
        assert got == expect, f"seed={seed}"
