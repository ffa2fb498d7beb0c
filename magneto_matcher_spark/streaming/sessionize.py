"""Sessionization — the custom stateful streaming operator (SURVEY.md §2.13,
"applyInPandasWithState for custom stateful operators").

Two twins of the same semantics:

- :func:`sessionize_batch` — pure-Catalyst gaps-and-islands: ``lag(ts)`` per
  user, flag gaps > ``gap_seconds``, running sum of flags = session index,
  aggregate per (user, session).  SQL-expressible, so it carries a DuckDB
  oracle in the query registry (``w_sessionize_gaps``).  At 100 TB this is
  one window shuffle + one partial-aggregated shuffle on (user, session) —
  no Python in the path.
- :func:`sessionize_stream` — the Structured Streaming version:
  ``groupBy(user).applyInPandasWithState`` keeps one open session per user
  across micro-batches and EMITS a session the moment a later event exceeds
  the inactivity gap (deterministic closure by event time, no wall-clock
  timeout — replay-stable, which is what the tests pin).  State is O(users),
  each a 4-field tuple; the classic keyed-state scale shape.

The event-time arithmetic uses fractional epoch seconds on BOTH engines
(``ts.cast(double)`` / DuckDB ``epoch(ts)``) — ``unix_timestamp`` truncates
to whole seconds and would diverge on sub-second gaps.

Reference parity note: the reference has no streaming analog (its pipeline is
batch pandas, magneto-matcher); this operator is part of the
training-data-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_OUT_SCHEMA = (
    "user_id long, session_start double, session_end double, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start double, last double, n long, sv double, late long"


def sessionize_batch(
    events: DataFrame, gap_seconds: float = 1800.0
) -> DataFrame:
    """Gaps-and-islands sessionization: one row per (user, session) with
    start/end (fractional epoch seconds), event count and value sum.
    Deterministic tie-break: events ordered by (ts, event_id) within user."""
    # parquet event times arrive as timestamp_ntz, which has no direct
    # double cast — hop through timestamp (session tz is UTC, so naive ==
    # UTC, matching DuckDB's epoch() on naive timestamps)
    t = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(t).over(w)
    is_new = (prev.isNull() | ((t - prev) > F.lit(gap_seconds))).cast("long")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("_new", is_new)
        .withColumn("session_idx", F.sum("_new").over(run))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min(t).alias("session_start"),
            F.max(t).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 1800.0
) -> DataFrame:
    """Streaming sessionizer over a keyed stream of (user_id, event_id, ts,
    value): emits each CLOSED session (closure = a later event of the same
    user arrives > gap after the session's last event).  The still-open
    tail session per user lives in the group state and is emitted only when
    a future batch closes it — exactly-once under replay because closure
    depends on event time alone."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, last, n, sv, late = state.get
        else:
            start, last, n, sv, late = None, None, 0, 0.0, 0
        closed: list[tuple] = []
        # a group's rows arrive as MULTIPLE arbitrarily-ordered Arrow chunks
        # (maxRecordsPerBatch slices); sorting per chunk would make session
        # assignment chunk-order-dependent — concat first, sort ONCE.  Memory
        # is bounded by one user's events within one micro-batch.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = ts.timestamp()
                if start is not None and t < start - gap_seconds:
                    # a cross-batch late event beyond the gap BEFORE the open
                    # session's start: under batch semantics it would be its
                    # own earlier session, which the stream can no longer
                    # emit.  Folding it in (min-pulling start backward) would
                    # silently merge two batch sessions — drop it instead and
                    # count it, so stream/batch divergence is bounded by
                    # construction (the open session's stats stay correct).
                    late += 1
                    continue
                if last is not None and (t - last) > gap_seconds:
                    closed.append((user_id, start, last, n, round(sv, 4)))
                    start, n, sv = None, 0, 0.0
                # bounded cross-batch disorder (within the gap) folds into
                # the open session via min/max — replay-stable
                start = t if start is None else min(start, t)
                last = t if last is None else max(last, t)
                n += 1
                sv += float(val)
        state.update((start, last, n, sv, late))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "sum_value",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
