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
# NOTE: changing _STATE_SCHEMA invalidates existing streaming checkpoints —
# Spark's state-store schema check rejects a restart whose group-state shape
# differs from what the checkpoint recorded.  Any change here requires a
# fresh checkpoint directory (re-drain the source); there is no in-place
# state migration.
_STATE_SCHEMA = "start double, last double, n long, sv double"


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
    events: DataFrame,
    gap_seconds: float = 1800.0,
    drop_late_beyond_gap: bool = False,
    dropped_acc=None,
) -> DataFrame:
    """Streaming sessionizer over a keyed stream of (user_id, event_id, ts,
    value): emits each CLOSED session (closure = a later event of the same
    user arrives > gap after the session's last event).  The still-open
    tail session per user lives in the group state and is emitted only when
    a future batch closes it — exactly-once under replay because closure
    depends on event time alone.

    ``drop_late_beyond_gap=True`` makes the bounded-disorder contract a hard
    invariant instead of an assumption: the state tracks the user's emitted
    horizon (max emitted ``session_end``), and any event with ``ts <=
    horizon`` is DROPPED and counted into ``dropped_acc`` (a SparkContext
    accumulator, optional).  In-contract feeds (every displaced event within
    the gap of the still-open session) never hit the cutoff — an emitted
    session's closure was proven by an island > gap after it, so in-contract
    arrivals are strictly newer than the horizon — making stream == batch
    twin EXACT by construction; out-of-contract stragglers can no longer
    fabricate spurious divergent sessions (they are dropped, deterministic
    and observable, instead of emitted).  Uses a wider state schema (extra
    ``hz`` field): do not flip the flag on an existing checkpoint."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        hz = None
        if state.exists:
            if drop_late_beyond_gap:
                start, last, n, sv, hz = state.get
            else:
                start, last, n, sv = state.get
        else:
            start, last, n, sv = None, None, 0, 0.0
        closed: list[tuple] = []
        # a group's rows arrive as MULTIPLE arbitrarily-ordered Arrow chunks
        # (maxRecordsPerBatch slices); sorting per chunk would make session
        # assignment chunk-order-dependent — concat first, sort ONCE.  Memory
        # is bounded by one user's events within one micro-batch.
        #
        # Island merge: group the batch's sorted events into gap-islands,
        # splice the open session in as one more island, then re-merge
        # adjacent islands within the gap.  Every island except the final
        # one is a CLOSED session (the island after it proves the gap), so
        # a cross-batch late cluster beyond the gap before the open session
        # is emitted as its own session — exactly what the batch twin
        # reports — instead of being folded in or dropped.  An event a
        # later in-batch event bridges into the open session merges
        # correctly because merging happens island-wise, not one event
        # against the stale pre-batch start.  Residual stream/batch
        # divergence is only events arriving > gap late relative to an
        # ALREADY-EMITTED session (they become a separate session; the
        # emitted one cannot be recalled) — bounded disorder assumption.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            if drop_late_beyond_gap and hz is not None:
                ts_sec = pdf["ts"].map(lambda x: x.timestamp())
                late = ts_sec <= hz
                if late.any():
                    if dropped_acc is not None:
                        dropped_acc.add(int(late.sum()))
                    pdf = pdf[~late]
            islands: list[list] = []  # [start, last, n, sv]
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = ts.timestamp()
                if islands and (t - islands[-1][1]) <= gap_seconds:
                    cur = islands[-1]
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(val)
                else:
                    islands.append([t, t, 1, float(val)])
            if start is not None:
                islands.append([start, last, n, sv])
                islands.sort(key=lambda i: i[0])
            merged: list[list] = []
            for isl in islands:
                if merged and (isl[0] - merged[-1][1]) <= gap_seconds:
                    cur = merged[-1]
                    cur[0] = min(cur[0], isl[0])
                    cur[1] = max(cur[1], isl[1])
                    cur[2] += isl[2]
                    cur[3] += isl[3]
                else:
                    merged.append(list(isl))
            for isl in merged[:-1]:
                closed.append((user_id, isl[0], isl[1], isl[2], round(isl[3], 4)))
                if drop_late_beyond_gap:
                    hz = isl[1] if hz is None else max(hz, isl[1])
            if merged:  # drop-filter can empty the batch with no open session
                start, last, n, sv = merged[-1]
        if drop_late_beyond_gap:
            state.update((start, last, n, sv, hz))
        else:
            state.update((start, last, n, sv))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "sum_value",
                ],
            )

    state_schema = (
        _STATE_SCHEMA + ", hz double" if drop_late_beyond_gap else _STATE_SCHEMA
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
