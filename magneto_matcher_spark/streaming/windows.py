"""Watermarked event-time windows (SURVEY.md §2.13 "watermark/late data").

The CDC state path doesn't need event-time windows (LSN monotonicity makes
late events MERGE no-ops), but the metrics side does: per-window event
counts/sums that tolerate out-of-order arrival up to a bounded lateness and
then finalize.  This is plain Structured Streaming — ``withWatermark`` +
``groupBy(window(...))`` in append mode: a window emits exactly once, when
the watermark (max seen event time − delay) passes its end; rows later than
the watermark are dropped before the aggregation.

Batch twin: the ``w_tumbling_window_counts`` registry query (same
window/agg expressions over a static frame, DuckDB ``time_bucket`` oracle).

At scale this is a partial-aggregated shuffle on the window start (plus
state in the state store, O(open windows)); skewed windows are impossible by
construction since the key is time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Append-mode tumbling-window counts/sums over an event stream.

    Emits one finalized row per window once the watermark passes the window
    end; events arriving later than the watermark are dropped (bounded
    lateness), events late-but-within the watermark still count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "events",
            "sum_value",
        )
    )
