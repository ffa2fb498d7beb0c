"""The CDC batch-apply plan — the heart of the engine (SURVEY.md §3.4).

Per micro-batch: normalize payload (P8-style expressions, no per-row Python) →
max-LSN dedup per (conv_id, turn_idx) → MERGE into the current table state.

Dedup strategies (all semantically identical; tests assert equality):

- ``window``  — the literal north-star shape: ``row_number() over (partition by
  conv_id, turn_idx order by lsn desc) = 1``.  One full shuffle of every row of
  the batch; a hot conversation key lands on one task.
- ``agg``     — ``groupBy(key).agg(max_by(payload, lsn))``.  Same answer, but
  Catalyst plans it as partial + final aggregation: with a free layout the
  partial half combines hot keys map-side BELOW the exchange; with the
  keyhash pin (``n_partitions``) the explicit repartition IS the exchange
  and both halves sit above it — one exchange of raw rows, combine after
  the wire (the measured one-exchange tradeoff; see lake.merged_frame's
  plan-shape note).  This is the scale-default.
- ``salted``  — the explicit two-phase version of ``agg`` for when the payload
  is too wide for map-side combine to help (wide rows blow the hash-agg memory
  budget and spill): add ``salt = pmod(xxhash64(lsn), n_salts)``, take the
  per-(key, salt) winner, then the global per-key winner.  Winner is global,
  not per-salt — max is associative, so two-phase max_by is exact.

At 100 TB: the batch is the small side; dedup is the only full shuffle of the
batch and it shrinks the batch to ≤ |keys| rows *before* the MERGE join, so the
expensive join never sees duplicate keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from magneto_matcher_spark.functions.cleaning import null_normalize_expr
from magneto_matcher_spark.schemas import TRANSCRIPT_KEY


def normalize_payload(batch: DataFrame) -> DataFrame:
    """Payload normalization, expression-only (north rule: "Arrow-vectorized
    pandas UDFs for payload normalization — no per-row Python"; pure Catalyst
    expressions are the even-faster path and used wherever the semantics fit,
    per SURVEY.md §2.2 P8).

    - domain-null strings in ``tool`` / ``role`` → NULL (P5)
    - ``text`` trailing/leading whitespace trimmed
    - key columns cast to canonical types
    """
    cols = {f.name for f in batch.schema.fields}
    out = batch
    if "tool" in cols:
        out = out.withColumn("tool", null_normalize_expr(F.col("tool")))
    if "role" in cols:
        out = out.withColumn("role", F.lower(F.trim(F.col("role"))))
    if "text" in cols:
        out = out.withColumn("text", F.trim(F.col("text")))
    if "turn_idx" in cols:
        out = out.withColumn("turn_idx", F.col("turn_idx").cast("int"))
    if "lsn" in cols:
        out = out.withColumn("lsn", F.col("lsn").cast("long"))
    return out


def dedup_max_lsn(
    batch: DataFrame,
    key: list[str] | None = None,
    lsn_col: str = "lsn",
    strategy: str = "agg",
    n_salts: int = 32,
    n_partitions: int | None = None,
) -> DataFrame:
    """W4 (SURVEY.md §2.5): keep only the max-LSN event per key.

    Returns a DataFrame with the same schema as ``batch``, ≤ one row per key.

    ``n_partitions`` pins the FINAL exchange to ``repartition(n, *key)``
    (which satisfies the agg/window distribution, so no extra exchange
    appears).  With a keyhash-bucketed table and ``n = n_buckets``, the
    dedup shuffle IS the bucket layout — partition p holds exactly bucket
    p's rows (see sources/lake.py bucket_expr_keyhash) and the delta/merge
    write skips its own repartition.
    """
    key = key or TRANSCRIPT_KEY

    def pin(df: DataFrame) -> DataFrame:
        if n_partitions is None:
            return df
        return df.repartition(n_partitions, *[F.col(c) for c in key])

    if strategy == "window":
        w = Window.partitionBy(*key).orderBy(F.col(lsn_col).desc())
        return (
            pin(batch).withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload_cols = list(batch.columns)

    # Per-column max_by, NOT max_by(struct(payload), lsn): a struct-typed
    # aggregation buffer is immutable, which forces the whole aggregate into
    # SortAggregate (two full sorts of every batch row — measured 0.37 s vs
    # 0.26 s on a 1M-row feed); per-column buffers are scalars, so columns
    # the caller never reads (e.g. a string op) are PRUNED by Catalyst and
    # the all-primitive remainder runs as a partial+final HashAggregate.
    # Exact under the engine's WAL contract (LSN unique per key, stamp_root
    # total order): every max_by shares the one ordering column, so all
    # columns come from the same winning row; equal-LSN rows are exact
    # redeliveries (identical payloads), for which column mixing is a no-op
    # — the struct form was equally order-nondeterministic there.
    def winners(src: DataFrame, group: list[str], order_col: str) -> DataFrame:
        aggs = [
            F.max(order_col).alias(c)
            if c == order_col
            else F.max_by(F.col(c), F.col(order_col)).alias(c)
            for c in payload_cols
            if c not in group
        ]
        return src.groupBy(*group).agg(*aggs).select(*payload_cols)

    if strategy == "agg":
        return winners(pin(batch), key, lsn_col)

    if strategy == "salted":
        # phase 1: per-(key, salt) winner — salt spreads a hot key's rows over
        # n_salts reducers; phase 2: global winner per key. Exact because max
        # is associative (SURVEY.md §4 custom-work item 2).
        salted = batch.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts))
        )
        phase1 = winners(
            salted.repartition(*[F.col(c) for c in key + ["_salt"]]),
            key + ["_salt"],
            lsn_col,
        )
        return winners(pin(phase1), key, lsn_col)

    raise ValueError(f"unknown dedup strategy: {strategy}")


def merge_into_frame(
    target: DataFrame,
    winners: DataFrame,
    key: list[str] | None = None,
    lsn_col: str = "lsn",
    op_col: str = "op",
    keep_tombstones: bool = False,
) -> DataFrame:
    """J6: MERGE semantics over plain DataFrames (no storage layer).

        MERGE INTO target t USING winners s ON <key>
        WHEN MATCHED AND s.op = 'D' AND s.lsn > t.lsn THEN DELETE
        WHEN MATCHED AND s.lsn > t.lsn THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

    ``target`` carries the transcripts columns + ``lsn`` (the LSN that wrote
    each row) so replay is idempotent: a batch whose winner LSN ≤ the stored
    LSN is a no-op.  ``winners`` must already be deduped (≤ 1 row per key).

    ``keep_tombstones=False`` (the contract path) drops deleted keys from the
    state — correct when batches arrive in per-key LSN order (the change-feed
    writes LSN-contiguous batches).  ``keep_tombstones=True`` retains delete
    winners as rows with ``op='D'`` (filter them with
    :func:`final_state_view`), which makes the merge invariant under ANY
    partition of the event set into batches: an older 'U' arriving after the
    delete loses the LSN comparison against the tombstone instead of
    resurrecting the key.  This is the frame-level analog of the lake layer's
    MoR delete deltas (sources/lake.py).

    Implemented as one full-outer join on the key.  The physical scale story
    lives in the lake layer (bucket-pruned copy-on-write, sources/lake.py);
    this frame-level version is the semantics kernel and the Phase-1 slice.
    """
    key = key or TRANSCRIPT_KEY
    data_cols = [c for c in target.columns if c not in key]

    t = target.alias("t")
    s = winners.alias("s")
    joined = t.join(s, on=key, how="full_outer")

    s_lsn, t_lsn = F.col(f"s.{lsn_col}"), F.col(f"t.{lsn_col}")
    s_op = F.col(f"s.{op_col}")
    s_present = s_lsn.isNotNull()
    t_present = t_lsn.isNotNull()
    s_wins = s_present & (~t_present | (s_lsn > t_lsn))

    picked = [
        F.when(s_wins, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in data_cols
    ]

    if keep_tombstones:
        t_op = F.col(f"t.{op_col}") if op_col in target.columns else F.lit("U")
        out_cols = [*key, *picked]
        if op_col not in data_cols:
            out_cols.append(F.when(s_wins, s_op).otherwise(t_op).alias(op_col))
        return joined.select(*out_cols)

    # row survives unless the winning side is a delete
    keep = F.when(s_wins, s_op != F.lit("D")).otherwise(t_present)
    return joined.filter(keep).select(*key, *picked)


def apply_batch_to_frame(
    target: DataFrame,
    batch: DataFrame,
    key: list[str] | None = None,
    dedup_strategy: str = "agg",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Phase-1 end-to-end slice: normalize → dedup → merge; returns new state."""
    key = key or TRANSCRIPT_KEY
    winners = dedup_max_lsn(normalize_payload(batch), key=key, strategy=dedup_strategy)
    return merge_into_frame(
        target, winners, key=key, keep_tombstones=keep_tombstones
    )


def final_state_view(state: DataFrame) -> DataFrame:
    """W7: stable output ordering for equality checks — user-facing transcript
    columns ordered by (conv_id, turn_idx); tombstone rows (op='D') hidden."""
    if "op" in state.columns:
        state = state.filter(F.col("op") != F.lit("D"))
    cols = [c for c in state.columns if c not in ("op",)]
    return state.select(*cols).orderBy("conv_id", "turn_idx")
