"""The CDC engine — Structured Streaming / batch-replay driver (SURVEY.md §3.4).

Per micro-batch (``foreachBatch`` or replay loop):

    committed-offset skip → normalize payload (P8) → schema-drift
    detect/resolve (Magneto matcher between batch column profile and table
    column profile) → max-LSN dedup (salted two-phase) → bucket-pruned MERGE →
    snapshot commit stamped with offsets + per-partition lineage + metrics.

Exactly-once: Spark's checkpoint gives at-least-once delivery of batches; the
engine stamps the consumed LSN range of every batch into the snapshot summary
(``offsets.start`` / ``offsets.end``) and skips any batch whose range is
already ≤ the committed watermark on restart — and the MERGE itself is
idempotent by LSN comparison, so even a partially-overlapping redelivery is a
no-op for already-applied keys.  Together: effectively-once.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magneto_matcher_spark.plans.apply import dedup_max_lsn, normalize_payload
from magneto_matcher_spark.sources.lake import LakeTable

#: engine-internal columns that are never payload
_SYSTEM_COLS = {"op"}


class BatchMetrics(dict):
    """Per-micro-batch metrics record (A11): events in, winners, rows written,
    duration, throughput, lag."""


class CdcEngine:
    def __init__(
        self,
        table: LakeTable,
        dedup_strategy: str = "agg",
        n_salts: int = 32,
        drift_resolver=None,
        metrics_sink: str | None = None,
    ):
        """``drift_resolver``: callable (batch_df, table) →
        (renames: dict incoming→table name, adds: list[(name, type_str)]).
        Defaults to exact cleaned-name matching; Phase 4 wires the full
        Magneto cascade here (SURVEY.md §3.4).
        """
        self.table = table
        self.dedup_strategy = dedup_strategy
        self.n_salts = n_salts
        self.drift_resolver = drift_resolver or exact_name_drift_resolver
        self.metrics_sink = metrics_sink
        self.metrics_log: list[BatchMetrics] = []

    # ------------- drift handling -------------

    def _resolve_drift(self, batch: DataFrame) -> DataFrame:
        """Map incoming columns onto the live schema; evolve for net-new ones.

        Policy: an incoming column that matches an existing table column
        (exact name, else resolver mapping) is renamed to the table name;
        unmatched incoming columns become schema adds (new field IDs);
        table columns absent from the batch are filled with NULL.
        """
        incoming = [c for c in batch.columns if c not in _SYSTEM_COLS]
        current = self.table.column_names
        if set(incoming) == set(current):
            return batch

        renames, adds = self.drift_resolver(batch, self.table)
        for old, new in renames.items():
            batch = batch.withColumnRenamed(old, new)
        if adds:
            self.table.evolve(
                adds=adds,
                summary={"drift-renames": json.dumps(renames)},
            )
        current = self.table.column_names
        for name in current:
            if name not in batch.columns:
                field_type = next(
                    f["type"]
                    for f in self.table.current_schema_meta["fields"]
                    if f["name"] == name
                )
                batch = batch.withColumn(name, F.lit(None).cast(field_type))
        return batch.select(*current, *sorted(_SYSTEM_COLS & set(batch.columns)))

    # ------------- batch apply -------------

    def apply_batch(
        self,
        batch: DataFrame,
        source_desc: str | None = None,
    ) -> BatchMetrics:
        t0 = time.time()
        lsn_col = self.table.lsn_col

        # one scan: batch stats + touched buckets.  Dedup preserves the key
        # set, so the bucket set of the raw batch IS the bucket set of the
        # winners — computing it here lets merge() skip its own distinct over
        # the winners lineage (which would run the dedup shuffle twice).
        from magneto_matcher_spark.sources.lake import bucket_expr

        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.min(lsn_col).alias("lo"),
            F.max(lsn_col).alias("hi"),
        ]
        bucket_col = self.table.bucket_source
        if bucket_col in batch.columns:
            aggs.append(
                F.collect_set(
                    bucket_expr(bucket_col, self.table.n_buckets)
                ).alias("buckets")
            )
        stats = batch.agg(*aggs).collect()[0]
        n_events, lo, hi = stats["n"], stats["lo"], stats["hi"]
        touched = sorted(stats["buckets"]) if "buckets" in stats.asDict() else None

        metrics = BatchMetrics(
            events_in=n_events,
            offsets_start=lo,
            offsets_end=hi,
            source=source_desc or "",
        )
        if n_events == 0:
            metrics.update(skipped=True, reason="empty", duration_s=time.time() - t0)
            self._emit(metrics)
            return metrics

        committed = self.table.committed_offset_end()
        if hi <= committed:
            metrics.update(
                skipped=True, reason=f"offsets<=committed({committed})",
                duration_s=time.time() - t0,
            )
            self._emit(metrics)
            return metrics

        t_stats = time.time() - t0
        batch = normalize_payload(batch)
        batch = self._resolve_drift(batch)
        winners = dedup_max_lsn(
            batch,
            key=self.table.key,
            lsn_col=lsn_col,
            strategy=self.dedup_strategy,
            n_salts=self.n_salts,
        )

        # per-partition lineage: source → lsn span per input partition
        t1 = time.time()
        lineage = {"source": source_desc or "", "start": int(lo), "end": int(hi)}
        snapshot_id = self.table.merge(
            winners,
            summary={
                "offsets.start": int(lo),
                "offsets.end": int(hi),
                "source.lineage": json.dumps(lineage),
            },
            touched=touched,
        )
        t_merge = time.time() - t1
        dur = time.time() - t0
        summ = self.table.summary()
        metrics.update(
            skipped=False,
            snapshot_id=snapshot_id,
            rows_written=int(summ.get("rows-written", -1)),
            buckets_rewritten=int(summ.get("buckets-rewritten", -1)),
            duration_s=dur,
            stats_s=round(t_stats, 3),
            merge_s=round(t_merge, 3),
            events_per_sec=n_events / dur if dur > 0 else float("inf"),
            lsn_lag=int(hi - lo),
        )
        self._emit(metrics)
        return metrics

    def _emit(self, metrics: BatchMetrics) -> None:
        self.metrics_log.append(metrics)
        if self.metrics_sink:
            with open(self.metrics_sink, "a") as fh:
                fh.write(json.dumps(metrics) + "\n")

    # ------------- drivers -------------

    def replay(self, batch_paths: list[str]) -> list[BatchMetrics]:
        """Batch replay driver: apply parquet batch dirs in order (bench mode +
        deterministic tests). Resumable: already-committed batches skip."""
        out = []
        for path in batch_paths:
            df = self.table.spark.read.parquet(path)
            out.append(self.apply_batch(df, source_desc=path))
        return out

    def run_streaming(
        self,
        input_dir: str,
        checkpoint_dir: str,
        schema=None,
        trigger_once: bool = True,
    ):
        """Structured Streaming file source → foreachBatch apply.

        ``availableNow`` drains everything already in ``input_dir`` then
        stops (the test/bench mode); drop ``trigger_once`` for continuous
        tailing.  Exactly-once across restarts comes from the snapshot-summary
        watermark even if the checkpoint redelivers a batch.
        """
        spark = self.table.spark
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        stream = reader.option("recursiveFileLookup", "true").parquet(input_dir)

        def _apply(df: DataFrame, batch_id: int) -> None:
            self.apply_batch(df, source_desc=f"stream-batch-{batch_id}")

        writer = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        if trigger_once:
            query.awaitTermination()
        return query


def exact_name_drift_resolver(batch: DataFrame, table: LakeTable):
    """Phase-3 stub resolver: map incoming columns to table columns by exact
    cleaned name (J1); everything else is an add.  Phase 4 replaces this with
    the full Magneto cascade (magneto_matcher_spark.plans.matcher)."""
    from magneto_matcher_spark.functions.cleaning import clean_column_name_expr

    spark = batch.sparkSession
    incoming = [c for c in batch.columns if c not in _SYSTEM_COLS]
    current = set(table.column_names)

    def cleaned(names: list[str]) -> dict[str, str]:
        df = spark.createDataFrame([(n,) for n in names], ["name"])
        rows = df.select(
            "name", clean_column_name_expr(F.col("name")).alias("clean")
        ).collect()
        return {r["name"]: r["clean"] for r in rows}

    unknown = [c for c in incoming if c not in current]
    missing = [c for c in current if c not in set(incoming)]
    if not unknown:
        return {}, []
    in_clean = cleaned(unknown)
    tbl_clean = {v: k for k, v in cleaned(missing).items()}

    renames, adds = {}, []
    for c in unknown:
        tgt = tbl_clean.get(in_clean[c])
        if tgt is not None:
            renames[c] = tgt
        else:
            field_type = dict(zip(batch.columns, [f.dataType.simpleString() for f in batch.schema.fields]))[c]
            adds.append((c, field_type))
    return renames, adds
