"""Iceberg-semantics lake table over Parquet + JSON snapshot log.

No Iceberg runtime jar is reachable in this sandbox (no network), so this is a
thin, format-faithful re-implementation of the Iceberg *semantics* the engine
needs (SURVEY.md §7 Phase 2); the class is the seam where a real Iceberg
catalog plugs in unchanged:

- **snapshot log** — ``metadata/v{n}.json`` holds schemas (with field IDs),
  the partition spec, and the snapshot list; ``metadata/version-hint.text``
  is the current-version pointer, committed by atomic ``os.replace`` (the
  single-writer commit protocol; documented assumption, like Iceberg's
  HadoopCatalog).
- **schema evolution by field ID** — renames keep the field ID; adds mint a
  new one.  Old data files are never rewritten: the read path maps each file
  group's columns to the current schema by field ID and fills missing fields
  with typed nulls.
- **partition spec** — ``bucket(conv_id, N)`` via ``pmod(xxhash64(conv_id), N)``.
  MERGE prunes to the buckets the batch touches and rewrites only those
  (bucket-pruned copy-on-write emulating merge-on-read equality-delete
  visibility: a key matched by the batch is invisible in the old file because
  the rewritten bucket replaces it atomically at commit).
- **snapshot summary** — free-form string map, used by the CDC engine to stamp
  consumed offset ranges + per-partition lineage (exactly-once, SURVEY §2.13).
- **time travel** — ``read(snapshot_id=...)`` reads any historical snapshot's
  manifest under its own schema mapping.
- **maintenance** — ``compact()`` folds MoR deltas (tombstone-retaining);
  ``expire_snapshots(keep_last=N)`` bounds the snapshot log and deletes
  orphaned data files/manifest segments (Iceberg ``expire_snapshots``
  analog), preserving the exactly-once watermark via
  ``expired_offset_end``.

Scale notes (100 TB): the manifest is a per-snapshot file *list* grouped by
bucket, so MERGE planning is O(files) metadata work on the driver with zero
data read for untouched buckets; data movement is bounded by the touched
buckets, which for a key-bucketed table is the theoretical minimum for
copy-on-write.  Untouched-file reuse means snapshots share files (no
duplication), like Iceberg manifests.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- type (de)serialization -------------------------------------------------

_SIMPLE_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


#: Iceberg-safe type promotions (Iceberg spec "Schema Evolution"): widening
#: only, field ID preserved, metadata-only — no data rewrite.  Old files keep
#: their narrow physical type; the read path casts them up per field ID
#: (``_read_manifest``).  Keys are Spark ``simpleString`` names (long is
#: "bigint").
SAFE_PROMOTIONS = {("int", "bigint"), ("float", "double")}

# Persist the CoW batch across the touched-bucket probe + merged write
# (two actions over one lineage).  Measured interleaved A/B (2M-event
# Zipf feed, 5 batches, local[32], min-of-3): recompute 8.43 s vs persist
# 9.16 s, recompute faster in every pair — caching the wide rows costs
# more than re-running the parquet-scan + codegen-normalize lineage.  A
# caller whose batch lineage is genuinely expensive (remote source,
# Python stages) should persist before merge() or pass `touched`.  Flip
# only with a new interleaved measurement.
_COW_PROBE_PERSIST = False


def _type_to_str(dt: T.DataType) -> str:
    return dt.simpleString()


def _str_to_type(s: str) -> T.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    # array<...>, map<...>, decimal(...) etc. — Spark parses its own simpleString
    return T._parse_datatype_string(s)  # noqa: SLF001


def bucket_expr(col: str, n_buckets: int) -> F.Column:
    """Stable bucket transform: pmod(xxhash64(col), n). Deterministic across
    sessions and partitionings."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def bucket_expr_keyhash(cols: list[str], n_buckets: int) -> F.Column:
    """Shuffle-ALIGNED bucket transform: ``pmod(hash(*key), n)``.

    ``F.hash`` is the same murmur3(seed 42) Spark's ``HashPartitioning``
    uses, and partition index = pmod(hash, numPartitions) — so for a frame
    whose last exchange is ``repartition(n_buckets, *key)`` (or any multiple
    of n_buckets), every task already holds exactly the rows of one bucket
    (partition p ≡ bucket p mod n_buckets).  That lets the delta/merge
    writes reuse the dedup shuffle as the bucket layout and skip their own
    repartition — ONE exchange per micro-batch instead of two (measured
    8→32-core scaling 0.44 → 0.67 and ~1.6x absolute at 32 cores)."""
    return F.pmod(
        F.hash(*[F.col(c) for c in cols]), F.lit(n_buckets)
    ).cast("int")


class LakeTable:
    """A key-bucketed, snapshot-versioned table (single writer)."""

    def __init__(self, spark: SparkSession, root: str, meta: dict):
        self.spark = spark
        self.root = root
        self.meta = meta
        # manifest segments are immutable once written — cache by relpath
        self._seg_cache: dict[str, list[dict]] = {}

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key: list[str],
        n_buckets: int = 16,
        bucket_col: str | None = None,
        lsn_col: str = "lsn",
        write_mode: str = "cow",
        files_per_bucket: int = 1,
        bucket_transform: str = "keyhash",
    ) -> "LakeTable":
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        if bucket_transform not in ("bucket", "keyhash"):
            raise ValueError(
                f"bucket_transform must be 'bucket' or 'keyhash', "
                f"got {bucket_transform!r}"
            )
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name, "type": _type_to_str(f.dataType)}
            for i, f in enumerate(schema.fields)
        ]
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "version": 0,
            "last_field_id": len(fields),
            "schemas": [{"schema_id": 0, "fields": fields}],
            "current_schema_id": 0,
            # "keyhash" (default): bucket = pmod(murmur3(*key), n) — the
            # shuffle-aligned transform (see bucket_expr_keyhash) enabling
            # one-exchange merges.  "bucket": pmod(xxhash64(source_col), n)
            # — the classic single-column transform, co-locating e.g. a
            # whole conversation per bucket; kept for tables that prune by
            # that column alone.  An explicit bucket_col implies "bucket".
            "partition_spec": {
                "transform": "bucket" if bucket_col else bucket_transform,
                "source": bucket_col or key[0],
                "n_buckets": n_buckets,
            },
            "key": key,
            "lsn_column": lsn_col,
            "write_mode": write_mode,
            "files_per_bucket": max(1, int(files_per_bucket)),
            "snapshots": [],
            "current_snapshot_id": None,
        }
        table = cls(spark, root, meta)
        table._write_metadata()
        return table

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        hint = os.path.join(root, "metadata", "version-hint.text")
        with open(hint) as fh:
            version = int(fh.read().strip())
        with open(os.path.join(root, "metadata", f"v{version}.json")) as fh:
            meta = json.load(fh)
        return cls(spark, root, meta)

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "metadata", "version-hint.text"))

    def _write_metadata(self) -> None:
        version = self.meta["version"]
        meta_dir = os.path.join(self.root, "metadata")
        path = os.path.join(meta_dir, f"v{version}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.meta, fh, indent=1)
        os.replace(tmp, path)
        hint_tmp = os.path.join(meta_dir, "version-hint.text.tmp")
        with open(hint_tmp, "w") as fh:
            fh.write(str(version))
        os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))

    # ---------------- schema accessors ----------------

    def _schema_by_id(self, schema_id: int) -> dict:
        for s in self.meta["schemas"]:
            if s["schema_id"] == schema_id:
                return s
        raise KeyError(f"schema {schema_id} not found")

    @property
    def current_schema_meta(self) -> dict:
        return self._schema_by_id(self.meta["current_schema_id"])

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f["name"], _str_to_type(f["type"]), True)
                for f in self.current_schema_meta["fields"]
            ]
        )

    @property
    def column_names(self) -> list[str]:
        return [f["name"] for f in self.current_schema_meta["fields"]]

    @property
    def key(self) -> list[str]:
        return list(self.meta["key"])

    @property
    def lsn_col(self) -> str:
        return self.meta["lsn_column"]

    @property
    def n_buckets(self) -> int:
        return self.meta["partition_spec"]["n_buckets"]

    @property
    def bucket_source(self) -> str:
        return self.meta["partition_spec"]["source"]

    # ---------------- snapshots ----------------

    def snapshots(self) -> list[dict]:
        return self.meta["snapshots"]

    def manifest(self, snap: dict | None) -> list[dict]:
        """Materialize a snapshot's file list from its manifest segments.

        Iceberg-style indirection: each commit writes only its NEW entries as
        an immutable ``metadata/seg-*.json`` and references the parent's
        segments, so the serial per-commit metadata work is O(new files) —
        not O(total files × snapshots) as with inline manifests.  Segments
        are cached (immutable) so repeated reads cost one load each."""
        if not snap:
            return []
        if "manifest" in snap:  # legacy inline manifest
            return snap["manifest"]
        out: list[dict] = []
        for seg in snap.get("manifest_segs", []):
            if seg not in self._seg_cache:
                with open(os.path.join(self.root, seg)) as fh:
                    self._seg_cache[seg] = json.load(fh)
            out.extend(self._seg_cache[seg])
        return out

    def _segs_of(self, snap: dict | None) -> list[str]:
        """Parent segments for a segment-reusing commit.  A legacy snapshot
        (inline ``manifest`` written by the pre-segment format) is upgraded
        write-through: its file list is materialized ONCE as a segment so a
        reusing commit carries the existing files instead of silently
        dropping them (data loss)."""
        if not snap:
            return []
        if "manifest" in snap and not snap.get("manifest_segs"):
            seg_rel = os.path.join(
                "metadata", f"seg-legacy-{snap['snapshot_id']}.json"
            )
            seg_path = os.path.join(self.root, seg_rel)
            if not os.path.exists(seg_path):
                tmp = seg_path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(snap["manifest"], fh)
                os.replace(tmp, seg_path)
            self._seg_cache[seg_rel] = list(snap["manifest"])
            return [seg_rel]
        return list(snap.get("manifest_segs", []))

    def current_snapshot(self) -> dict | None:
        sid = self.meta["current_snapshot_id"]
        if sid is None:
            return None
        for s in self.meta["snapshots"]:
            if s["snapshot_id"] == sid:
                return s
        raise KeyError(f"snapshot {sid} missing")

    def summary(self, snapshot_id: int | None = None) -> dict:
        snap = (
            self.current_snapshot()
            if snapshot_id is None
            else self._snapshot_by_id(snapshot_id)
        )
        return dict(snap["summary"]) if snap else {}

    def _snapshot_by_id(self, snapshot_id: int) -> dict:
        for s in self.meta["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found")

    def committed_offset_end(self) -> int:
        """Max committed 'offsets.end' across the snapshot chain — the
        exactly-once watermark the CDC engine consults on restart.
        ``expired_offset_end`` preserves the watermark across
        :meth:`expire_snapshots` (an expired merge snapshot may carry the
        max; losing it would let a redelivered old batch re-apply)."""
        best = int(self.meta.get("expired_offset_end", -1))
        for s in self.meta["snapshots"]:
            end = s["summary"].get("offsets.end")
            if end is not None:
                best = max(best, int(end))
        return best

    # ---------------- read path ----------------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        snap = (
            self.current_snapshot()
            if snapshot_id is None
            else self._snapshot_by_id(snapshot_id)
        )
        read_schema_id = (
            self.meta["current_schema_id"] if snapshot_id is None else snap["schema_id"]
        )
        entries = self.manifest(snap)
        if not entries:
            return self.spark.createDataFrame(
                [], self._schema_for(read_schema_id)
            )
        return self._resolve(entries, read_schema_id)

    def _resolve(
        self,
        manifest: list[dict],
        read_schema_id: int,
        keep_tombstones: bool = False,
        n_partitions: int | None = None,
    ) -> DataFrame:
        """Merge-on-read resolution: base data files ∪ delta files → max-LSN
        winner per key, delete winners invisible (Iceberg v2 equality-delete
        semantics; deltas are whole-row upsert/delete records keyed by the
        table key + LSN).

        Bucket-pruned: both sides are bucketed by the same
        ``pmod(xxhash64(key))``, so a bucket with NO delta files needs no
        dedup at all — those buckets are plain-scanned and unioned with the
        resolved dirty buckets.  At 100 TB this makes a read O(touched
        buckets), not O(table).  Pure-CoW manifests (no deltas) short-circuit
        to a plain scan entirely.

        ``kind='tombstone'`` entries are compaction-retained delete winners
        (see :meth:`compact`): they only matter against OTHER deltas (a stale
        pre-watermark 'U' redelivered after compaction must lose the LSN
        comparison instead of resurrecting the key), never against data files
        — so buckets whose only non-data entries are tombstones stay on the
        plain-scan path.

        ``keep_tombstones=True`` returns every winner including deletes, with
        the ``op`` column (compaction's input)."""
        data = [e for e in manifest if e.get("kind", "data") == "data"]
        deltas = [e for e in manifest if e.get("kind", "data") == "delta"]
        tombs = [e for e in manifest if e.get("kind", "data") == "tombstone"]

        empty = self.spark.createDataFrame([], self._schema_for(read_schema_id))
        if not deltas and not (keep_tombstones and tombs):
            base = self._read_manifest(data, read_schema_id) if data else empty
            if keep_tombstones:
                base = base.withColumn("op", F.lit("U"))
            return base

        from magneto_matcher_spark.plans.apply import dedup_max_lsn

        dirty_buckets = {e["bucket"] for e in deltas}
        if keep_tombstones:
            dirty_buckets |= {e["bucket"] for e in tombs}
        clean_data = [e for e in data if e["bucket"] not in dirty_buckets]
        dirty_data = [e for e in data if e["bucket"] in dirty_buckets]
        dirty_tombs = [e for e in tombs if e["bucket"] in dirty_buckets]

        dirty_base = (
            self._read_manifest(dirty_data, read_schema_id) if dirty_data else empty
        )
        union = dirty_base.withColumn("op", F.lit("U"))
        overlay = deltas + dirty_tombs
        if overlay:
            union = union.unionByName(
                self._read_manifest(overlay, read_schema_id, extra_cols=("op",))
            )
        # n_partitions: compact() pins the resolution's exchange to
        # n_buckets on keyhash tables so its rewrites skip their own
        # repartition; plain reads leave it None (dedup parallelism should
        # track shuffle.partitions, not bucket count)
        winners = dedup_max_lsn(
            union, key=self.key, lsn_col=self.lsn_col, strategy="agg",
            n_partitions=n_partitions,
        )
        if not keep_tombstones:
            winners = winners.filter(F.col("op") != F.lit("D")).drop("op")

        clean = self._read_manifest(clean_data, read_schema_id) if clean_data else None
        if clean is None:
            return winners
        if keep_tombstones:
            clean = clean.withColumn("op", F.lit("U"))
        return clean.unionByName(winners)

    def _schema_for(self, schema_id: int) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f["name"], _str_to_type(f["type"]), True)
                for f in self._schema_by_id(schema_id)["fields"]
            ]
        )

    def _read_manifest(
        self,
        manifest: list[dict],
        read_schema_id: int,
        extra_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """``extra_cols``: system columns present in the files verbatim
        (outside the field-ID schema), e.g. delta files' ``op``."""
        target_fields = self._schema_by_id(read_schema_id)["fields"]
        by_schema: dict[int, list[str]] = {}
        for entry in manifest:
            by_schema.setdefault(entry["schema_id"], []).append(
                os.path.join(self.root, entry["path"])
            )
        parts: list[DataFrame] = []
        for schema_id, paths in by_schema.items():
            file_fields = self._schema_by_id(schema_id)["fields"]
            by_field_id = {f["id"]: f["name"] for f in file_fields}
            df = self.spark.read.parquet(*paths)
            cols = []
            for tf in target_fields:
                src_name = by_field_id.get(tf["id"])
                if src_name is not None:
                    cols.append(
                        F.col(src_name).cast(_str_to_type(tf["type"])).alias(tf["name"])
                    )
                else:
                    cols.append(
                        F.lit(None).cast(_str_to_type(tf["type"])).alias(tf["name"])
                    )
            cols += [F.col(c) for c in extra_cols]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_buckets(
        self,
        buckets: list[int],
        snapshot_id: int | None = None,
        keep_tombstones: bool = False,
    ) -> DataFrame:
        """Bucket-pruned scan: only files whose partition bucket ∈ ``buckets``.
        ``keep_tombstones=True`` resolves delete winners as rows with ``op``
        (the MERGE target view — tombstones must out-LSN stale redeliveries)."""
        snap = (
            self.current_snapshot()
            if snapshot_id is None
            else self._snapshot_by_id(snapshot_id)
        )
        read_schema_id = (
            self.meta["current_schema_id"] if snapshot_id is None else snap["schema_id"]
        )
        wanted = set(buckets)
        manifest = [e for e in self.manifest(snap) if e["bucket"] in wanted]
        if not manifest:
            empty = self.spark.createDataFrame([], self._schema_for(read_schema_id))
            return empty.withColumn("op", F.lit("U")) if keep_tombstones else empty
        return self._resolve(manifest, read_schema_id, keep_tombstones=keep_tombstones)

    # ---------------- write path ----------------

    def _write_data_files(
        self,
        df: DataFrame,
        dirname: str,
        kind: str = "data",
        split_tombstones_on: str | None = None,
        pre_partitioned: bool = False,
    ) -> list[dict]:
        """Write ``df`` (current schema + ``_bucket``) partitioned by bucket
        under ``data/{dirname}/``; return manifest entries.  ``kind='delta'``
        marks merge-on-read change files (payload + ``op``).

        ``split_tombstones_on='op'``: ONE write job routes delete winners
        (op='D') into ``kind='tombstone'`` files and everything else into
        ``kind`` files via an extra partition dir — the CoW merge uses this
        so tombstone retention costs zero extra Spark jobs.  The price is
        that data files carry the (constant-'U', dictionary-encoded) op
        column readers never select — accepted deliberately: splitting into
        two writes to drop one ~zero-entropy column would double the job
        count on the hottest path.

        Parallelism: repartitioning on ``_bucket`` alone caps the write at
        ≤ n_buckets non-empty tasks (fewer after hash collisions) no matter
        how many cores exist — so rows can be sub-split inside each bucket by
        a key hash (``files_per_bucket`` files per bucket, deterministic), the
        same trick the feed generator uses (sources/changefeed.py:155-159).
        Bucket membership is untouched; readers see k files per bucket.
        (Measured: sub-splitting only pays off when a bucket's rewrite is big
        enough to dwarf task/file overhead — keep files_per_bucket=1 unless
        buckets are large.)"""
        out_dir = os.path.join(self.root, "data", dirname)
        t0 = time.time()
        part_cols = ["_bucket"]
        if split_tombstones_on is not None:
            df = df.withColumn(
                "_tomb", (F.col(split_tombstones_on) == F.lit("D")).cast("int")
            )
            part_cols = ["_tomb", "_bucket"]
        fpb = int(self.meta.get("files_per_bucket", 1))
        if pre_partitioned and fpb == 1:
            # keyhash alignment contract (bucket_expr_keyhash): the caller's
            # last exchange already partitions by key hash with a multiple
            # of n_buckets partitions, so every task holds one bucket's rows
            # — the bucket repartition would be a pure extra shuffle.
            # partitionBy routes rows by VALUE, so even an unaligned caller
            # stays correct (just more files per bucket).
            shaped = df
        elif fpb > 1:
            sub = F.pmod(
                F.xxhash64(*[F.col(c) for c in self.key]), F.lit(fpb)
            ).cast("int")
            shaped = df.repartition(self.n_buckets * fpb, F.col("_bucket"), sub)
        else:
            shaped = df.repartition(self.n_buckets, F.col("_bucket"))
        (
            shaped
            .sortWithinPartitions(*self.key)  # W7: file-level determinism
            .write.partitionBy(*part_cols)
            .mode("overwrite")
            .parquet(out_dir)
        )
        t_write = time.time() - t0
        t0 = time.time()
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        pattern = os.path.join(out_dir, *[f"{c}=*" for c in part_cols], "*.parquet")
        paths = sorted(glob.glob(pattern))
        # footer reads are tiny I/O ops and pyarrow releases the GIL — a
        # thread pool keeps this driver-serial stretch off the commit path's
        # critical section at high parallelism
        if len(paths) > 1:
            with ThreadPoolExecutor(max_workers=min(16, len(paths))) as pool:
                n_rows = list(
                    pool.map(lambda p: pq.ParquetFile(p).metadata.num_rows, paths)
                )
        else:
            n_rows = [pq.ParquetFile(p).metadata.num_rows for p in paths]
        entries = []
        for path, rows in zip(paths, n_rows):
            bucket = int(path.split("_bucket=")[1].split(os.sep)[0])
            file_kind = kind
            if split_tombstones_on is not None and "_tomb=1" in path:
                file_kind = "tombstone"
            entries.append(
                {
                    "path": os.path.relpath(path, self.root),
                    "bucket": bucket,
                    "schema_id": self.meta["current_schema_id"],
                    "rows": rows,
                    "kind": file_kind,
                }
            )
        # perf introspection for the bench (not part of the table format)
        self.last_write_timings = {
            "write_job_s": round(t_write, 3),
            "manifest_scan_s": round(time.time() - t0, 3),
        }
        return entries

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        spec = self.meta["partition_spec"]
        if spec.get("transform") == "keyhash":
            return df.withColumn(
                "_bucket", bucket_expr_keyhash(self.key, self.n_buckets)
            )
        return df.withColumn(
            "_bucket", bucket_expr(self.bucket_source, self.n_buckets)
        )

    def aligned_partitions(self) -> int | None:
        """n_buckets when this table's bucket transform is shuffle-aligned
        ("keyhash"), else None.  Callers that pin their last exchange to
        ``repartition(aligned_partitions(), *key)`` may write with
        ``pre_partitioned=True`` and skip the bucket repartition entirely."""
        if self.meta["partition_spec"].get("transform") == "keyhash":
            return self.n_buckets
        return None

    def _next_snapshot_id(self) -> int:
        # monotonic across expire_snapshots: never re-issue an expired id
        existing = max(
            (s["snapshot_id"] for s in self.meta["snapshots"]), default=0
        )
        return max(existing, self.meta.get("last_snapshot_id", 0)) + 1

    def _commit(
        self,
        operation: str,
        summary: dict,
        schema_id: int | None = None,
        *,
        base_segs: list[str] | tuple = (),
        new_entries: list[dict] | tuple = (),
    ) -> int:
        """Single-writer commit: reuse the parent's manifest segments
        (``base_segs``) and write ``new_entries`` (if any) as one new
        immutable segment — O(new files) serial metadata work, which is what
        keeps the commit path off the scaling critical path at high
        parallelism."""
        snapshot_id = self._next_snapshot_id()
        segs = list(base_segs)
        if new_entries:
            seg_rel = os.path.join(
                "metadata", f"seg-{snapshot_id}-{uuid.uuid4().hex[:8]}.json"
            )
            seg_path = os.path.join(self.root, seg_rel)
            tmp = seg_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(list(new_entries), fh)
            os.replace(tmp, seg_path)
            self._seg_cache[seg_rel] = list(new_entries)
            segs.append(seg_rel)
        snap = {
            "snapshot_id": snapshot_id,
            "parent_id": self.meta["current_snapshot_id"],
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "schema_id": (
                schema_id if schema_id is not None else self.meta["current_schema_id"]
            ),
            "summary": {k: str(v) for k, v in summary.items()},
            "manifest_segs": segs,
        }
        self.meta["snapshots"].append(snap)
        self.meta["current_snapshot_id"] = snapshot_id
        self.meta["last_snapshot_id"] = snapshot_id
        self.meta["version"] += 1
        self._write_metadata()
        return snapshot_id

    def append(self, df: DataFrame, summary: dict | None = None) -> int:
        """Append rows (no key dedup). df must carry the current columns."""
        snapshot_id = self._next_snapshot_id()
        aligned = df.select(*self.column_names)
        new_entries = self._write_data_files(self._with_bucket(aligned), f"snap-{snapshot_id}")
        cur = self.current_snapshot()
        s = {"rows-appended": sum(e["rows"] for e in new_entries)}
        s.update(summary or {})
        return self._commit(
            "append", s, base_segs=self._segs_of(cur), new_entries=new_entries
        )

    def merge(
        self,
        winners: DataFrame,
        summary: dict | None = None,
        op_col: str = "op",
        touched: list[int] | None = None,
        pre_deduped: bool = True,
        dedup_strategy: str = "agg",
        n_salts: int = 32,
        aligned: bool = False,
    ) -> int:
        """J6: key-partition-pruned MERGE (SURVEY §2.3).

        ``winners`` = the batch with ``op`` column and the current payload
        columns; ``pre_deduped=True`` promises ≤1 row per key.
        ``pre_deduped=False`` hands the raw (normalized) batch over and FUSES
        the max-LSN dedup into the merge aggregation itself — for CoW this
        collapses three shuffle boundaries (batch dedup, two-sided merge join)
        into ONE partial-aggregated shuffle of target ∪ batch, and removes the
        persist the separate-dedup path needed.  ``dedup_strategy='salted'``
        still pre-shrinks a hot-key batch two-phase before the fused agg.
        Semantics::

            WHEN MATCHED AND s.op='D' AND s.lsn > t.lsn THEN DELETE
            WHEN MATCHED AND s.lsn > t.lsn              THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op != 'D'            THEN INSERT *

        (ties keep the target row: the fused aggregation orders by
        ``struct(lsn, is_target)``, so equal-LSN redelivery is a no-op, same
        as the join kernel's strict ``s.lsn > t.lsn``).

        Physical plan: bucket the batch, prune the manifest to touched buckets,
        merge ONLY those buckets' rows with the batch (one hash aggregation),
        rewrite those buckets, keep every untouched file by reference.

        ``touched``: optional precomputed bucket list.  Dedup has the same key
        set as its input, so callers that already scanned the raw batch (the
        CDC engine's stats pass) can hand the bucket set over — computing it
        here would execute the whole winners lineage (normalize + dedup
        shuffle) once for this collect and a second time for the write.

        ``aligned``: caller's promise that ``winners`` is already partitioned
        on the table's bucket layout — honoured only with ``pre_deduped=True``
        (the in-merge dedup path re-partitions with its own pin and tracks
        alignment separately).

        Write modes (``create(write_mode=...)``):

        - ``cow`` — copy-on-write: one fused max-LSN aggregation over
          target ∪ batch, then rewrite the touched buckets.  Read is a plain
          scan.  Right when batches are small relative to buckets or reads
          dominate.
        - ``mor`` — merge-on-read: append the winners (with ``op``) as bucketed
          DELTA files, no join, no rewrite — O(batch) per merge regardless of
          table size.  Reads resolve base ∪ deltas via max-LSN dedup;
          ``compact()`` folds deltas back into data files.  Right for
          high-frequency ingest at 100 TB, where CoW would rewrite the table
          every micro-batch.
        """
        from magneto_matcher_spark.plans.apply import dedup_max_lsn

        snapshot_id = self._next_snapshot_id()
        cols = self.column_names
        lsn_col = self.lsn_col

        is_mor = self.meta.get("write_mode", "cow") == "mor"
        n_aligned = self.aligned_partitions()
        # `aligned` (the caller's promise that `winners` is already
        # partitioned on the bucket layout) only applies when
        # pre_deduped=True; the in-merge dedup below re-partitions with its
        # own pin, tracked in a DISTINCT local so the parameter's meaning
        # never flips mid-function.
        delta_aligned = aligned
        if not pre_deduped and (is_mor or dedup_strategy == "salted"):
            # MoR delta files stay ≤1 row/key (read-amplification bound);
            # a hot-key CoW batch pre-shrinks two-phase before the fused agg.
            # Keyhash tables pin the dedup's final exchange to n_buckets
            # partitions so the delta write can reuse it (ONE exchange).
            winners = dedup_max_lsn(
                winners, key=self.key, lsn_col=lsn_col,
                strategy=dedup_strategy, n_salts=n_salts,
                n_partitions=n_aligned if is_mor else None,
            )
            delta_aligned = is_mor and n_aligned is not None

        batch = self._with_bucket(winners.select(*cols, op_col))

        if is_mor:
            new_entries = self._write_data_files(
                batch, f"delta-{snapshot_id}", kind="delta",
                pre_partitioned=delta_aligned and n_aligned is not None,
            )
            cur = self.current_snapshot()
            s = {
                "delta-rows-written": sum(e["rows"] for e in new_entries),
                "rows-written": sum(e["rows"] for e in new_entries),
                "buckets-rewritten": 0,
                "files-kept": len(self.manifest(cur)),
            }
            s.update(summary or {})
            return self._commit(
                "merge", s, base_segs=self._segs_of(cur), new_entries=new_entries
            )

        persisted = False
        if touched is None and _COW_PROBE_PERSIST:
            # the touched-bucket probe is an ACTION over the full batch
            # lineage; the merged write below re-executes that lineage.
            # Persisting to avoid the re-execution was measured SLOWER at
            # this engine's batch shapes (see _COW_PROBE_PERSIST) — kept
            # as an opt-in for expensive lineages.
            batch = batch.persist()
            persisted = True
        if touched is None:
            touched = [
                r["_bucket"] for r in batch.select("_bucket").distinct().collect()
            ]
        try:
            cur = self.current_snapshot()
            old_manifest = self.manifest(cur)
            kept = [e for e in old_manifest if e["bucket"] not in set(touched)]

            merged = self.merged_frame(
                batch.drop("_bucket"), touched, op_col=op_col
            )
            new_entries = self._write_data_files(
                self._with_bucket(merged.select(*cols, op_col)),
                f"snap-{snapshot_id}",
                split_tombstones_on=op_col,
                # keyhash: merged_frame pinned its one fused-agg exchange to
                # n_buckets partitions on the key — already bucket-laid-out
                pre_partitioned=n_aligned is not None,
            )
        finally:
            if persisted:
                batch.unpersist()
        data_rows = sum(e["rows"] for e in new_entries if e["kind"] == "data")
        tomb_rows = sum(e["rows"] for e in new_entries if e["kind"] == "tombstone")
        s = {
            "buckets-rewritten": len(touched),
            "files-kept": len(kept),
            "rows-written": data_rows,
            "tombstones-written": tomb_rows,
        }
        s.update(summary or {})
        # CoW rewrites the touched buckets' data, so an O(kept+new) manifest
        # rewrite is already dominated by the data job — no segment reuse
        # (kept entries may span many parent segments minus touched buckets)
        return self._commit("merge", s, new_entries=kept + new_entries)

    def merged_frame(
        self, batch: DataFrame, touched: list[int], op_col: str = "op"
    ) -> DataFrame:
        """The CoW merge plan: MERGE as ONE aggregation, not a full-outer
        join — (touched-bucket target ∪ batch) → max_by(payload,
        struct(lsn, is_target)) per key.

        Identical semantics to the join kernel (plans/apply.py
        merge_into_frame): the ``is_target`` tiebreak makes equal-LSN
        redelivery keep the target row (the join's strict ``s.lsn > t.lsn``),
        and when the batch is raw the same aggregation IS the within-batch
        max-LSN dedup.  Plan-shape note: with the keyhash pin below, the
        explicit repartition IS the exchange, and the planner hoists BOTH
        halves of the aggregate above it — rows cross the wire un-combined
        (no map-side shrink).  That is a measured tradeoff, not an
        accident: the alternative (combine below a default exchange, then a
        second exchange to the bucket layout for the write) was the
        pre-keyhash plan, and the one-exchange form beat it ~1.6x on delta
        writes at CDC duplicate ratios; batches hot enough for reducer skew
        auto-route to the salted strategy, which spreads each hot key over
        n_salts reducers before the final exchange.  The target view
        includes tombstones so a
        stale 'U' below a delete's LSN loses the comparison instead of
        resurrecting the key; delete winners stay in the output (op='D') for
        the write to route into tombstone files in the same job.

        The target side is read RAW, not resolved: a pure-CoW bucket's data
        and tombstone files hold disjoint key sets (every rewrite winnows one
        winner per key and routes it by op), so pre-resolving them would be a
        no-op costing an extra aggregation shuffle — the one fused agg picks
        the winner across {base rows, tombstone rows, batch rows} directly.
        Buckets that do carry delta files (mixed-mode tables) fall back to
        the resolved read."""
        cols = self.column_names
        out_cols = [*cols, op_col]
        target = self._raw_target_view(touched, op_col=op_col)
        unioned = target.withColumn("_tgt", F.lit(1)).unionByName(
            batch.select(*out_cols).withColumn("_tgt", F.lit(0))
        )
        n_aligned = self.aligned_partitions()
        if n_aligned is not None:
            # pin the fused agg's exchange to n_buckets key-hash partitions:
            # hashpartitioning(key, n) satisfies the groupBy's distribution
            # (no second exchange appears) and the rewrite can then write
            # pre_partitioned — ONE exchange for dedup+merge+bucket-layout
            unioned = unioned.repartition(
                n_aligned, *[F.col(c) for c in self.key]
            )
        payload = F.struct(*[F.col(c) for c in out_cols])
        order = F.struct(F.col(self.lsn_col), F.col("_tgt"))
        return (
            unioned.groupBy(*self.key)
            .agg(F.max_by(payload, order).alias("_w"))
            .select([F.col(f"_w.{c}").alias(c) for c in out_cols])
        )

    def _raw_target_view(self, touched: list[int], op_col: str = "op") -> DataFrame:
        """Touched-bucket rows for the merge aggregation, WITHOUT resolution:
        data files as op='U', tombstone files with their op column, no dedup
        (pure-CoW buckets are already ≤1 row per key across both kinds).
        Falls back to the resolved read when deltas are present."""
        snap = self.current_snapshot()
        wanted = set(touched)
        manifest = [e for e in self.manifest(snap) if e["bucket"] in wanted]
        if any(e.get("kind", "data") == "delta" for e in manifest):
            return self.read_buckets(touched, keep_tombstones=True)
        schema_id = self.meta["current_schema_id"]
        data = [e for e in manifest if e.get("kind", "data") == "data"]
        tombs = [e for e in manifest if e.get("kind", "data") == "tombstone"]
        parts: list[DataFrame] = []
        if data:
            parts.append(
                self._read_manifest(data, schema_id).withColumn(op_col, F.lit("U"))
            )
        if tombs:
            parts.append(self._read_manifest(tombs, schema_id, extra_cols=(op_col,)))
        if not parts:
            empty = self.spark.createDataFrame([], self._schema_for(schema_id))
            return empty.withColumn(op_col, F.lit("U"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def stage_delta(
        self, winners: DataFrame, op_col: str = "op", aligned: bool = False
    ) -> list[dict]:
        """Write a batch's MoR delta files WITHOUT committing; returns the
        manifest entries for :meth:`commit_delta`.

        This is the concurrent-ingest split of the MoR merge: delta writes
        touch no shared state (each stage gets its own directory), so multiple
        micro-batches can stage in parallel threads while commits stay
        serialized in LSN order (the engine's exactly-once contract).
        Requires a schema-stable window: callers must resolve drift before
        staging (the engine serializes on drift)."""
        if self.meta.get("write_mode", "cow") != "mor":
            raise ValueError("stage_delta requires write_mode='mor'")
        batch = self._with_bucket(winners.select(*self.column_names, op_col))
        return self._write_data_files(
            batch, f"delta-stage-{uuid.uuid4().hex[:12]}", kind="delta",
            pre_partitioned=aligned and self.aligned_partitions() is not None,
        )

    def commit_delta(self, entries: list[dict], summary: dict | None = None) -> int:
        """Attach staged delta entries to the table (single-writer commit)."""
        cur = self.current_snapshot()
        s = {
            "delta-rows-written": sum(e["rows"] for e in entries),
            "rows-written": sum(e["rows"] for e in entries),
            "buckets-rewritten": 0,
            "files-kept": len(self.manifest(cur)),
        }
        s.update(summary or {})
        return self._commit(
            "merge", s, base_segs=self._segs_of(cur), new_entries=entries
        )

    def discard_staged(self, entries: list[dict]) -> None:
        """Remove staged delta files that will never be committed (e.g. the
        batch lost the watermark race on redelivery)."""
        import shutil as _shutil

        dirs = {os.path.dirname(os.path.join(self.root, e["path"])) for e in entries}
        for d in dirs:
            _shutil.rmtree(os.path.dirname(d) if "_bucket=" in os.path.basename(d) else d,
                           ignore_errors=True)

    def compact(
        self,
        summary: dict | None = None,
        tombstone_retention_lsn: int | None = None,
    ) -> int:
        """Fold delta files into data files (MoR maintenance).  Resolves the
        current state once and rewrites it; subsequent reads are plain scans
        again.  At scale this is the Iceberg ``rewrite_data_files`` analog —
        run when delta rows exceed a fraction of base rows.

        Delete winners are NOT discarded: they are rewritten as
        ``kind='tombstone'`` entries (Iceberg's equality-delete retention
        analog), so a partially-overlapping redelivery after compaction — an
        older 'U' for a deleted key — still loses the LSN comparison instead
        of resurrecting the key (the engine's exactly-once contract).
        Tombstones are ignored by plain reads of delta-free buckets, so they
        cost nothing until a new delta lands in their bucket.

        ``tombstone_retention_lsn``: GC horizon — tombstones with
        ``lsn <= horizon`` are dropped (safe once the caller knows no
        redelivery can reach below that LSN, e.g. the source's acked offset)."""
        snapshot_id = self._next_snapshot_id()
        cur = self.current_snapshot()
        manifest = self.manifest(cur)
        folded = [e for e in manifest if e.get("kind", "data") != "data"]
        has_deltas = any(e.get("kind", "data") == "delta" for e in folded)
        # tombstone-only manifests are already plain-scan fast; rewriting them
        # is only worth it when a GC horizon lets us actually drop tombstones
        if not has_deltas and not (folded and tombstone_retention_lsn is not None):
            return self._commit(
                "compact", {"noop": True, **(summary or {})},
                base_segs=self._segs_of(cur),
            )

        # PARTIAL compaction: only buckets holding deltas (plus, when a GC
        # horizon is set, buckets holding tombstones) are resolved and
        # rewritten; clean buckets' files are carried by reference like the
        # CoW merge's kept entries — maintenance cost is O(dirty buckets),
        # not O(table), which is what keeps auto-compaction bounded inside a
        # long ingest loop.
        dirty = {
            e["bucket"] for e in manifest if e.get("kind", "data") == "delta"
        }
        if tombstone_retention_lsn is not None:
            dirty |= {
                e["bucket"] for e in manifest
                if e.get("kind", "data") == "tombstone"
            }
        kept = [e for e in manifest if e["bucket"] not in dirty]
        sub = [e for e in manifest if e["bucket"] in dirty]

        # keyhash: pin the resolution's dedup exchange to n_buckets so both
        # rewrites below reuse it as the bucket layout (zero repartitions)
        n_aligned = self.aligned_partitions()
        winners = self._resolve(
            sub, self.meta["current_schema_id"], keep_tombstones=True,
            n_partitions=n_aligned,
        ).persist()
        try:
            live = winners.filter(F.col("op") != F.lit("D")).select(*self.column_names)
            new_entries = self._write_data_files(
                self._with_bucket(live), f"snap-{snapshot_id}",
                pre_partitioned=n_aligned is not None,
            )
            tombs = winners.filter(F.col("op") == F.lit("D"))
            if tombstone_retention_lsn is not None:
                tombs = tombs.filter(F.col(self.lsn_col) > tombstone_retention_lsn)
            tomb_entries = self._write_data_files(
                self._with_bucket(tombs.select(*self.column_names, "op")),
                f"tomb-{snapshot_id}",
                kind="tombstone",
                pre_partitioned=n_aligned is not None,
            )
        finally:
            winners.unpersist()
        s = {
            "rows-written": sum(e["rows"] for e in new_entries),
            "deltas-folded": len([e for e in sub if e.get("kind", "data") == "delta"]),
            "buckets-compacted": len(dirty),
            "files-kept": len(kept),
            "tombstones-retained": sum(e["rows"] for e in tomb_entries),
        }
        s.update(summary or {})
        return self._commit(
            "compact", s, new_entries=kept + new_entries + tomb_entries
        )

    # ---------------- maintenance: snapshot expiry + orphan GC ----------------

    def expire_snapshots(
        self, keep_last: int = 1, delete_orphans: bool = True
    ) -> dict:
        """Iceberg ``expire_snapshots`` analog: drop all but the newest
        ``keep_last`` snapshots from the log; optionally delete data files
        and manifest segments referenced ONLY by expired snapshots.

        At 10^10-event scale the snapshot log grows by one entry per
        micro-batch — unbounded metadata and unbounded delta/tombstone file
        retention without expiry.  This is the bound: metadata stays
        O(keep_last), disk stays O(live files).  Time travel to expired
        snapshots becomes unavailable (by design); the exactly-once
        watermark is preserved via ``expired_offset_end`` even when every
        kept snapshot lacks an ``offsets.end`` stamp (e.g. newest commit is
        an evolve/compact).  Single-writer, like all commits."""
        snaps = self.meta["snapshots"]
        keep_last = max(1, int(keep_last))
        if len(snaps) <= keep_last:
            return {"snapshots_removed": 0, "files_deleted": 0, "segs_deleted": 0}
        kept, expired = snaps[-keep_last:], snaps[:-keep_last]
        cur_id = self.meta["current_snapshot_id"]
        if not any(s["snapshot_id"] == cur_id for s in kept):
            # safety invariant, not a debug check — must survive python -O
            raise RuntimeError(
                f"expire_snapshots would drop the current snapshot {cur_id}"
            )

        # roll the watermark of expired merge commits into table metadata
        best = int(self.meta.get("expired_offset_end", -1))
        for s in expired:
            end = s["summary"].get("offsets.end")
            if end is not None:
                best = max(best, int(end))
        if best >= 0:
            self.meta["expired_offset_end"] = best

        live_files = {e["path"] for s in kept for e in self.manifest(s)}
        live_segs = {seg for s in kept for seg in s.get("manifest_segs", [])}
        dead_files: set[str] = set()
        dead_segs: set[str] = set()
        for s in expired:
            dead_files.update(e["path"] for e in self.manifest(s))
            dead_segs.update(s.get("manifest_segs", []))
        dead_files -= live_files
        dead_segs -= live_segs

        # Iceberg ordering: COMMIT the pruned metadata first, THEN clean up.
        # A crash between the two leaves harmless orphan files; the reverse
        # order would leave metadata pointing at deleted files (broken
        # manifest()/read() for still-listed snapshots).
        self.meta["snapshots"] = kept
        self.meta["version"] += 1
        self._write_metadata()

        n_files = n_segs = 0
        if delete_orphans:
            emptied: set[str] = set()
            for rel in dead_files:
                p = os.path.join(self.root, rel)
                if os.path.exists(p):
                    os.remove(p)
                    n_files += 1
                    emptied.add(os.path.dirname(p))
            for rel in dead_segs:
                p = os.path.join(self.root, rel)
                if os.path.exists(p):
                    os.remove(p)
                    n_segs += 1
                self._seg_cache.pop(rel, None)
            # prune dirs the deletions emptied (plus their write markers):
            # each commit leaves data/<snap>/_bucket=N/ trees and _SUCCESS
            # files behind — without this, directory/inode count grows
            # O(commits), the exact footprint this method exists to bound.
            # Walk upward while dirs stay empty, stopping at the table root.
            root_real = os.path.realpath(self.root)
            for d in sorted(emptied, key=len, reverse=True):
                while os.path.realpath(d) != root_real and os.path.isdir(d):
                    left = os.listdir(d)
                    markers = [
                        f for f in left
                        if f == "_SUCCESS" or f.startswith(".")
                    ]
                    if len(markers) != len(left):
                        break  # dir still holds live content
                    for f in markers:
                        os.remove(os.path.join(d, f))
                    os.rmdir(d)
                    d = os.path.dirname(d)
            # superseded metadata versions: every commit leaves a v{n}.json
            # behind — same O(commits) footprint.  The current version
            # (just written, referenced by version-hint) is kept.
            meta_dir = os.path.join(self.root, "metadata")
            cur_v = self.meta["version"]
            for fname in os.listdir(meta_dir):
                if fname.startswith("v") and fname.endswith(".json"):
                    try:
                        v = int(fname[1:-5])
                    except ValueError:
                        continue
                    if v < cur_v:
                        os.remove(os.path.join(meta_dir, fname))
        return {
            "snapshots_removed": len(expired),
            "files_deleted": n_files,
            "segs_deleted": n_segs,
        }

    # ---------------- schema evolution ----------------

    def evolve(
        self,
        renames: dict[str, str] | None = None,
        adds: list[tuple[str, str]] | None = None,
        summary: dict | None = None,
        promotes: dict[str, str] | None = None,
    ) -> int:
        """Schema evolution by field ID — renames keep the ID (old files keep
        serving the column under its old on-disk name), adds mint new IDs (old
        files serve NULL), ``promotes`` widens a column's type in place
        (``SAFE_PROMOTIONS`` only: int→long, float→double — old files keep
        the narrow physical type and are cast up at read).  No data rewrite
        (Iceberg evolve semantics).

        Promotion of key, LSN, or bucket-source columns is REFUSED: unlike
        Iceberg's spec bucket transform (which hashes int as long precisely
        so promotion can't move rows), this table's transforms use Spark's
        ``F.hash``/``xxhash64``, whose int32 and int64 hashes differ —
        promoting such a column would silently re-bucket every existing
        row.  RENAMING them is fine (same field ID, same data): the table's
        name-keyed metadata (``key``, ``lsn_column``,
        ``partition_spec.source``) follows the rename.  ``promotes`` keys
        refer to post-rename names."""
        renames = renames or {}
        adds = adds or []
        promotes = promotes or {}
        cur_fields = self.current_schema_meta["fields"]
        names = {f["name"] for f in cur_fields}
        for old in renames:
            if old not in names:
                raise KeyError(f"rename source {old!r} not in schema")
        # rename targets must not collide — with a surviving column, with
        # each other, or with another rename's source-after-rename
        post = [renames.get(f["name"], f["name"]) for f in cur_fields]
        dupes = {n for n in post if post.count(n) > 1}
        if dupes:
            raise ValueError(
                f"rename target(s) collide with existing columns: {sorted(dupes)}"
            )
        for name, _ in adds:
            if name in post:
                raise ValueError(f"add target {name!r} already exists")
            post.append(name)  # adds must not collide with each other either

        new_fields = [
            {**f, "name": renames.get(f["name"], f["name"])} for f in cur_fields
        ]
        if promotes:
            by_name = {f["name"]: f for f in new_fields}
            # the bucket-source column is protected for the same reason as
            # the key: xxhash64/F.hash are not width-stable, so promoting
            # the column a 'bucket'-transform table partitions on would
            # silently re-bucket every existing row
            protected = (
                set(renames.get(k, k) for k in self.key)
                | {renames.get(self.lsn_col, self.lsn_col)}
                | {
                    renames.get(
                        self.meta["partition_spec"]["source"],
                        self.meta["partition_spec"]["source"],
                    )
                }
            )
            promotes = dict(promotes)  # canonicalized in place for the summary
            for name, new_type in promotes.items():
                f = by_name.get(name)
                if f is None:
                    raise KeyError(f"promote target {name!r} not in schema")
                if name in protected:
                    raise ValueError(
                        f"cannot promote key/LSN/bucket-source column "
                        f"{name!r}: the bucket transforms are not "
                        f"width-stable (see evolve docs)"
                    )
                # canonicalize to simpleString ("long" and "bigint" both OK in)
                new_type_c = _type_to_str(_str_to_type(new_type))
                if (f["type"], new_type_c) not in SAFE_PROMOTIONS:
                    raise ValueError(
                        f"unsafe promotion {name!r}: {f['type']} -> {new_type_c} "
                        f"(allowed: {sorted(SAFE_PROMOTIONS)})"
                    )
                f["type"] = new_type_c
                promotes[name] = new_type_c
        last_id = self.meta["last_field_id"]
        for name, type_str in adds:
            last_id += 1
            _ = _str_to_type(type_str)  # validate
            new_fields.append({"id": last_id, "name": name, "type": type_str})

        new_schema_id = max(s["schema_id"] for s in self.meta["schemas"]) + 1
        self.meta["schemas"].append({"schema_id": new_schema_id, "fields": new_fields})
        self.meta["current_schema_id"] = new_schema_id
        self.meta["last_field_id"] = last_id
        # renaming a key / LSN / bucket-source column is legal (same field
        # ID, same data) — but every piece of table metadata that refers to
        # the column BY NAME must follow the rename, or the next merge/read
        # groupBys a name that no longer exists and the table is bricked
        if renames:
            self.meta["key"] = [renames.get(k, k) for k in self.meta["key"]]
            self.meta["lsn_column"] = renames.get(
                self.meta["lsn_column"], self.meta["lsn_column"]
            )
            spec = self.meta["partition_spec"]
            spec["source"] = renames.get(spec["source"], spec["source"])

        cur = self.current_snapshot()
        s = {
            "schema-renames": json.dumps(renames),
            "schema-adds": json.dumps([list(a) for a in adds]),
            "schema-promotes": json.dumps(promotes),
        }
        s.update(summary or {})
        return self._commit(
            "evolve", s, schema_id=new_schema_id, base_segs=self._segs_of(cur)
        )
