"""Snapshot-committed tables: the Iceberg stand-in.

Production target is Apache Iceberg (atomic commits, snapshot tags,
time travel) — this sandbox has no Iceberg runtime jars, so SnapshotTable
reproduces the subset of semantics the engine needs over plain parquet:

- each commit writes a new immutable snapshot directory, then atomically
  installs it by `os.replace` of a small JSON pointer file — the exact
  analogue of the reference's rename-swap install
  (crawl/CrawlDb.java:148-164) and of an Iceberg metadata-pointer swap;
- snapshots carry tags (cycle markers) so a killed crawl resumes from the
  last committed cycle;
- readers always see a complete snapshot (never a partial write).

Swapping this class for `spark.read/writeTo("catalog.db.table")` is a
one-file change; operators only see DataFrames.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    tag: str | None
    path: str
    committed_at_ms: int
    parent_id: int | None
    append: bool = False
    # Iceberg bucket-spec analogue: hash-bucket layout recorded per snapshot
    bucket_col: str | None = None
    bucket_n: int | None = None
    table_name: str | None = None
    # Iceberg snapshot-summary analogue: row count recorded at commit time
    # (from the writer's Observation) so readers never pay a count() scan
    row_count: int | None = None


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.root = os.path.join(root, name)
        self.name = name
        os.makedirs(self.root, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_snapshots.json")

    def _load_log(self) -> list[dict]:
        if not os.path.exists(self._pointer):
            return []
        with open(self._pointer) as f:
            return json.load(f)

    def _install_log(self, log: list[dict]) -> None:
        # atomic pointer swap (crawl/CrawlDb.java:148-164 analogue)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self._pointer)

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**e) for e in self._load_log()]

    def latest(self) -> Snapshot | None:
        log = self._load_log()
        return Snapshot(**log[-1]) if log else None

    def by_tag(self, tag: str) -> Snapshot | None:
        for e in reversed(self._load_log()):
            if e["tag"] == tag:
                return Snapshot(**e)
        return None

    def exists(self) -> bool:
        return self.latest() is not None

    # -- I/O ---------------------------------------------------------------
    def _table_name(self, sid: int) -> str:
        # catalog-unique, deterministic from (root, name, sid) so a resumed
        # session re-registers the exact same name recorded in the log
        import hashlib

        h = hashlib.md5(self.root.encode()).hexdigest()[:8]
        return f"{self.name}_{h}_snap{sid:06d}"

    def commit(self, df: DataFrame, tag: str | None = None,
               partition_by: list[str] | None = None,
               bucket_by: tuple[str, int] | None = None) -> Snapshot:
        """Write df as a new snapshot and atomically install it.

        bucket_by=(col, n) writes a hash-bucketed layout (the Iceberg
        `bucket(n, col)` partition-spec analogue, realized as a Spark
        bucketed datasource table). The payoff is join-side: a scan of a
        bucketed snapshot reports HashPartitioning(col, n), so an equi-join
        on col shuffles ONLY the other side (reference analogue: the
        MapFile-keyed crawldb makes CrawlDb's reduce co-group shuffle-free
        on sorted keys, crawl/CrawlDb.java:90-116). The write itself adds
        no exchange either: when the incoming df is already hash-placed on
        col (as the updatedb merge output is), each task holds exactly one
        bucket and emits one bucket-tagged file; misaligned input merely
        yields more files per bucket, never wrong results."""
        return self.install(self.prepare(df, tag=tag, partition_by=partition_by,
                                         bucket_by=bucket_by))

    def prepare(self, df: DataFrame, tag: str | None = None,
                partition_by: list[str] | None = None,
                bucket_by: tuple[str, int] | None = None) -> dict:
        """Phase 1 of a two-phase commit (the Iceberg write protocol: data
        files first, metadata-pointer swap last). Writes the snapshot's data
        WITHOUT installing the pointer — invisible to readers until
        install(). Lets a caller use the snapshot write itself as a plan's
        single materialization (instead of a .cache() columnar copy) and
        still keep the pointer swap — the completeness marker — as the last
        step. A crash before install() leaves only an orphan data dir; a
        redo recomputes the same snapshot id and overwrites it in place."""
        log = self._load_log()
        sid = (log[-1]["snapshot_id"] + 1) if log else 1
        path = os.path.join(self.root, f"snap-{sid:06d}")
        snap = {
            "snapshot_id": sid,
            "tag": tag,
            "path": path,
            "committed_at_ms": int(time.time() * 1000),
            "parent_id": log[-1]["snapshot_id"] if log else None,
            "append": False,
        }
        if bucket_by:
            col, n = bucket_by
            tname = self._table_name(sid)
            spark = df.sparkSession
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
            (
                df.write.mode("overwrite")
                .format("parquet")
                .option("path", path)
                .bucketBy(n, col)
                .sortBy(col)
                .saveAsTable(tname)
            )
            snap.update(bucket_col=col, bucket_n=n, table_name=tname)
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        return snap

    def read_pending(self, spark: SparkSession, pending: dict) -> DataFrame:
        """Scan a prepare()d-but-not-installed snapshot's data files."""
        snap = Snapshot(**pending)
        if snap.bucket_col:
            return self._read_bucketed(spark, snap)
        return spark.read.parquet(snap.path)

    def install(self, pending: dict) -> Snapshot:
        """Phase 2: atomically install a prepare()d snapshot (pointer swap).
        Refuses if another snapshot landed since prepare() — the id (and
        with it the data path) would collide."""
        log = self._load_log()
        expected = (log[-1]["snapshot_id"] + 1) if log else 1
        if pending["snapshot_id"] != expected:
            raise RuntimeError(
                f"install({self.name}): snapshot id {pending['snapshot_id']} is "
                f"stale (next id is {expected}); a commit landed since prepare()")
        pending["committed_at_ms"] = int(time.time() * 1000)
        log.append(pending)
        self._install_log(log)
        return Snapshot(**pending)

    def append(self, df: DataFrame, tag: str | None = None) -> Snapshot:
        """Append-only commit (fast path for logs: lineage, metrics).
        Readers union all appended snapshots since the last full commit."""
        log = self._load_log()
        sid = (log[-1]["snapshot_id"] + 1) if log else 1
        path = os.path.join(self.root, f"snap-{sid:06d}")
        df.write.mode("overwrite").parquet(path)
        snap = {
            "snapshot_id": sid,
            "tag": tag,
            "path": path,
            "committed_at_ms": int(time.time() * 1000),
            "parent_id": log[-1]["snapshot_id"] if log else None,
            "append": True,
        }
        log.append(snap)
        self._install_log(log)
        return Snapshot(**snap)

    def append_rows(self, rows: list[dict], tag: str | None = None) -> Snapshot:
        """Append tiny driver-side log rows (lineage, per-partition metrics)
        without a Spark write job: one pyarrow file + pointer swap. A Spark
        parquet write costs task launch + the output-committer rename dance
        per cycle — pure serial driver time for a ~36-row table, i.e.
        exactly the fraction the N->4N scaling criterion punishes."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        log = self._load_log()
        sid = (log[-1]["snapshot_id"] + 1) if log else 1
        path = os.path.join(self.root, f"snap-{sid:06d}")
        os.makedirs(path, exist_ok=True)
        table = pa.Table.from_pylist(rows)
        # pin physical types to the table's existing parquet layout:
        # read() unions every append since the last full commit into ONE
        # spark.read.parquet call, so a pyarrow-inferred int64 next to a
        # Spark-written int32 (or an all-None column inferred as null type)
        # would mix conflicting physical types in one scan
        ref_schema = self._latest_parquet_schema(log)
        if ref_schema is not None and set(ref_schema.names) == set(table.schema.names):
            table = table.select(ref_schema.names).cast(ref_schema)
        else:
            null_cols = [f.name for f in table.schema if pa.types.is_null(f.type)]
            if null_cols:
                raise ValueError(
                    f"append_rows({self.name}): columns {null_cols} are all-None and "
                    "no prior snapshot pins their type; pass typed values"
                )
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))
        snap = {
            "snapshot_id": sid,
            "tag": tag,
            "path": path,
            "committed_at_ms": int(time.time() * 1000),
            "parent_id": log[-1]["snapshot_id"] if log else None,
            "append": True,
        }
        log.append(snap)
        self._install_log(log)
        return Snapshot(**snap)

    def read(self, spark: SparkSession, tag: str | None = None, snapshot_id: int | None = None) -> DataFrame:
        if snapshot_id is not None:
            snap = next((s for s in self.snapshots()
                         if s.snapshot_id == snapshot_id), None)
            if snap is None:
                raise KeyError(
                    f"no snapshot id {snapshot_id} in {self.name} "
                    f"(expired or never existed)")
        elif tag is not None:
            snap = self.by_tag(tag)
            if snap is None:
                raise KeyError(f"no snapshot tagged {tag!r} in {self.name}")
        else:
            snap = self.latest()
            if snap is None:
                raise KeyError(f"table {self.name} has no snapshots")
        if not snap.append:
            if snap.bucket_col:
                return self._read_bucketed(spark, snap)
            return spark.read.parquet(snap.path)
        # append snapshot: union every append since the last full commit
        paths = []
        for e in self.snapshots():
            if e.snapshot_id > snap.snapshot_id:
                break
            if e.append:
                paths.append(e.path)
            else:
                paths = [e.path]
        return spark.read.parquet(*paths)

    def _latest_parquet_schema(self, log: list[dict]):
        """Arrow schema of the newest snapshot's parquet files (None if no
        snapshot or no readable file) — used to keep append_rows writes
        byte-compatible with Spark-written history."""
        import pyarrow.parquet as pq

        for e in reversed(log):
            d = e["path"]
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".parquet"):
                    try:
                        return pq.read_schema(os.path.join(d, fn))
                    except Exception:
                        return None
        return None

    def _read_bucketed(self, spark: SparkSession, snap: Snapshot) -> DataFrame:
        """Scan a bucketed snapshot through the session catalog so Catalyst
        sees HashPartitioning(bucket_col, bucket_n). A fresh session (crash
        resume) re-registers the external table from the snapshot log —
        the in-memory catalog is session-scoped, the parquet layout is not."""
        tname = snap.table_name
        if not spark.catalog.tableExists(tname):
            sch = spark.read.parquet(snap.path).schema
            try:
                ddl = sch.toDDL()
            except AttributeError:  # classic-mode fallback
                ddl = spark.createDataFrame([], sch)._jdf.schema().toDDL()
            spark.sql(
                f"CREATE TABLE {tname} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({snap.bucket_col}) SORTED BY ({snap.bucket_col}) "
                f"INTO {snap.bucket_n} BUCKETS LOCATION '{snap.path}'"
            )
        return spark.table(tname)

    def expire_snapshots(self, keep: int = 3, spark: SparkSession | None = None) -> int:
        """Drop all but the newest `keep` snapshots (GC; Iceberg expire analogue).
        Pass spark to also deregister dead bucketed snapshots' catalog tables
        (the in-memory catalog is session-scoped, so this is best-effort)."""
        log = self._load_log()
        if len(log) <= keep:
            return 0
        dead, live = log[:-keep], log[-keep:]
        # append chains: a retained APPEND snapshot is a logical union of
        # every snapshot back to (and including) its base full commit —
        # expiring any of those would silently drop their rows from read().
        # Walk back from the oldest retained snapshot to its chain base and
        # keep everything from there on.
        while dead and live and live[0].get("append"):
            live.insert(0, dead.pop())
        if not dead:
            return 0
        self._install_log(live)
        n = 0
        for e in dead:
            if spark is not None and e.get("table_name"):
                spark.sql(f"DROP TABLE IF EXISTS {e['table_name']}")
            if os.path.isdir(e["path"]):
                shutil.rmtree(e["path"], ignore_errors=True)
                n += 1
        return n


class Catalog:
    """A directory of SnapshotTables (hadoop-catalog analogue)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.root, name)
