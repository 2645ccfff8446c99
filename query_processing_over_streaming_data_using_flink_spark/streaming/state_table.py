"""Versioned bucketed state tables for foreachBatch pipelines — the
state discipline shared by the Q3 IVM (`streaming/ivm.py`) and the
streaming near-dedup (`streaming/dedup.py`).

Layout: ``state_dir/v<epoch>[c...]/<table>/bucket=N/*.parquet`` plus an
atomically-renamed ``CURRENT`` pointer file naming the live version and
its epoch. Contract (same as the IVM's, factored out):

* `write_merged` stages ONLY the buckets an epoch touched;
* `commit(epoch)` builds the next version — staged buckets moved in,
  untouched buckets carried over as hard links (metadata only, no row
  data) — then flips the pointer. With ``append=True`` the staged
  files are ADDED to the carried-over bucket contents instead of
  replacing them (log-structured state: per-epoch write cost is the
  delta itself; readers aggregate, `compact` folds the log down).
  A crash before the flip leaves the previous complete version live;
  redelivered epochs are detected via `committed_epoch()` and skipped
  by the caller, so replay is exactly-once.
* `compact(transforms)` rewrites tables through per-table DataFrame
  transforms (aggregate a log-structured table down, drop dead rows —
  carry-over disabled so emptied buckets vanish), preserving the epoch.
* A `run_id` (e.g. the Structured Streaming checkpoint's UUID) can be
  bound via `check_run`; it is persisted in the pointer, and a
  mismatch HARD-FAILS instead of silently replay-skipping epochs from
  a different stream whose ids restarted at 0 (a fresh checkpoint over
  old state would otherwise discard every new batch).

Reader window: `read` resolves the version under `swap_lock`, but the
returned DataFrame is lazy — GC keeps the current version plus the two
most recent predecessors, so a reader must materialize within two
commits of issue or re-issue the read.

On a real cluster the same pipeline swaps this directory dance for
Delta/Iceberg ``MERGE INTO``; the bucketing & touched-partition
discipline is identical.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"v-?\d+c*")
_POINTER = "CURRENT"
# Current version + this many predecessors survive GC (in-flight lazy
# readers straddling a commit keep resolving).
_KEEP_PREDECESSORS = 2


def dir_bytes(path: str) -> int:
    """Total bytes of files under `path` (0 if absent) — shared by the
    committed-state and tmp-spill size probes."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def dir_rows(path: str) -> int:
    """Total rows of the parquet files under `path` (0 if absent),
    read from file FOOTERS only — driver-side metadata, no Spark job,
    no data pages. Feeds the per-epoch pipeline telemetry."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class VersionedBucketedState:
    """Crash-atomic, hard-link-versioned, bucket-partitioned parquet
    state tables. `tables` maps table name -> DDL schema string whose
    first column is ``bucket int`` (the partition column)."""

    def __init__(self, spark: SparkSession, state_dir: str, tables: dict[str, str]) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.tables = dict(tables)
        self._run_id: str | None = None
        # REENTRANT: read() takes it internally; external emission
        # timers may already hold it around a read.
        self.swap_lock = threading.RLock()
        os.makedirs(state_dir, exist_ok=True)
        self._check_layout()

    def _check_layout(self) -> None:
        """Hard-fail on a state dir written by a DIFFERENT table
        layout: a committed version containing table dirs this pipeline
        does not declare means the pipeline's state schema changed
        (e.g. a renamed or removed state table) — silently resuming
        would read EMPTY DataFrames for the missing tables and produce
        wrong results with no error. (Declared tables may legitimately
        be absent — an epoch that produced no rows for them — so only
        UNKNOWN dirs are fatal.)"""
        _, ver = self._current()
        if ver is None:
            return
        found = {
            e
            for e in os.listdir(ver)
            if not e.startswith("_") and os.path.isdir(os.path.join(ver, e))
        }
        unknown = found - set(self.tables)
        if unknown:
            raise RuntimeError(
                f"state dir {self.state_dir} contains table(s) {sorted(unknown)} "
                f"unknown to this pipeline's layout {sorted(self.tables)}: it was "
                "written by a different pipeline version — wipe the state dir "
                "together with its checkpoint"
            )

    # -- pointer -------------------------------------------------------------

    def _pointer(self) -> dict:
        try:
            with open(os.path.join(self.state_dir, _POINTER)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"epoch": -1, "version": None}

    def _current(self) -> tuple[int, str | None]:
        meta = self._pointer()
        ver = meta["version"]
        return meta["epoch"], None if ver is None else os.path.join(self.state_dir, ver)

    def committed_epoch(self) -> int:
        return self._current()[0]

    def check_run(self, run_id: str) -> None:
        """Bind this state dir to a stream identity. If the committed
        pointer carries a DIFFERENT run_id, the epoch ids in play come
        from another stream (e.g. a deleted-and-recreated checkpoint
        restarting at batch 0) — replay-skip would silently discard
        every new batch, so fail loudly instead."""
        existing = self._pointer().get("run_id")
        if existing is not None and existing != run_id:
            raise RuntimeError(
                f"state dir {self.state_dir} belongs to stream run {existing!r}, "
                f"got {run_id!r}: wipe the state dir together with the checkpoint "
                "(epoch ids restarted — replay-skip would drop new batches)"
            )
        self._run_id = run_id

    # -- I/O -----------------------------------------------------------------

    def _tmp(self, name: str) -> str:
        return os.path.join(self.state_dir, f"_tmp_{name}")

    def read(self, name: str) -> DataFrame:
        with self.swap_lock:
            _, ver = self._current()
        path = None if ver is None else os.path.join(ver, name)
        if path is None or not os.path.isdir(path):
            return self.spark.createDataFrame([], self.tables[name])
        # Explicit schema: a table dir can exist with zero bucket
        # subdirs (an epoch that touched nothing) — inference would
        # fail. Extra data columns in appended delta files are
        # projected away by the schema.
        return self.spark.read.schema(self.tables[name]).parquet(path)

    def bytes(self, name: str) -> int:
        """On-disk bytes of `name` in the current committed version
        (0 if absent) — a zero-Spark-jobs size probe callers can use to
        pick a physical join side (broadcast the smaller of delta and
        state)."""
        with self.swap_lock:
            _, ver = self._current()
        if ver is None:
            return 0
        return dir_bytes(os.path.join(ver, name))

    def restrict(self, state: DataFrame, touched: DataFrame) -> DataFrame:
        """State rows in the buckets `touched` names (semi-join on the
        partition column → dynamic partition pruning skips the rest)."""
        from pyspark.sql import functions as F

        return state.join(
            F.broadcast(touched.select("bucket").distinct()), "bucket", "semi"
        )

    def write_merged(self, name: str, merged: DataFrame) -> None:
        """Stage an epoch's merged contents for `name` — ONLY the
        touched buckets need be present."""
        merged.write.partitionBy("bucket").mode("overwrite").parquet(self._tmp(name))

    # -- commit --------------------------------------------------------------

    def commit(self, epoch_id: int, append: bool = False) -> None:
        """Publish staged buckets as version v<epoch>. Replace mode
        (default): a staged bucket replaces the old bucket's contents.
        Append mode: staged files are added to every old bucket's
        hard-linked contents — per-epoch cost is O(delta) in data AND
        in shuffles (no read-merge-rewrite of old state)."""
        self._commit_version(f"v{epoch_id}", epoch_id, carry_over=True, append=append)

    def compact(self, transforms: dict[str, Callable[[DataFrame], DataFrame]]) -> None:
        """Rewrite tables through their transform (aggregate a
        log-structured table to net rows, drop dead keys); emptied
        buckets vanish (no carry-over). Epoch id preserved."""
        committed, ver = self._current()
        if ver is None:
            return
        for name in self.tables:
            fn = transforms.get(name)
            df = self.read(name)
            self.write_merged(name, fn(df) if fn is not None else df)
        self._commit_version(os.path.basename(ver) + "c", committed, carry_over=False)

    def _commit_version(
        self, version: str, epoch_id: int, carry_over: bool, append: bool = False
    ) -> None:
        _, old_ver = self._current()
        new_ver = os.path.join(self.state_dir, version)
        # Debris from a crashed attempt at this same version.
        shutil.rmtree(new_ver, ignore_errors=True)
        for name in self.tables:
            dst_table = os.path.join(new_ver, name)
            os.makedirs(dst_table)
            replaced: set[str] = set()
            tmp = self._tmp(name)
            staged = (
                [e for e in os.listdir(tmp) if e.startswith("bucket=")]
                if os.path.isdir(tmp)
                else []
            )
            if not append:
                # Replace mode: move staged bucket dirs wholesale.
                for entry in staged:
                    os.replace(os.path.join(tmp, entry), os.path.join(dst_table, entry))
                    replaced.add(entry)
            src_table = None if old_ver is None else os.path.join(old_ver, name)
            if carry_over and src_table and os.path.isdir(src_table):
                for entry in os.listdir(src_table):
                    if not entry.startswith("bucket=") or entry in replaced:
                        continue
                    sdir = os.path.join(src_table, entry)
                    ddir = os.path.join(dst_table, entry)
                    os.makedirs(ddir)
                    for fname in os.listdir(sdir):
                        spath = os.path.join(sdir, fname)
                        if os.path.isfile(spath):
                            os.link(spath, os.path.join(ddir, fname))
            if append:
                # Append mode: staged part files land NEXT TO the
                # carried-over links (names are job-UUID-unique).
                for entry in staged:
                    sdir = os.path.join(tmp, entry)
                    ddir = os.path.join(dst_table, entry)
                    os.makedirs(ddir, exist_ok=True)
                    for fname in os.listdir(sdir):
                        spath = os.path.join(sdir, fname)
                        if os.path.isfile(spath):
                            os.replace(spath, os.path.join(ddir, fname))
            if staged:
                shutil.rmtree(tmp, ignore_errors=True)
        meta = {"epoch": epoch_id, "version": version}
        run_id = self._run_id if self._run_id is not None else self._pointer().get("run_id")
        if run_id is not None:
            meta["run_id"] = run_id
        ptr_tmp = os.path.join(self.state_dir, f"_{_POINTER}.tmp")
        with open(ptr_tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        with self.swap_lock:
            os.replace(ptr_tmp, os.path.join(self.state_dir, _POINTER))
            # GC: keep the new current plus the _KEEP_PREDECESSORS most
            # recent predecessors (by commit mtime) for in-flight lazy
            # readers; drop anything older.
            versions = sorted(
                (
                    e
                    for e in os.listdir(self.state_dir)
                    if _VERSION_RE.fullmatch(e) and e != version
                ),
                key=lambda e: os.path.getmtime(os.path.join(self.state_dir, e)),
                reverse=True,
            )
            for entry in versions[_KEEP_PREDECESSORS:]:
                shutil.rmtree(os.path.join(self.state_dir, entry), ignore_errors=True)
