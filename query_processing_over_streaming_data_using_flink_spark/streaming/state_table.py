"""Versioned bucketed state tables for foreachBatch pipelines — the
state discipline shared by the Q3 IVM (`streaming/ivm.py`) and the
streaming near-dedup (`streaming/dedup.py`).

Layout: ``state_dir/v<epoch>[c...]/<table>/bucket=N/*.parquet`` plus an
atomically-renamed ``CURRENT`` pointer file naming the live version and
its epoch. Contract (same as the IVM's, factored out):

* `write_merged` stages ONLY the buckets an epoch touched;
* `commit(epoch)` builds the next version — staged buckets moved in,
  untouched buckets carried over as hard links (metadata only, no row
  data) — then flips the pointer. A crash before the flip leaves the
  previous complete version live; redelivered epochs are detected via
  `committed_epoch()` and skipped by the caller, so replay is
  exactly-once.
* `compact(filters)` rewrites tables dropping dead rows (carry-over
  disabled so emptied buckets vanish), preserving the epoch id.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"v-?\d+c*")
_POINTER = "CURRENT"


class VersionedBucketedState:
    """Crash-atomic, hard-link-versioned, bucket-partitioned parquet
    state tables. `tables` maps table name -> DDL schema string whose
    first column is ``bucket int`` (the partition column)."""

    def __init__(self, spark: SparkSession, state_dir: str, tables: dict[str, str]) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.tables = dict(tables)
        # REENTRANT: read() takes it internally; external emission
        # timers may already hold it around a read.
        self.swap_lock = threading.RLock()
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer -------------------------------------------------------------

    def _current(self) -> tuple[int, str | None]:
        try:
            with open(os.path.join(self.state_dir, _POINTER)) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            return -1, None
        return meta["epoch"], os.path.join(self.state_dir, meta["version"])

    def committed_epoch(self) -> int:
        return self._current()[0]

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
        # subdirs (an epoch that touched nothing) — inference would fail.
        return self.spark.read.schema(self.tables[name]).parquet(path)

    def restrict(self, state: DataFrame, touched: DataFrame) -> DataFrame:
        """State rows in the buckets `touched` names (semi-join on the
        partition column → dynamic partition pruning skips the rest)."""
        return state.join(
            F.broadcast(touched.select("bucket").distinct()), "bucket", "semi"
        )

    def write_merged(self, name: str, merged: DataFrame) -> None:
        """Stage an epoch's merged contents for `name` — ONLY the
        touched buckets need be present."""
        merged.write.partitionBy("bucket").mode("overwrite").parquet(self._tmp(name))

    # -- commit --------------------------------------------------------------

    def commit(self, epoch_id: int) -> None:
        self._commit_version(f"v{epoch_id}", epoch_id, carry_over=True)

    def compact(self, keep_predicates: dict[str, F.Column]) -> None:
        """Rewrite tables keeping only rows matching their predicate;
        emptied buckets vanish (no carry-over). Epoch id preserved."""
        committed, ver = self._current()
        if ver is None:
            return
        for name in self.tables:
            pred = keep_predicates.get(name)
            df = self.read(name)
            self.write_merged(name, df.filter(pred) if pred is not None else df)
        self._commit_version(os.path.basename(ver) + "c", committed, carry_over=False)

    def _commit_version(self, version: str, epoch_id: int, carry_over: bool) -> None:
        old_epoch, old_ver = self._current()
        new_ver = os.path.join(self.state_dir, version)
        # Debris from a crashed attempt at this same version.
        shutil.rmtree(new_ver, ignore_errors=True)
        for name in self.tables:
            dst_table = os.path.join(new_ver, name)
            os.makedirs(dst_table)
            touched: set[str] = set()
            tmp = self._tmp(name)
            if os.path.isdir(tmp):
                for entry in os.listdir(tmp):
                    if entry.startswith("bucket="):
                        os.replace(os.path.join(tmp, entry), os.path.join(dst_table, entry))
                        touched.add(entry)
                shutil.rmtree(tmp, ignore_errors=True)
            src_table = None if old_ver is None else os.path.join(old_ver, name)
            if carry_over and src_table and os.path.isdir(src_table):
                for entry in os.listdir(src_table):
                    if not entry.startswith("bucket=") or entry in touched:
                        continue
                    sdir = os.path.join(src_table, entry)
                    ddir = os.path.join(dst_table, entry)
                    os.makedirs(ddir)
                    for fname in os.listdir(sdir):
                        spath = os.path.join(sdir, fname)
                        if os.path.isfile(spath):
                            os.link(spath, os.path.join(ddir, fname))
        ptr_tmp = os.path.join(self.state_dir, f"_{_POINTER}.tmp")
        with open(ptr_tmp, "w") as fh:
            json.dump({"epoch": epoch_id, "version": version}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        with self.swap_lock:
            os.replace(ptr_tmp, os.path.join(self.state_dir, _POINTER))
            # GC: keep the new current and its predecessor (in-flight
            # lazy readers), drop anything older.
            keep = {version}
            if old_ver is not None:
                keep.add(os.path.basename(old_ver))
            for entry in os.listdir(self.state_dir):
                if _VERSION_RE.fullmatch(entry) and entry not in keep:
                    shutil.rmtree(os.path.join(self.state_dir, entry), ignore_errors=True)
