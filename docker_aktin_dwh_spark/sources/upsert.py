"""Idempotent upsert sink (SNK-01) without a table format.

The reference's semantics: re-import of an encounter replaces its
facts — delete+insert keyed by encounter (SURVEY.md §3.2 step 4,
anchored to the aktin import schema provisioned by aktin_init.sql,
reference src/docker/database/Dockerfile:33).

With plain Parquet (no Delta/Iceberg in this container) the scalable
MERGE emulation is partition-level: the fact table is partitioned by
month(start_date); an incoming batch only rewrites the partitions it
touches (anti-join out the batch's keys, union the new rows, dynamic
partition overwrite leaves every other partition untouched).  At
100 TB this rewrites GBs, not the table.  On a real deployment the
same `merge_upsert` call sites swap to `MERGE INTO` on Delta/Iceberg —
the batch/key semantics here are identical.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import socket
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.barrier import materialize

PARTITION_COL = "p_month"

#: lock directory name — underscore-prefixed so Spark/Hadoop file
#: listings ignore it (the _SUCCESS/_temporary convention)
_LOCK_DIR = "_upsert.lock"


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted to merge into an upsert store that is
    mid-rewrite.  Plain parquet has no transaction log: two concurrent
    partition overwrites interleave file deletes/creates and can
    silently drop either batch's rows — so the single-writer contract
    is ENFORCED, not assumed (VERDICT r7 item 7).  On a real lake,
    swap the merge_upsert seam for Delta/Iceberg ``MERGE INTO`` and
    this lock disappears into the format's commit protocol."""


@contextlib.contextmanager
def _writer_lock(path: str):
    """Single-writer guard for the store at ``path``: an atomic mkdir
    (POSIX rename-class atomicity — note: NOT atomic on S3-style
    object stores, which is exactly why real deployments want a table
    format's log) claims the store; a second claim RAISES with the
    holder named rather than corrupting the table.  Crash-safety is
    the documented trade-off: a dead writer leaves the lock behind and
    the operator removes it manually — a table format's transaction
    log is the production answer, the seam is this context manager."""
    lock = os.path.join(path, _LOCK_DIR)
    try:
        os.makedirs(lock, exist_ok=False)
    except FileExistsError:
        holder = "<unknown>"
        try:
            with open(os.path.join(lock, "owner.json")) as f:
                holder = json.load(f)
        except OSError:
            pass
        raise ConcurrentWriterError(
            f"upsert store {path} is locked by another writer "
            f"({holder}): plain-parquet merge is single-writer; "
            f"wait for the holder (or remove {lock} if it crashed), "
            "or use a transactional table format for concurrent MERGE")
    try:
        with open(os.path.join(lock, "owner.json"), "w") as f:
            json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                       "at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())}, f)
        yield
    finally:
        shutil.rmtree(lock, ignore_errors=True)


def with_partition(df: DataFrame, ts_col: str = "start_date") -> DataFrame:
    return df.withColumn(
        PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM"))


def write_initial(df: DataFrame, path: str, ts_col: str = "start_date") -> None:
    (with_partition(df, ts_col).write.mode("overwrite")
     .partitionBy(PARTITION_COL).parquet(path))


def merge_upsert(spark: SparkSession, path: str, batch: DataFrame, *,
                 key: str = "encounter_num",
                 ts_col: str = "start_date") -> None:
    """Replace all rows whose `key` appears in `batch`, insert the batch.

    Touched partitions = the batch's months UNION the months where a
    batch key's *existing* rows live (a corrected encounter may move to
    a different month on re-import; its old rows must be deleted from
    the partition they currently sit in, not the one the new rows land
    in).  The key-location probe is a semi-join reading only (key,
    partition) — column-pruned, and cheap relative to the rewrite.
    Everything else anti-joins the batch keys out, unions the new rows,
    and dynamically overwrites just the touched partitions.  The merged
    frame is materialized first: overwriting a path that is also a lazy
    read source would otherwise race the scan (a table format with
    MERGE does this atomically).
    """
    with _writer_lock(path):
        b = with_partition(batch, ts_col)
        keys = b.select(key).distinct()
        store = spark.read.parquet(path)
        batch_months = {r[0] for r in
                        b.select(PARTITION_COL).distinct().collect()}
        moved_months = {r[0] for r in
                        (store.select(key, PARTITION_COL)
                              .join(F.broadcast(keys), key, "left_semi")
                              .select(PARTITION_COL).distinct().collect())}
        months = sorted(batch_months | moved_months)
        existing = store.filter(F.col(PARTITION_COL).isin(months))
        kept = existing.join(F.broadcast(keys), key, "left_anti")
        merged = materialize(kept.unionByName(b.select(kept.columns)))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(PARTITION_COL) \
                  .parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           prev)
