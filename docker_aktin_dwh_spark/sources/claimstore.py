"""Object-store claim coordinator for the txnlog commit protocol.

``txnlog`` needs atomicity at exactly ONE point: publishing commit
version N if and only if no commit exists there (``set_claim_backend``
seam, sources/txnlog.py).  On POSIX, ``link(2)`` provides it; classic
object stores (S3 before conditional writes) do not — Delta Lake
solves this publicly with the *DynamoDB LogStore* design: an external
table with a conditional-put per (table, version) is the arbiter, and
the commit FILE in the log is just a replica the winner (or any later
recoverer) materializes.  This module is that design as a
production-shaped reference implementation over SQLite — a real CAS
service multiple OS processes can race through (SQLite serializes
writers across processes via file locking + WAL), with the same crash
story:

1. The writer copies its fully-written commit bytes to a DURABLE
   side file (``<target>.cas-<uuid>``) — the coordinator must never
   point at bytes that can vanish (txnlog deletes its tmp right after
   the claim call returns).
2. It then attempts the CAS: ``INSERT`` of the (target) row inside an
   IMMEDIATE transaction.  A unique-constraint failure is a LOST race
   — exactly one process ever wins a version, no matter how many race.
3. The winner publishes the side file at the target path and marks the
   row complete.  A winner that CRASHES between claim and publish
   leaves a claimed-but-unpublished row; the next writer that loses
   the claim for that version RECOVERS it — copies the registered side
   file into place and marks it complete — before retrying at the next
   version (Delta's "fix the log on read/claim" recovery).  There is
   no state in which two different payloads can ever appear at one
   version, and no crash wedges the table.

The protocol above is exercised three ways in tests/test_claimstore.py:
multi-PROCESS claim races (one winner per version across 4 OS
processes), crash-recovery (a winner killed between claim and publish
is completed by the next claimant), and full txnlog protocol
equivalence (appends/merges through the backend behave identically to
the POSIX-link default — ups_01/ups_02 oracles unchanged).

Reference anchor: the coordination need mirrors how the reference's
single Postgres instance arbitrates concurrent imports through MVCC
(docker-aktin-dwh src/docker/database — one authoritative arbiter);
here the arbiter is the CAS table, and data stays on the lake.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import sqlite3
import uuid


class SQLiteClaimBackend:
    """Conditional-put claim backend over a SQLite CAS table.

    Instances are callable with the ``(tmp, target) -> bool`` claim
    contract of :func:`txnlog.set_claim_backend`.  One connection per
    call — the object is safe to share across threads and the database
    is safe to share across processes (that is its point).

    ``busy_timeout_ms`` bounds how long a claim waits on another
    process's in-flight transaction before SQLite raises; claims are
    single-row inserts, so contention windows are microseconds.
    """

    def __init__(self, db_path: str, *, busy_timeout_ms: int = 30_000):
        self.db_path = db_path
        self.busy_timeout_ms = busy_timeout_ms
        con = self._connect()
        try:
            con.execute(
                "CREATE TABLE IF NOT EXISTS claims ("
                " target TEXT PRIMARY KEY,"      # absolute commit path
                " side   TEXT NOT NULL,"         # durable payload copy
                " complete INTEGER NOT NULL DEFAULT 0)")
            con.commit()
        finally:
            con.close()

    def _connect(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path,
                              timeout=self.busy_timeout_ms / 1000.0)
        con.execute(f"PRAGMA busy_timeout = {self.busy_timeout_ms}")
        # WAL lets readers proceed under a writer; claims stay serial
        with contextlib.suppress(sqlite3.OperationalError):
            con.execute("PRAGMA journal_mode = WAL")
        return con

    # -- the claim contract -------------------------------------------
    def __call__(self, tmp: str, target: str) -> bool:
        target = os.path.abspath(target)
        # 1. durable side copy FIRST: txnlog deletes `tmp` as soon as
        #    we return, and the coordinator row must never reference
        #    bytes that can vanish before publication.
        side = f"{target}.cas-{uuid.uuid4().hex}"
        shutil.copyfile(tmp, side)
        with open(side, "rb") as f:
            os.fsync(f.fileno())
        con = self._connect()
        try:
            con.execute("BEGIN IMMEDIATE")
            try:
                con.execute(
                    "INSERT INTO claims (target, side, complete) "
                    "VALUES (?, ?, 0)", (target, side))
            except sqlite3.IntegrityError:
                con.rollback()
                os.remove(side)
                # lost the race — but the winner may have crashed
                # between claim and publish: complete its commit so
                # the table never wedges (Delta LogStore recovery).
                self._recover(con, target)
                return False
            con.commit()
            # 2. we own the version: publish.  Copy to a dot-prefixed
            #    temp in the log dir, fsync, then os.replace — rename
            #    gives atomic VISIBILITY (a snapshot() can never list a
            #    truncated commit), while the CAS row + side file stay
            #    the recovery authority for a winner that crashes
            #    before the rename lands.
            self._publish(con, target, side)
            return True
        finally:
            con.close()

    # -- internals ------------------------------------------------------
    def _publish(self, con: sqlite3.Connection, target: str,
                 side: str) -> None:
        """Copy side → temp → atomic-rename onto target, flag
        complete, drop the side file.  The rename means a concurrent
        snapshot() either sees the complete commit bytes or no file at
        all — never a truncation — matching the POSIX backend's
        invariant (_posix_link_claim).  Publish and recovery can run
        CONCURRENTLY (a slow winner and a recovering loser): both
        stage the same immutable bytes under distinct temp names and
        os.replace is last-writer-wins over identical content; a side
        file that vanished mid-way proves the OTHER party already
        landed the target — tolerated, not an error."""
        tmp = os.path.join(
            os.path.dirname(target),
            ".%s.%d.tmp" % (os.path.basename(target), os.getpid()))
        try:
            shutil.copyfile(side, tmp)
            with open(tmp, "rb") as f:
                os.fsync(f.fileno())
            os.replace(tmp, target)
        except FileNotFoundError:
            with contextlib.suppress(OSError):
                os.remove(tmp)
            if not os.path.exists(target):
                raise               # side lost with nothing published:
                # genuinely broken (manual tampering) — surface it
        con.execute("UPDATE claims SET complete = 1 WHERE target = ?",
                    (target,))
        con.commit()
        with contextlib.suppress(OSError):
            os.remove(side)

    def _recover(self, con: sqlite3.Connection, target: str) -> None:
        """Complete a claimed-but-unpublished commit (winner crashed
        after the CAS, before the publish).  Idempotent and safe under
        concurrent recoverers: the side file is immutable, both copy
        the same bytes, and the complete flag only ever goes 0→1."""
        row = con.execute(
            "SELECT side, complete FROM claims WHERE target = ?",
            (target,)).fetchone()
        if row is None or row[1]:
            return
        self._publish(con, target, row[0])

    def recover_table(self, log_dir: str) -> list[str]:
        """Sweep RECOVERY over every incomplete claim under ``log_dir``
        — what a maintenance job (or table open hook) runs so a reader
        never waits for the next writer to repair a crashed publish.
        Returns the repaired targets."""
        prefix = os.path.abspath(log_dir) + os.sep
        con = self._connect()
        try:
            rows = con.execute(
                "SELECT target FROM claims WHERE complete = 0").fetchall()
            fixed = []
            for (target,) in rows:
                if target.startswith(prefix):
                    self._recover(con, target)
                    if os.path.exists(target):
                        fixed.append(target)
            return fixed
        finally:
            con.close()


def install(db_path: str, **kw) -> SQLiteClaimBackend:
    """Create a :class:`SQLiteClaimBackend` and install it as the
    process-wide txnlog claim backend.  Returns the backend (callers
    restore the default with ``txnlog.set_claim_backend(None)``)."""
    from . import txnlog
    backend = SQLiteClaimBackend(db_path, **kw)
    txnlog.set_claim_backend(backend)
    return backend
