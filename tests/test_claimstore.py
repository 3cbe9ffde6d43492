"""SQLite CAS claim coordinator (sources/claimstore.py): the
object-store arbitration seam under REAL OS-process concurrency —
multi-process claim races (exactly one winner per version), the
crash-between-claim-and-publish recovery story, the maintenance
recovery sweep, and full txnlog protocol equivalence with the POSIX
default."""

from __future__ import annotations

import json
import os
import sqlite3
import uuid

import pytest
from pyspark.sql import functions as F

from docker_aktin_dwh_spark.sources import claimstore, txnlog


def _mk(spark, lo, hi, tag="a"):
    return (spark.range(lo, hi).coalesce(2).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("v")))


# --------------------------------------------------------- process race
def _race_worker(args):
    """One OS process: race to claim versions 1..n_versions on the
    shared log dir through the shared SQLite coordinator.  Returns the
    version numbers THIS process won.  Module-level for pickling."""
    db, log_dir, worker_id, n_versions = args
    backend = claimstore.SQLiteClaimBackend(db)
    wins = []
    for v in range(1, n_versions + 1):
        target = os.path.join(log_dir, f"{v:020d}.json")
        tmp = os.path.join(log_dir, f".commit-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": v, "winner": worker_id}, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            if backend(tmp, target):
                wins.append(v)
        finally:
            os.remove(tmp)
    return wins


def test_multiprocess_claim_race_one_winner_per_version(tmp_path):
    """4 separate OS processes race the SAME 20 versions through the
    SQLite CAS: every version is won by EXACTLY one process, the
    published file's content names that winner (no torn or swapped
    payloads), and the winner sets are a disjoint partition of the
    version range — the property the POSIX link(2) default provides,
    now provided off-POSIX by the coordinator."""
    from concurrent.futures import ProcessPoolExecutor

    log_dir = str(tmp_path / "_txnlog")
    os.makedirs(log_dir)
    db = str(tmp_path / "cas.db")
    claimstore.SQLiteClaimBackend(db)          # create schema up front
    n_workers, n_versions = 4, 20
    with ProcessPoolExecutor(max_workers=n_workers) as ex:
        results = list(ex.map(
            _race_worker,
            [(db, log_dir, w, n_versions) for w in range(n_workers)]))

    all_wins = [v for wins in results for v in wins]
    assert sorted(all_wins) == list(range(1, n_versions + 1)), (
        "every version must be won exactly once across processes")
    # the published payload agrees with the winner bookkeeping
    won_by = {v: w for w, wins in enumerate(results) for v in wins}
    for v in range(1, n_versions + 1):
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            c = json.load(f)
        assert c == {"version": v, "winner": won_by[v]}
    # coordinator state: every claim complete, no leftover side files
    con = sqlite3.connect(db)
    assert con.execute(
        "SELECT count(*) FROM claims WHERE complete = 0").fetchone()[0] == 0
    con.close()
    assert not [n for n in os.listdir(log_dir) if ".cas-" in n]


# ------------------------------------------------------ crash recovery
def test_crashed_winner_is_completed_by_next_claimant(tmp_path):
    """A winner that dies between the CAS and the publish leaves a
    claimed-but-unpublished row + its durable side file.  The NEXT
    process that loses the claim for that version must complete the
    crashed publish (the crashed winner's bytes, not its own) — the
    Delta LogStore recovery rule that keeps the table from wedging."""
    log_dir = str(tmp_path / "_txnlog")
    os.makedirs(log_dir)
    db = str(tmp_path / "cas.db")
    backend = claimstore.SQLiteClaimBackend(db)
    target = os.path.join(log_dir, f"{7:020d}.json")

    # simulate the crash: claim row + side file exist, target does not
    side = f"{target}.cas-{uuid.uuid4().hex}"
    with open(side, "w") as f:
        json.dump({"version": 7, "winner": "crashed"}, f)
    con = sqlite3.connect(db)
    con.execute("INSERT INTO claims (target, side, complete) "
                "VALUES (?, ?, 0)", (os.path.abspath(target), side))
    con.commit()
    con.close()

    # next writer races the same version: loses AND repairs
    tmp = os.path.join(log_dir, ".commit-loser")
    with open(tmp, "w") as f:
        json.dump({"version": 7, "winner": "loser"}, f)
    assert backend(tmp, target) is False
    with open(target) as f:
        assert json.load(f)["winner"] == "crashed", (
            "recovery must publish the CRASHED WINNER's bytes")
    con = sqlite3.connect(db)
    assert con.execute("SELECT complete FROM claims WHERE target = ?",
                       (os.path.abspath(target),)).fetchone()[0] == 1
    con.close()


def test_publish_is_atomically_visible(tmp_path, monkeypatch):
    """ADVICE r11: _publish used to copy the side file DIRECTLY onto
    the commit target, so a concurrent snapshot() could list and
    json.load a half-written commit, and a winner crashing mid-copy
    left a truncated committed version wedging every reader.  Publish
    now stages to a dot-prefixed temp + fsync + os.replace: the
    target either does not exist or holds the complete bytes — never
    a truncation.  Simulated crash mid-copy: the target must be
    ABSENT (not torn), the claim stays incomplete, and the normal
    recovery path repairs it from the side file."""
    import shutil

    log_dir = str(tmp_path / "_txnlog")
    os.makedirs(log_dir)
    db = str(tmp_path / "cas.db")
    backend = claimstore.SQLiteClaimBackend(db)
    target = os.path.join(log_dir, f"{3:020d}.json")
    payload = {"version": 3, "winner": "w", "pad": "x" * 4096}

    real_copy = shutil.copyfile
    state = {"crashes": 1}

    def torn_copy(src, dst):
        # crash only the PUBLISH copy (dot-prefixed temp target), not
        # the side-file copy claim() does first — the crash must land
        # after the CAS row exists, mid-publish
        if state["crashes"] and os.path.basename(dst).startswith("."):
            state["crashes"] -= 1
            with open(src, "rb") as f, open(dst, "wb") as g:
                g.write(f.read()[:17])      # half-written temp...
            raise OSError("simulated crash mid-copy")
        return real_copy(src, dst)

    monkeypatch.setattr(claimstore.shutil, "copyfile", torn_copy)
    tmp = os.path.join(log_dir, ".commit-w")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    with pytest.raises(OSError, match="simulated crash"):
        backend(tmp, target)
    # the invariant: NO truncated target is ever visible
    assert not os.path.exists(target), (
        "a torn publish must never surface at the commit name")
    # nothing a log reader would pick up: side files don't end in
    # .json and temp debris is dot-prefixed (both invisible to the
    # replay filter `endswith('.json') and not startswith('.')`)
    visible = [n for n in os.listdir(log_dir)
               if n.endswith(".json") and not n.startswith(".")]
    assert visible == [], "no reader-visible commit name allowed"
    # the claim row + side file remain the recovery authority
    fixed = backend.recover_table(log_dir)
    assert fixed == [os.path.abspath(target)]
    with open(target) as f:
        assert json.load(f) == payload
    os.remove(tmp)


def test_recover_table_sweep(tmp_path):
    """recover_table: the maintenance sweep completes EVERY incomplete
    claim under the table's log dir without waiting for the next
    writer, and ignores claims of other tables in the same db."""
    log_a = str(tmp_path / "a" / "_txnlog")
    log_b = str(tmp_path / "b" / "_txnlog")
    os.makedirs(log_a)
    os.makedirs(log_b)
    db = str(tmp_path / "cas.db")
    backend = claimstore.SQLiteClaimBackend(db)
    con = sqlite3.connect(db)
    planted = []
    for log_dir, v in ((log_a, 3), (log_a, 4), (log_b, 3)):
        target = os.path.abspath(os.path.join(log_dir, f"{v:020d}.json"))
        side = f"{target}.cas-x{v}"
        with open(side, "w") as f:
            json.dump({"v": v, "dir": log_dir}, f)
        con.execute("INSERT INTO claims (target, side, complete) "
                    "VALUES (?, ?, 0)", (target, side))
        planted.append(target)
    con.commit()
    con.close()

    fixed = backend.recover_table(log_a)
    assert sorted(fixed) == sorted(planted[:2])
    assert all(os.path.exists(t) for t in planted[:2])
    assert not os.path.exists(planted[2]), "other table untouched"
    # idempotent: a second sweep finds nothing incomplete for log_a
    assert backend.recover_table(log_a) == []


# ------------------------------------------- full protocol equivalence
def test_txnlog_protocol_through_sqlite_backend(spark, tmp_path):
    """The full commit protocol driven through the SQLite coordinator
    (install()): racing appends both land at distinct versions, MERGE
    rewrites only interval-hit files, snapshot isolation and time
    travel hold — byte-for-byte the behavior of the POSIX link
    default.  SERIAL test (the backend is process-global)."""
    import threading as _th

    tdir = str(tmp_path / "tbl")
    backend = claimstore.install(str(tmp_path / "cas.db"))
    try:
        txnlog.create_table(spark, _mk(spark, 0, 100)
                            .repartitionByRange(2, "k"), tdir, key="k")
        errs = []

        def add(lo, hi):
            try:
                txnlog.append(spark, _mk(spark, lo, hi), tdir, key="k")
            except Exception as e:          # pragma: no cover
                errs.append(e)

        ts = [_th.Thread(target=add, args=(100, 130)),
              _th.Thread(target=add, args=(200, 230))]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        v_pre = txnlog.snapshot(tdir).version
        assert v_pre == 2
        before = set(txnlog.snapshot(tdir).files)
        txnlog.merge(spark, tdir, _mk(spark, 0, 10, tag="m"), key="k")
        after = txnlog.snapshot(tdir)
        assert len(before & set(after.files)) >= 1, "data skipping holds"
        got = {r.k: r.v for r in txnlog.read_table(spark, tdir).collect()}
        assert len(got) == 160 and got[5] == "m5" and got[205] == "a205"
        # time travel below the merge still sees the pre-merge rows
        old = txnlog.read_table(spark, tdir, version=v_pre)
        assert {r.v for r in old.filter("k = 5").collect()} == {"a5"}
        assert backend.recover_table(os.path.join(tdir, "_txnlog")) == []
    finally:
        txnlog.set_claim_backend(None)


def test_snapshot_repairs_crashed_publish_on_read(spark, tmp_path):
    """Read-side repair (r12, Delta's fix-the-log-on-read): with the
    coordinator installed, a commit whose winner crashed between claim
    and publish is completed by the very next snapshot()/read_table —
    no writer involvement.  SERIAL (module-global backend seam)."""
    from docker_aktin_dwh_spark.sources import txnlog

    tdir = str(tmp_path / "tbl")
    db = str(tmp_path / "cas.db")
    backend = claimstore.SQLiteClaimBackend(db)
    txnlog.set_claim_backend(backend)
    try:
        df = spark.range(0, 20).selectExpr("id AS k",
                                           "CAST(id AS STRING) AS v")
        txnlog.create_table(spark, df, tdir, key="k")          # v0
        # plant a crashed v1: claimed in the CAS, side file durable,
        # never published (exactly the state after a SIGKILL between
        # claim and publish — tests/test_claimstore + the bench lane
        # exercise the real kill; here the state is constructed so the
        # READ path's behavior is isolated)
        log = os.path.join(tdir, "_txnlog")
        target = os.path.abspath(os.path.join(log, f"{1:020d}.json"))
        side = f"{target}.cas-crashed"
        snap0 = txnlog.snapshot(tdir)
        add_name = "p-crashed.parquet"
        import shutil as _sh
        donor = sorted(snap0.files)[0]
        _sh.copyfile(os.path.join(tdir, donor),
                     os.path.join(tdir, add_name))
        import pyarrow.parquet as _pq
        rows = _pq.ParquetFile(os.path.join(tdir, add_name)) \
                  .metadata.num_rows
        with open(side, "w") as f:
            json.dump({"version": 1, "op": "append",
                       "add": [{"file": add_name, "rows": rows,
                                "kmin": None, "kmax": None,
                                "cols": {}}],
                       "remove": []}, f)
        con = sqlite3.connect(db)
        con.execute("INSERT INTO claims (target, side, complete) "
                    "VALUES (?, ?, 0)", (target, side))
        con.commit()
        con.close()
        assert not os.path.exists(target)
        # the read repairs: v1 becomes visible without any writer
        snap = txnlog.snapshot(tdir)
        assert snap.version == 1
        assert os.path.exists(target)
        assert txnlog.read_table(spark, tdir).count() == 20 + rows
    finally:
        txnlog.set_claim_backend(None)
