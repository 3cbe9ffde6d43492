"""Pipeline tests (SURVEY.md §5.2 item 4): ingest idempotency, XML
shred round-trip, P21 zip-string semantics, broker polling."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog
from docker_aktin_dwh_spark.sources import p21_csv, upsert, xml_cda
from docker_aktin_dwh_spark.streaming import broker


@pytest.fixture(scope="module")
def fact(spark):
    # computed once and pinned in block storage: the upsert tests read
    # this frame's lineage many times over
    return catalog.observation_fact(spark, SF_SMOKE).localCheckpoint()


@pytest.mark.parametrize("fmt", ["txnlog", "parquet"])
def test_merge_upsert_idempotent(spark, fact, tmp_path, fmt):
    """SNK-01: importing the same batch twice leaves the table
    unchanged — on BOTH storage layouts: the txnlog default (r10) and
    the legacy month-partitioned fallback.  merge_upsert dispatches on
    the store's own layout.  A 300-encounter slice carries the full
    semantics (batch keys < 100, multiple months) at a fraction of
    the four-merge wall time."""
    fact = fact.filter(F.col("encounter_num") < 300).localCheckpoint()
    table = str(tmp_path / "fact")
    upsert.write_initial(fact, table, format=fmt)
    assert upsert.is_txnlog_store(table) == (fmt == "txnlog")
    before = upsert.read_store(spark, table).count()
    assert before == fact.count()

    batch = fact.filter(F.col("encounter_num") < 100)
    upsert.merge_upsert(spark, table, batch)
    after1 = upsert.read_store(spark, table).count()
    upsert.merge_upsert(spark, table, batch)
    after2 = upsert.read_store(spark, table).count()
    assert before == after1 == after2

    # and an updated batch actually replaces (not appends)
    updated = batch.withColumn("tval_char", F.lit("UPDATED"))
    upsert.merge_upsert(spark, table, updated)
    got = upsert.read_store(spark, table)
    assert got.count() == before
    assert (got.filter(F.col("encounter_num") < 100)
               .filter(F.col("tval_char") != "UPDATED")
               .filter(F.col("tval_char").isNotNull()).count() == 0)


def test_merge_upsert_single_writer_lock(spark, fact, tmp_path):
    """The enforced single-writer contract (VERDICT r7 item 7): while
    one writer holds the store lock, a second merge RAISES with the
    holder named instead of interleaving partition overwrites; the
    lock is released after a successful merge (and names the pid in
    the error) — the seam a transactional table format replaces."""
    import os

    import pytest as _pytest

    table = str(tmp_path / "fact")
    upsert.write_initial(fact, table, format="parquet")  # lock = legacy path
    batch = fact.filter(F.col("encounter_num") < 100)

    # simulate a concurrent writer holding the lock
    with upsert._writer_lock(table):
        with _pytest.raises(upsert.ConcurrentWriterError,
                            match="locked by another writer"):
            upsert.merge_upsert(spark, table, batch)
    # holder released: merge proceeds and removes its own lock after
    upsert.merge_upsert(spark, table, batch)
    assert not os.path.exists(os.path.join(table, upsert._LOCK_DIR))
    assert spark.read.parquet(table).count() == fact.count()


def test_writer_lock_lease_expiry_breaks_crashed_holder(tmp_path):
    """A crashed writer (lock dir present, heartbeat older than the
    lease) is USURPED: the next writer breaks the stale lock and
    claims it (VERDICT r8 item 3 — stale locks no longer need manual
    cleanup).  A FRESH heartbeat still blocks (live holder is never
    usurped), and a truncated owner.json (the claim/json.dump race,
    ADVICE r8) raises ConcurrentWriterError — not JSONDecodeError."""
    import os
    import time as _time

    import pytest as _pytest

    table = str(tmp_path / "store")
    os.makedirs(table)
    lock = os.path.join(table, upsert._LOCK_DIR)

    # crashed holder: stale heartbeat -> lock broken, claim succeeds
    os.makedirs(lock)
    hb = os.path.join(lock, upsert._HEARTBEAT)
    with open(hb, "w") as f:
        f.write("0")
    old = _time.time() - 10_000
    os.utime(hb, (old, old))
    with upsert._writer_lock(table, lease=60):
        assert os.path.exists(os.path.join(lock, "owner.json"))
    assert not os.path.exists(lock)

    # live holder: fresh heartbeat -> still refused
    os.makedirs(lock)
    with open(os.path.join(lock, upsert._HEARTBEAT), "w") as f:
        f.write(str(_time.time()))
    with open(os.path.join(lock, "owner.json"), "w") as f:
        f.write('{"pid": 1,')          # truncated mid-write
    with _pytest.raises(upsert.ConcurrentWriterError,
                        match="locked by another writer"):
        with upsert._writer_lock(table, lease=60):
            pass
    import shutil as _sh
    _sh.rmtree(lock)


def test_writer_lock_failed_merge_leaves_marked_lock(tmp_path):
    """A merge body that RAISES leaves the lock in place with a
    ``failed`` marker (the store may be half-rewritten); subsequent
    writers get FailedMergeError until the operator removes the lock
    (ADVICE r8 — the old finally-rmtree unlocked a possibly corrupt
    store)."""
    import os

    import pytest as _pytest

    table = str(tmp_path / "store")
    os.makedirs(table)
    lock = os.path.join(table, upsert._LOCK_DIR)

    with _pytest.raises(RuntimeError, match="boom"):
        with upsert._writer_lock(table, lease=60):
            raise RuntimeError("boom")
    assert os.path.exists(os.path.join(lock, upsert._FAILED))

    with _pytest.raises(upsert.FailedMergeError, match="FAILED previous"):
        with upsert._writer_lock(table, lease=60):
            pass

    # operator repaired the store and removed the lock: writers resume
    import shutil as _sh
    _sh.rmtree(lock)
    with upsert._writer_lock(table, lease=60):
        pass
    assert not os.path.exists(lock)


def test_writer_lock_fencing_token_blocks_usurped_holder(tmp_path):
    """ADVICE r9: a holder stalled past its lease and USURPED (a
    contender rewrote owner.json with its own acquisition token) must
    not clean up on exit — rmtree would delete the NEW holder's lock
    and invite a third writer — nor write a failed marker into it.
    The stalled holder raises UsurpedLockError; the usurper's lock
    survives byte-intact."""
    import json as _json
    import os

    import pytest as _pytest

    table = str(tmp_path / "store")
    os.makedirs(table)
    lock = os.path.join(table, upsert._LOCK_DIR)

    with _pytest.raises(upsert.UsurpedLockError, match="broken mid-merge"):
        with upsert._writer_lock(table, lease=60):
            # simulate the usurpation mid-body: the contender broke
            # the lease and wrote ITS owner.json (fresh token)
            with open(os.path.join(lock, "owner.json"), "w") as f:
                f.write('{"pid": 999, "token": "usurper-token"}')
    assert os.path.isdir(lock), "usurper's lock must survive"
    assert not os.path.exists(os.path.join(lock, upsert._FAILED))
    with open(os.path.join(lock, "owner.json")) as f:
        assert _json.load(f)["token"] == "usurper-token"

    # a RAISING body under usurpation also leaves the new lock clean
    import shutil as _sh
    _sh.rmtree(lock)
    with _pytest.raises(RuntimeError, match="boom"):
        with upsert._writer_lock(table, lease=60):
            with open(os.path.join(lock, "owner.json"), "w") as f:
                f.write('{"pid": 999, "token": "usurper-token"}')
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(lock, upsert._FAILED)), (
        "failed marker belongs to the holder, never the usurper's lock")


def test_grab_release_is_atomic_wrt_usurpers(tmp_path):
    """ADVICE r10: the release path used to check _owns(lock, token)
    and THEN rmtree — a contender breaking the lease in that window
    had its fresh lock dir deleted (the third-writer hazard again).
    _grab_release renames the dir aside FIRST (atomic grab), verifies
    the token on the grabbed dir, and either deletes (ours) or renames
    back intact (a usurper's live lock)."""
    import json as _json
    import os

    lock = str(tmp_path / upsert._LOCK_DIR)

    # arm 1: our own lock -> released, True
    os.makedirs(lock)
    with open(os.path.join(lock, "owner.json"), "w") as f:
        _json.dump({"token": "tok-A"}, f)
    assert upsert._grab_release(lock, "tok-A") is True
    assert not os.path.exists(lock)

    # arm 2: a usurper's lock -> handed back byte-intact, False
    os.makedirs(lock)
    with open(os.path.join(lock, "owner.json"), "w") as f:
        _json.dump({"token": "usurper"}, f)
    with open(os.path.join(lock, upsert._HEARTBEAT), "w") as f:
        f.write("123")
    assert upsert._grab_release(lock, "tok-A") is False
    assert os.path.isdir(lock), "usurper's lock must be restored"
    with open(os.path.join(lock, "owner.json")) as f:
        assert _json.load(f)["token"] == "usurper"
    assert os.path.exists(os.path.join(lock, upsert._HEARTBEAT))

    # arm 3: lock vanished entirely -> False, no crash
    import shutil as _sh
    _sh.rmtree(lock)
    assert upsert._grab_release(lock, "tok-A") is False


def test_merge_upsert_touches_only_batch_partitions(spark, fact, tmp_path):
    table = str(tmp_path / "fact")
    upsert.write_initial(fact, table, format="parquet")  # layout-specific
    files_before = {str(p.relative_to(table))
                    for p in Path(table).glob("p_month=*/*.parquet")}
    one_enc = fact.filter(F.col("encounter_num") == 1)
    months = {r[0] for r in upsert.with_partition(one_enc)
              .select("p_month").distinct().collect()}
    upsert.merge_upsert(spark, table, one_enc)
    files_after = {str(p.relative_to(table))
                   for p in Path(table).glob("p_month=*/*.parquet")}
    # data files have UUID names: a rewritten partition gets new names,
    # an untouched one keeps its files verbatim
    untouched_before = {f for f in files_before
                        if f.split("=")[1].split("/")[0] not in months}
    assert untouched_before, "expected untouched partitions to exist"
    assert untouched_before <= files_after
    rewritten = {f for f in files_before
                 if f.split("=")[1].split("/")[0] in months}
    assert rewritten and not (rewritten & files_after)


def test_xml_shred_roundtrip(spark, fact, tmp_path):
    """SRC-03/UDF-03: encounter XML → fact rows matches the source rows."""
    sample = (fact.filter(F.col("encounter_num") < 20)
                  .select("encounter_num", "patient_num", "concept_cd",
                          "start_date", "valtype_cd", "tval_char",
                          "nval_num", "units_cd"))
    rows = sample.collect()
    by_enc: dict[tuple[int, int], list[dict]] = {}
    for r in rows:
        obs = {"code": r.concept_cd,
               "ts": r.start_date.isoformat(),
               "valtype": r.valtype_cd,
               "value": (str(r.nval_num) if r.valtype_cd == "N"
                         else r.tval_char),
               "unit": r.units_cd}
        by_enc.setdefault((r.encounter_num, r.patient_num), []).append(obs)
    xml_dir = tmp_path / "cda"
    xml_dir.mkdir()
    for (enc, pat), obs in by_enc.items():
        (xml_dir / f"enc{enc}.xml").write_text(
            xml_cda.render_encounter_xml(enc, pat, obs))

    shredded = xml_cda.read_and_shred(spark, str(xml_dir))
    assert shredded.count() == len(rows)
    src = {(r.encounter_num, r.concept_cd, r.start_date,
            float(r.nval_num) if r.nval_num is not None else None)
           for r in rows}
    got = {(r.encounter_num, r.concept_cd, r.start_date, r.nval_num)
           for r in shredded.collect()}
    assert src == got


def test_p21_csv_zip_leading_zeros(spark, tmp_path):
    """SRC-04: PLZ round-trips as string (update01 semantics)."""
    csv = tmp_path / "p21.csv"
    csv.write_text(
        "encounter_id;admission_ts;discharge_ts;zip;age\n"
        "1;2024-01-01T10:00:00;2024-01-01T16:30:00;01067;34\n"
        "2;2024-01-02T08:15:00;2024-01-03T09:15:00;00123;71\n")
    df = p21_csv.read_p21(spark, str(csv))
    rows = {r.encounter_num: r for r in
            p21_csv.p21_to_visits(df).collect()}
    assert rows[1].zip_cd == "01067"
    assert rows[2].zip_cd == "00123"
    assert rows[1].los_hours == 6.5
    assert rows[2].los_hours == 25.0


def test_p21_zip_archive_extract(spark, tmp_path):
    import zipfile
    src = tmp_path / "drop"
    work = tmp_path / "work"
    src.mkdir()
    content = ("encounter_id;admission_ts;discharge_ts;zip;age\n"
               "7;2024-02-01T00:00:00;2024-02-01T04:00:00;04109;50\n")
    with zipfile.ZipFile(src / "batch1.zip", "w") as zf:
        zf.writestr("batch1.csv", content)
    files = p21_csv.extract_zip_archives(str(src), str(work))
    assert len(files) == 1
    df = p21_csv.read_p21(spark, files[0])
    assert df.collect()[0].zip == "04109"


def test_broker_poll_executes_requests(spark, tmp_path):
    """SRC-05/SNK-03: request pickup → local execution → JSON export +
    bookkeeping, including a failed request."""
    inbox = str(tmp_path / "inbox")
    outbox = str(tmp_path / "outbox")
    broker.submit_request(inbox, "req1", "agg_01", SF_SMOKE)
    broker.submit_request(inbox, "req2", "no_such_query", SF_SMOKE)
    statuses = {s["request_id"]: s
                for s in broker.poll_once(spark, inbox, outbox)}
    assert statuses["req1"]["state"] == "completed"
    assert statuses["req2"]["state"] == "failed"
    exported = json.loads((Path(outbox) / "req1.json").read_text())
    assert len(exported) == 3  # o_orderstatus groups
    # second tick: nothing new → no duplicate execution (replayable offsets)
    assert broker.poll_once(spark, inbox, outbox) == []


def test_sky01_tie_and_dominance_semantics(spark):
    """Equal (price, size) points never dominate each other — BOTH
    survive; a point strictly worse on one axis and equal on the
    other is dominated; the frontier is strictly monotone."""
    from docker_aktin_dwh_spark.operators import relational as R
    from pyspark.sql import functions as F

    rows = [  # (partkey, price, size)
        (1, 10.0, 5), (2, 10.0, 5),     # tied frontier pair: both kept
        (3, 10.0, 4),                   # same price, smaller size: out
        (4, 12.0, 5),                   # pricier, same size: out
        (5, 12.0, 7),                   # pricier but bigger: kept
        (6, 9.0, 2),                    # cheapest: kept
    ]
    df = spark.createDataFrame(
        rows, "p_partkey int, p_retailprice double, p_size int"
    ).withColumn("p_brand", F.lit("B"))
    orig_load = R.T
    try:
        R.T = lambda spark_, sf_, name: df     # only 'part' is read
        got = {r.p_partkey for r in R.sky_01(spark, "ignored").collect()}
    finally:
        R.T = orig_load
    assert got == {1, 2, 5, 6}


def test_mba01_lift_ranks_exclusive_pair_over_common_pair(spark):
    """A pair that ONLY ever co-occurs (3 baskets, each part in 3
    orders total) must outrank a pair of corpus-wide common parts
    that co-occur just as often — lift is the ranking, support only
    the floor.  Also pins the basket pair explosion: a 3-part basket
    yields all 3 ordered pairs, and p1 < p2 always."""
    from docker_aktin_dwh_spark.operators import relational as R

    rows = []
    # exclusive pair (101, 102): 3 shared orders, nothing else
    for o in (1, 2, 3):
        rows += [(o, 101), (o, 102)]
    # common parts 201/202: in 12 orders each, co-occur in 3
    for o in range(10, 22):
        rows += [(o, 201)]
    for o in range(19, 31):
        rows += [(o, 202)]
    # one 3-part basket to pin the pair explosion
    rows += [(40, 301), (40, 302), (40, 303)]
    # filler orders so N is meaningful
    rows += [(o, 400 + o) for o in range(50, 60)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    orig = R.T
    try:
        R.T = lambda spark_, sf_, name: df
        got = R.mba_01(spark, "ignored").collect()
    finally:
        R.T = orig
    assert all(r.p1 < r.p2 for r in got)
    by_pair = {(r.p1, r.p2): r for r in got}
    assert (101, 102) in by_pair and (201, 202) in by_pair
    assert by_pair[(101, 102)].lift_s > by_pair[(201, 202)].lift_s
    assert by_pair[(101, 102)].sup == by_pair[(201, 202)].sup == 3
    # the 3-part basket contributed C(3,2) pairs but sup=1 < floor
    assert (301, 302) not in by_pair


def test_ntile_closed_form_matches_native_ntile(spark):
    """rfm_01's closed-form NTILE over a distributed rank must equal
    Spark's native ntile window for every n mod k residue (bucket
    sizes differ by one, extras go to the FIRST buckets)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from docker_aktin_dwh_spark.operators.relational import \
        _ntile_from_rank

    for n in (8, 9, 10, 11, 4, 5):
        df = (spark.range(1, n + 1)
              .select(F.col("id").alias("rnk"), F.lit(n).alias("n")))
        got = df.select(
            "rnk", _ntile_from_rank("rnk", "n", 4).alias("b"))
        nat = df.select(
            "rnk",
            F.ntile(4).over(Window.orderBy("rnk")).alias("b"))
        assert ({(r.rnk, r.b) for r in got.collect()}
                == {(r.rnk, r.b) for r in nat.collect()}), f"n={n}"
