"""SRC-01 JDBC compat path (catalog.parse_jdbc_spec / jdbc_reader /
load dispatch) + the SQL-script statement splitter.

No JDBC driver jar ships in this environment, so option plumbing is
verified against a fake reader; the real-driver test is skip-marked on
``SPARK_GRAFT_JDBC_URL`` (set it to e.g.
``jdbc:postgresql://host:5432/db?user=u&password=p`` where a driver jar
is on the Spark classpath to exercise it).
Reference anchor: src/docker/database/Dockerfile:8 (the reference's
engine is stock PostgreSQL 14 — SURVEY.md §2.1 SRC-01 compat).
"""

from __future__ import annotations

import os

import pytest

from docker_aktin_dwh_spark import catalog


class _FakeReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.loaded = False

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return self


class _FakeSpark:
    def __init__(self):
        self.read = _FakeReader()


SPEC = ("jdbc:postgresql://dwh-host:5432/i2b2"
        "?user=i2b2crcdata&password=p%40ss&fetchsize=5000")


def test_parse_jdbc_spec_splits_url_and_options():
    url, opts = catalog.parse_jdbc_spec(SPEC)
    assert url == "jdbc:postgresql://dwh-host:5432/i2b2"
    assert opts["user"] == "i2b2crcdata"
    assert opts["password"] == "p@ss"          # percent-decoded
    assert opts["fetchsize"] == "5000"         # override beats default
    assert opts["pushDownPredicate"] == "true"  # default preserved


def test_parse_jdbc_spec_defaults_without_query():
    url, opts = catalog.parse_jdbc_spec("jdbc:postgresql://h/db")
    assert url == "jdbc:postgresql://h/db"
    assert opts == dict(catalog.JDBC_DEFAULT_OPTIONS)


def test_parse_jdbc_spec_rejects_non_jdbc():
    with pytest.raises(ValueError, match="not a jdbc spec"):
        catalog.parse_jdbc_spec("/root/testdata/sf0.01")


def test_parse_jdbc_spec_partition_keys_all_or_nothing():
    with pytest.raises(ValueError, match="partitioned jdbc read"):
        catalog.parse_jdbc_spec("jdbc:postgresql://h/db?partitionColumn=id")
    url, opts = catalog.parse_jdbc_spec(
        "jdbc:postgresql://h/db?partitionColumn=encounter_num"
        "&lowerBound=0&upperBound=1000000&numPartitions=64")
    assert [opts[k] for k in catalog.JDBC_PARTITION_KEYS] == [
        "encounter_num", "0", "1000000", "64"]


def test_jdbc_reader_plumbs_options():
    fake = _FakeSpark()
    reader = catalog.jdbc_reader(fake, SPEC, "observation_fact")
    assert reader is fake.read
    assert reader.fmt == "jdbc"
    assert reader.opts["url"] == "jdbc:postgresql://dwh-host:5432/i2b2"
    assert reader.opts["dbtable"] == "observation_fact"
    assert reader.opts["user"] == "i2b2crcdata"
    assert reader.opts["fetchsize"] == "5000"
    assert not reader.loaded


def test_load_dispatches_jdbc_spec():
    fake = _FakeSpark()
    out = catalog.load(fake, SPEC, "orders")
    assert out is fake.read and out.loaded
    assert out.opts["dbtable"] == "orders"


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_JDBC_URL"),
                    reason="no JDBC driver jar / database in this "
                           "environment; set SPARK_GRAFT_JDBC_URL")
def test_jdbc_integration_real_driver(spark):
    df = catalog.load(spark, os.environ["SPARK_GRAFT_JDBC_URL"], "orders")
    assert df.limit(1).count() >= 0


# ---------------------------------------------------------------------------
# _split_sql — SRC-02 splitter contract
# ---------------------------------------------------------------------------

def test_split_sql_plain():
    assert catalog._split_sql("SELECT 1; SELECT 2") == [
        "SELECT 1", "SELECT 2"]


def test_split_sql_semicolon_in_string_and_escape():
    stmts = catalog._split_sql(
        "SELECT 'a;b' AS x; SELECT 'it''s; fine' AS y;")
    assert stmts == ["SELECT 'a;b' AS x", "SELECT 'it''s; fine' AS y"]


def test_split_sql_line_comment():
    stmts = catalog._split_sql(
        "SELECT 1 -- trailing; not a split\n; SELECT 2")
    assert stmts == ["SELECT 1 -- trailing; not a split", "SELECT 2"]


def test_split_sql_block_comment():
    stmts = catalog._split_sql(
        "SELECT /* mid; comment */ 1; /* lead; */ SELECT 2")
    assert stmts == ["SELECT /* mid; comment */ 1",
                     "/* lead; */ SELECT 2"]


def test_split_sql_double_quoted_identifier():
    stmts = catalog._split_sql('SELECT 1 AS "a;b"; SELECT 2')
    assert stmts == ['SELECT 1 AS "a;b"', "SELECT 2"]


def test_split_sql_drops_comment_only_fragments():
    stmts = catalog._split_sql(
        "-- header; comment\nSELECT 1;\n-- done\n/* eof */")
    assert stmts == ["-- header; comment\nSELECT 1"]


# ------------------------------------------------ LIVE Postgres arm (r12)
# The image ships a real PostgreSQL server (initdb/pg_ctl) but no JDBC
# jar and no Python driver — sources/pgwire.py speaks the public v3
# wire protocol directly, so SRC-01's compat surface finally gets a
# test against a REAL server (VERDICT r11 item 7).  The fixture runs a
# throwaway trust-auth instance as an unprivileged user on a unix
# socket; everything is skipped cleanly where the binaries or setpriv
# are unavailable.

import shutil
import subprocess
import tempfile


def _setpriv_prefix():
    return ["setpriv", "--reuid=nobody", "--regid=nogroup",
            "--clear-groups", "env", "HOME=/tmp"]


@pytest.fixture(scope="module")
def pg_instance():
    for exe in ("initdb", "pg_ctl", "setpriv"):
        if shutil.which(exe) is None:
            pytest.skip(f"{exe} not available")
    if os.geteuid() != 0:
        pytest.skip("needs root (to drop to nobody for initdb)")
    base = tempfile.mkdtemp(prefix="pglive_")
    os.chmod(base, 0o777)
    data, sock = os.path.join(base, "data"), os.path.join(base, "sock")
    os.makedirs(sock)
    subprocess.run(["chown", "-R", "nobody", base], check=True)
    r = subprocess.run(_setpriv_prefix() + ["initdb", "-D", data,
                                            "-U", "postgres"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = subprocess.run(
        _setpriv_prefix() + [
            "pg_ctl", "-D", data, "-l", os.path.join(base, "log"),
            "-o", f"-k {sock} -c listen_addresses=''", "start"],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    import time as _time
    sock_file = os.path.join(sock, ".s.PGSQL.5432")
    for _ in range(100):            # pg_ctl -w readiness probes the
        if os.path.exists(sock_file):  # DEFAULT socket dir; wait for
            break                      # ours to appear
        _time.sleep(0.1)
    try:
        yield sock
    finally:
        subprocess.run(_setpriv_prefix() + ["pg_ctl", "-D", data,
                                            "-m", "immediate", "stop"],
                       capture_output=True)
        subprocess.run(["rm", "-rf", base])


def test_pgwire_live_roundtrip(spark, pg_instance):
    """End to end against the real server: DDL + typed INSERT through
    the wire client, read back through the catalog's pg+native seam as
    a Spark DataFrame — types (bigint/varchar/date/numeric/boolean),
    NULLs, and values all surface exactly."""
    import datetime
    from decimal import Decimal

    from docker_aktin_dwh_spark.sources.pgwire import PgWireClient

    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("DROP TABLE IF EXISTS visit_dim")
        c.execute("CREATE TABLE visit_dim (encounter_num bigint, "
                  "inout_cd varchar(2), start_date date, "
                  "cost numeric(10,2), ok boolean)")
        c.execute("INSERT INTO visit_dim VALUES "
                  "(1,'I','2024-01-05',10.25,true),"
                  "(2,'O','2024-02-06',NULL,false),"
                  "(3,NULL,NULL,0.00,NULL)")
    df = catalog.load(spark, f"pg+native:{pg_instance}", "visit_dim")
    rows = {r.encounter_num: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1].inout_cd == "I"
    assert rows[1].start_date == datetime.date(2024, 1, 5)
    assert rows[1].cost == Decimal("10.25")
    assert rows[1].ok is True
    assert rows[2].cost is None and rows[2].ok is False
    assert rows[3].inout_cd is None and rows[3].ok is None
    # a real relational op over the live source
    n = df.filter("ok OR ok IS NULL").count()
    assert n == 2


def test_pgwire_live_error_and_bound(spark, pg_instance):
    """Server errors surface as PgError (not wedges); the ROWS_MAX
    fetch bound is enforced (the compat arm refuses to masquerade as
    the scan path)."""
    from docker_aktin_dwh_spark.sources import pgwire
    from docker_aktin_dwh_spark.sources.pgwire import (PgError,
                                                       PgWireClient)

    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        with pytest.raises(PgError, match="42P01"):
            c.query("SELECT * FROM no_such_table_anywhere")
        # connection stays usable after a server error
        _, _, rows = c.query("SELECT 41 + 1 AS x")
        assert rows == [(42,)]
    old = pgwire.ROWS_MAX
    pgwire.ROWS_MAX = 10
    try:
        with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
            with pytest.raises(PgError, match="ROWS_MAX"):
                c.query("SELECT generate_series(1, 100)")
    finally:
        pgwire.ROWS_MAX = old


def test_pgwire_live_report_writeback(spark, pg_instance):
    """SNK-02's DB form: a report frame written INTO the live server
    (multi-row INSERT batches through one connection), read back
    through the same wire — values, NULLs and types surface exactly
    (the reference materializes report tables into its Postgres)."""
    from pyspark.sql import functions as F

    from docker_aktin_dwh_spark.sources.pgwire import (PgWireClient,
                                                       pg_native_write)

    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("DROP TABLE IF EXISTS monthly_report")
        c.execute("CREATE TABLE monthly_report (month varchar(7), "
                  "n_visits bigint, note varchar(40))")
    rep = spark.createDataFrame(
        [("2024-01", 10, "it's fine"), ("2024-02", 20, None)],
        "month string, n_visits long, note string")
    n = pg_native_write(rep, "monthly_report", unix_dir=pg_instance)
    assert n == 2
    back = catalog.load(spark, f"pg+native:{pg_instance}",
                        "monthly_report")
    rows = {r.month: r for r in back.collect()}
    assert rows["2024-01"].n_visits == 10
    assert rows["2024-01"].note == "it's fine"   # quote-escaping
    assert rows["2024-02"].note is None
    assert back.agg(F.sum("n_visits")).first()[0] == 30


def test_pgwire_live_scram_auth(pg_instance):
    """SCRAM-SHA-256 against the real server (r13, VERDICT r12 item 4
    — production auth, the PostgreSQL 14+ default): a scram-verified
    role behind a scram-only pg_hba line authenticates through the
    pure-stdlib RFC 5802/7677 exchange; a wrong password is refused by
    the server, a missing password raises the client's clear error,
    and the SERVER signature is verified (mutual auth).  Trust-auth
    superuser connections are untouched."""
    from docker_aktin_dwh_spark.sources.pgwire import (PgError,
                                                       PgWireClient)

    data = os.path.join(os.path.dirname(pg_instance), "data")
    hba = os.path.join(data, "pg_hba.conf")
    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("SET password_encryption = 'scram-sha-256'")
        c.execute("DROP USER IF EXISTS scram_user")
        c.execute("CREATE USER scram_user PASSWORD 's3cret!pw'")
        # the stored verifier really is SCRAM, not md5
        _, _, rows = c.query(
            "SELECT passwd LIKE 'SCRAM-SHA-256%' FROM pg_shadow "
            "WHERE usename = 'scram_user'")
        assert rows == [(True,)]
    orig = open(hba).read()
    open(hba, "w").write("local all scram_user scram-sha-256\n" + orig)
    try:
        with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
            c.execute("SELECT pg_reload_conf()")
        with pytest.raises(PgError):
            PgWireClient(unix_dir=pg_instance, user="scram_user",
                         password="wrong-password")
        with pytest.raises(PgError, match="SCRAM"):
            PgWireClient(unix_dir=pg_instance, user="scram_user")
        with PgWireClient(unix_dir=pg_instance, user="scram_user",
                          password="s3cret!pw") as c:
            _, _, rows = c.query("SELECT current_user AS u")
            assert rows == [("scram_user",)]
    finally:
        open(hba, "w").write(orig)
        with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
            c.execute("SELECT pg_reload_conf()")


def test_pgwire_live_copy_roundtrip(spark, pg_instance):
    """COPY subprotocol (r13, VERDICT r12 item 4): bulk write via COPY
    FROM STDIN and bulk fetch via COPY TO STDOUT roundtrip exactly —
    including tab/newline/backslash payloads and NULLs (the text-format
    escapes) — and the COPY path lifts the simple-protocol ROWS_MAX
    bound (a frame the query path refuses streams fine through COPY)."""
    from pyspark.sql import functions as F

    from docker_aktin_dwh_spark.sources import pgwire
    from docker_aktin_dwh_spark.sources.pgwire import (
        PgError, PgWireClient, pg_native_load, pg_native_write)

    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("DROP TABLE IF EXISTS copy_t")
        c.execute("CREATE TABLE copy_t (k bigint, s varchar(60), "
                  "d date, x numeric(8,2), b boolean)")
    df = spark.createDataFrame(
        [(1, "plain", "2024-03-01", "10.25", True),
         (2, "tab\there", "2024-03-02", None, False),
         (3, "new\nline and \\backslash", None, "0.50", None),
         (4, None, "2024-03-04", "7.00", True),
         (5, "literal \\N not null", "2024-03-05", "1.00", False)],
        "k long, s string, d string, x string, b boolean") \
        .select("k", "s", F.col("d").cast("date").alias("d"),
                F.col("x").cast("decimal(8,2)").alias("x"), "b")
    n = pg_native_write(df, "copy_t", unix_dir=pg_instance, bulk=True)
    assert n == 5
    back = pg_native_load(spark, "SELECT * FROM copy_t",
                          unix_dir=pg_instance, bulk=True)
    rows = {r.k: r for r in back.collect()}
    assert rows[2].s == "tab\there" and rows[2].x is None
    assert rows[3].s == "new\nline and \\backslash"
    assert rows[3].d is None
    assert rows[4].s is None
    assert rows[5].s == "literal \\N not null"
    # bulk fetch == simple-protocol fetch, row for row
    simple = pg_native_load(spark, "SELECT * FROM copy_t",
                            unix_dir=pg_instance)
    assert sorted(map(tuple, back.collect())) \
        == sorted(map(tuple, simple.collect()))
    # the bound lifts: 100 rows > patched ROWS_MAX flows through COPY
    old = pgwire.ROWS_MAX
    pgwire.ROWS_MAX = 10
    try:
        with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
            with pytest.raises(PgError, match="ROWS_MAX"):
                c.query("SELECT generate_series(1, 100)")
        big = pg_native_load(
            spark, "SELECT g AS k FROM generate_series(1, 100) AS g",
            unix_dir=pg_instance, bulk=True)
        assert big.count() == 100
    finally:
        pgwire.ROWS_MAX = old


def test_pgwire_live_extended_query_params(spark, pg_instance):
    """r14 (VERDICT r13 item 7): the EXTENDED-query protocol
    (Parse/Bind/Describe/Execute/Sync) with typed text-format
    parameters against the real server — NULLs, tabs, newlines,
    quotes, unicode and injection-shaped strings are DATA (they travel
    outside the SQL string), and pg_native_write's default path now
    rides it, making the injection guarantee structural."""
    import datetime
    from decimal import Decimal

    from docker_aktin_dwh_spark.sources.pgwire import (PgError,
                                                       PgWireClient,
                                                       pg_native_write)

    nasty = "a'b\\'; DROP TABLE ext_t; --\tx\nyé"
    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("DROP TABLE IF EXISTS ext_t")
        c.execute("CREATE TABLE ext_t (k bigint, s text, d date, "
                  "ts timestamp, n numeric(10,2), b boolean, "
                  "x double precision)")
        # parameterized insert: every scalar type + NULLs
        c.execute_params(
            "INSERT INTO ext_t VALUES ($1,$2,$3,$4,$5,$6,$7)",
            [1, nasty, datetime.date(2024, 3, 4),
             datetime.datetime(2024, 3, 4, 5, 6, 7),
             Decimal("12.34"), True, 2.5])
        c.execute_params(
            "INSERT INTO ext_t VALUES ($1,$2,$3,$4,$5,$6,$7)",
            [2, None, None, None, None, None, None])
        # parameterized SELECT with a result set
        names, ddl, rows = c.query_params(
            "SELECT k, s, d, ts, n, b, x FROM ext_t "
            "WHERE k = $1 OR s = $2 ORDER BY k", [2, nasty])
        assert names == ["k", "s", "d", "ts", "n", "b", "x"]
        assert len(rows) == 2
        r1, r2 = rows
        assert r1[0] == 1 and r1[1] == nasty
        assert r1[2] == datetime.date(2024, 3, 4)
        assert r1[3] == datetime.datetime(2024, 3, 4, 5, 6, 7)
        assert r1[4] == Decimal("12.34") and r1[5] is True
        assert r1[6] == 2.5
        assert r2 == (2, None, None, None, None, None, None)
        # the injection-shaped string stayed data: table still exists
        _, _, n = c.query_params(
            "SELECT count(*)::bigint FROM ext_t", [])
        assert n[0][0] == 2
        # a server-side error inside the extended flow surfaces as
        # PgError and the connection survives (Sync recovers)
        with pytest.raises(PgError):
            c.query_params("SELECT 1/0", [])
        assert c.query_params("SELECT $1::bigint + 1", [41])[2] \
            == [(42,)]

    # pg_native_write's default (non-bulk) path through parameters
    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        c.execute("DROP TABLE IF EXISTS ext_wb")
        c.execute("CREATE TABLE ext_wb (k bigint, s text)")
    rep = spark.createDataFrame(
        [(1, nasty), (2, None), (3, "plain")], "k long, s string")
    assert pg_native_write(rep, "ext_wb", unix_dir=pg_instance,
                           batch_rows=2) == 3
    with PgWireClient(unix_dir=pg_instance, user="postgres") as c:
        _, _, rows = c.query("SELECT k, s FROM ext_wb ORDER BY k")
        assert rows == [(1, nasty), (2, None), (3, "plain")]
