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
