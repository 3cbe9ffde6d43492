"""SQL write-verb surface (r15, VERDICT r14 item 5): every statement
shape the dispatcher speaks, certified EQUAL to its Python twin on a
PARTITIONED + COLUMN-MAPPED table — two identical tables, one driven
by txnsql.sql(), one by the Python verbs, compared after every verb.
"""

import datetime
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from docker_aktin_dwh_spark.sources import txnlog, txnsql


@pytest.fixture()
def pair(spark):
    """Two identical partitioned + column-mapped tables."""
    with tempfile.TemporaryDirectory(prefix="txnsql_") as d:
        paths = [os.path.join(d, n) for n in ("t_sql", "t_py")]
        df = (spark.range(0, 200).coalesce(2).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"),
            F.concat(F.lit("a"), F.col("id").cast("string"))
             .alias("v"),
            (F.col("id") * 10).cast("int").alias("amount"),
            F.to_date(F.lit("2024-03-01")).alias("d")))
        for p in paths:
            txnlog.create_table(spark, df, p, key="k",
                                partition_by=["p"])
            txnlog.rename_column(spark, p, old="v", new="val")
        yield paths


def _eq(spark, a, b):
    ra = sorted(tuple(r) for r in txnlog.read_table(spark, a)
                .collect())
    rb = sorted(tuple(r) for r in txnlog.read_table(spark, b)
                .collect())
    assert ra == rb and ra, "SQL route must equal the Python twin"


def test_update_statement_parity(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark, f"""
        UPDATE txnlog.`{t_sql}`
        SET val = concat('u', val),
            amount = cast(amount + k AS int)
        WHERE k >= 20 AND k < 40 AND d = DATE '2024-03-01'""")
    txnlog.update_where(
        spark, t_py, key="k",
        filters=[("k", ">=", 20), ("k", "<", 40),
                 ("d", "=", datetime.date(2024, 3, 1))],
        assignments={"val": "concat('u', val)",
                     "amount": "cast(amount + k AS int)"})
    _eq(spark, t_sql, t_py)
    # all assignments see the PRE-update row (the ADVICE r14 contract)
    got = {r.k: r.amount for r in
           txnlog.read_table(spark, t_sql).collect()}
    assert got[25] == 275 and got[50] == 500


def test_delete_statement_parity(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark, f"DELETE FROM txnlog.`{t_sql}` "
                      f"WHERE k IN (3, 5, 7) AND p >= 1")
    txnlog.delete_where(spark, t_py, key="k",
                        filters=[("k", "in", [3, 5, 7]),
                                 ("p", ">=", 1)])
    _eq(spark, t_sql, t_py)
    assert txnlog.read_table(spark, t_sql).count() == 197


def test_merge_upsert_statement_parity(spark, pair):
    t_sql, t_py = pair
    batch = (spark.range(190, 210).coalesce(1).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("val"),
        F.lit(0).cast("int").alias("amount"),
        F.to_date(F.lit("2024-04-01")).alias("d")))
    batch.createOrReplaceTempView("txnsql_batch")
    txnsql.sql(spark, f"""
        MERGE INTO txnlog.`{t_sql}` AS t USING txnsql_batch AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    txnlog.merge(spark, t_py, batch, key="k")
    _eq(spark, t_sql, t_py)
    assert txnlog.read_table(spark, t_sql).count() == 210


def test_merge_cdc_statement_parity(spark, pair):
    t_sql, t_py = pair
    feed = (spark.range(10, 30).coalesce(1).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        F.lit("cdc").alias("val"),
        F.lit(1).cast("int").alias("amount"),
        F.to_date(F.lit("2024-05-01")).alias("d"),
        F.when(F.col("id") < 15, "delete").otherwise("upsert")
         .alias("op")))
    feed.createOrReplaceTempView("txnsql_feed")
    txnsql.sql(spark, f"""
        MERGE INTO txnlog.`{t_sql}` AS t USING txnsql_feed AS s
        ON t.k = s.k
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    txnlog.apply_changes(spark, t_py, feed, key="k", op_col="op",
                         delete_op="delete")
    _eq(spark, t_sql, t_py)
    assert txnlog.read_table(spark, t_sql).count() == 195


def test_merge_subquery_source_and_matched_delete(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark, f"""
        MERGE INTO txnlog.`{t_sql}` AS t
        USING (SELECT id AS k FROM range(100, 120)) AS s
        ON t.k = s.k
        WHEN MATCHED THEN DELETE""")
    feed = (spark.range(100, 120).select(F.col("id").alias("k"))
            .withColumn("__op", F.lit("delete")))
    txnlog.apply_changes(spark, t_py, feed, key="k", op_col="__op",
                         delete_op="delete")
    _eq(spark, t_sql, t_py)
    assert txnlog.read_table(spark, t_sql).count() == 180


def test_alter_statements_parity(spark, pair):
    t_sql, t_py = pair
    for stmt, twin in [
        (f"ALTER TABLE txnlog.`{t_sql}` RENAME COLUMN val TO label",
         lambda: txnlog.rename_column(spark, t_py, old="val",
                                      new="label")),
        (f"ALTER TABLE txnlog.`{t_sql}` ADD COLUMN note string",
         lambda: txnlog.add_column(spark, t_py, column="note",
                                   dtype="string")),
        (f"ALTER TABLE txnlog.`{t_sql}` ALTER COLUMN amount "
         f"TYPE bigint",
         lambda: txnlog.widen_column_type(spark, t_py,
                                          column="amount",
                                          to="bigint")),
        (f"ALTER TABLE txnlog.`{t_sql}` DROP COLUMN note",
         lambda: txnlog.drop_column(spark, t_py, column="note")),
        (f"ALTER TABLE txnlog.`{t_sql}` DROP PARTITION (p = 2)",
         lambda: txnlog.drop_partition(spark, t_py,
                                       values={"p": 2})),
    ]:
        txnsql.sql(spark, stmt)
        twin()
        _eq(spark, t_sql, t_py)
    assert txnlog.read_table(spark, t_sql).count() == 150
    snap = txnlog.snapshot(t_sql)
    assert "label" in snap.colmap


def test_loud_refusals(spark, pair):
    t_sql, _ = pair
    t = f"txnlog.`{t_sql}`"
    for stmt, msg in [
        (f"UPDATE {t} SET val = 'x'", "WHERE is required"),
        (f"DELETE FROM {t}", "WHERE is required"),
        (f"DELETE FROM {t} WHERE k = 1 OR k = 2",
         "literal|conjunction"),
        (f"UPDATE {t} SET val = 'x' WHERE k <> 1", "pruning-safe"),
        (f"DELETE FROM txnlog_typo WHERE k = 1", "unknown table"),
        (f"MERGE INTO {t} AS a USING v AS b ON a.k = b.other "
         f"WHEN MATCHED THEN UPDATE SET * "
         f"WHEN NOT MATCHED THEN INSERT *", "merge key"),
        (f"TRUNCATE TABLE {t}", "not dispatched"),
        (f"ALTER TABLE {t} CLUSTER BY (k)", "unsupported"),
    ]:
        with pytest.raises(txnsql.SqlSurfaceError, match=msg):
            txnsql.sql(spark, stmt)
    # MERGE with column-level SET refuses toward the UPDATE statement
    spark.range(1).select(F.col("id").alias("k")) \
         .createOrReplaceTempView("txnsql_v1")
    with pytest.raises(txnsql.SqlSurfaceError, match="UPDATE SET"):
        txnsql.sql(spark, f"""
            MERGE INTO {t} AS a USING txnsql_v1 AS b ON a.k = b.k
            WHEN MATCHED THEN UPDATE SET val = 'x'
            WHEN NOT MATCHED THEN INSERT *""")


def test_tables_mapping_and_trailing_semicolon(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark,
               "UPDATE facts SET amount = 0 WHERE k = 1;",
               tables={"facts": t_sql})
    txnlog.update_where(spark, t_py, key="k",
                        filters=[("k", "=", 1)],
                        assignments={"amount": "0"})
    _eq(spark, t_sql, t_py)


def test_insert_values_parity(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark, f"""
        INSERT INTO txnlog.`{t_sql}` (k, p, val, amount, d)
        VALUES (1000, 1, 'i1000', 7, DATE '2024-03-02'),
               (1001, 2, NULL, NULL, NULL)""")
    rows = [(1000, 1, "i1000", 7, datetime.date(2024, 3, 2)),
            (1001, 2, None, None, None)]
    txnlog.append(
        spark,
        spark.createDataFrame(
            rows, "k long, p int, val string, amount int, d date"),
        t_py, key="k")
    _eq(spark, t_sql, t_py)


def test_insert_column_subset_fills_null(spark, pair):
    t_sql, t_py = pair
    txnsql.sql(spark, f"INSERT INTO txnlog.`{t_sql}` (k, p) "
                      f"VALUES (2000, 3)")
    txnlog.append(
        spark,
        spark.createDataFrame(
            [(2000, 3, None, None, None)],
            "k long, p int, val string, amount int, d date"),
        t_py, key="k")
    _eq(spark, t_sql, t_py)


def test_insert_select_parity(spark, pair):
    t_sql, t_py = pair
    src = spark.range(3000, 3005).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("p"),
        F.lit("s").alias("val"),
        F.lit(1).alias("amount"),
        F.to_date(F.lit("2024-04-01")).alias("d"))
    src.createOrReplaceTempView("txnsql_ins_src")
    txnsql.sql(spark, f"INSERT INTO txnlog.`{t_sql}` "
                      f"SELECT * FROM txnsql_ins_src")
    txnlog.append(spark, src, t_py, key="k")
    _eq(spark, t_sql, t_py)


def test_ctas_restore_optimize_history_vacuum(spark, tmp_path):
    path = str(tmp_path / "ctas")
    t = f"txnlog.`{path}`"
    txnsql.sql(spark, f"""
        CREATE TABLE {t} USING txnlog PARTITIONED BY (p)
        TBLPROPERTIES ('key' = 'k')
        AS SELECT id AS k, CAST(id % 2 AS INT) AS p,
                  CAST(id * 2 AS INT) AS amount
        FROM range(100)""")
    snap = txnlog.snapshot(path)
    assert snap.version == 0 and snap.key == "k"
    base = sorted(tuple(r) for r in
                  txnlog.read_table(spark, path).collect())
    assert len(base) == 100
    # small-file churn, then a partition-scoped OPTIMIZE
    for i in (100, 101, 102):
        txnsql.sql(spark, f"INSERT INTO {t} (k, p, amount) "
                          f"VALUES ({i}, 0, 0)")
    files_before = {f for f, s in txnlog.snapshot(path).files.items()
                    if (s.get("pv") or {}).get("p") == "0"}
    txnsql.sql(spark, f"OPTIMIZE {t} WHERE p = 0")
    after = txnlog.snapshot(path)
    files_after = {f for f, s in after.files.items()
                   if (s.get("pv") or {}).get("p") == "0"}
    assert len(files_after) < len(files_before)
    # content unchanged by OPTIMIZE
    got = sorted(tuple(r) for r in
                 txnlog.read_table(spark, path).collect())
    assert len(got) == 103
    # RESTORE back to v0
    txnsql.sql(spark, f"RESTORE TABLE {t} TO VERSION AS OF 0")
    assert sorted(tuple(r) for r in
                  txnlog.read_table(spark, path).collect()) == base
    # DESCRIBE HISTORY is a DataFrame carrying the verbs
    hist = txnsql.sql(spark, f"DESCRIBE HISTORY {t}")
    ops = [r.op for r in hist.collect()]
    assert "restore" in ops and "create" in ops
    # VACUUM returns the reclaimed list (nothing young is reclaimed)
    assert txnsql.sql(spark, f"VACUUM {t} RETAIN 1 HOURS") == []


def test_new_statement_refusals(spark, pair):
    t_sql, _ = pair
    t = f"txnlog.`{t_sql}`"
    for stmt, msg in [
        (f"INSERT INTO {t} (k, nope) VALUES (1, 2)", "not in the"),
        (f"INSERT INTO {t} (k, p) VALUES (1)", "values for"),
        (f"OPTIMIZE {t} WHERE p > 1", "partition"),
        (f"OPTIMIZE {t} ZORDER BY (k, p, amount)", "two columns"),
        (f"CREATE TABLE {t} AS SELECT 1 AS k", "merge key"),
        (f"RESTORE {t} TO 0", "RESTORE shape"),
        (f"DESCRIBE DETAIL {t}", "DESCRIBE shape"),
    ]:
        with pytest.raises(txnsql.SqlSurfaceError, match=msg):
            txnsql.sql(spark, stmt)


def test_merge_conditional_delete_only_touches_only_deletes(
        spark, pair):
    """Post-review r15: a MERGE whose ONLY action is a conditional
    DELETE must not upsert the source's non-delete rows."""
    t_sql, t_py = pair
    feed = spark.createDataFrame(
        [(5, "delete"), (6, "keep"), (9999, "keep")],
        "k long, op string")
    feed.createOrReplaceTempView("txnsql_del_only")
    txnsql.sql(spark, f"""
        MERGE INTO txnlog.`{t_sql}` AS a USING txnsql_del_only AS b
        ON a.k = b.k
        WHEN MATCHED AND b.op = 'delete' THEN DELETE""")
    txnlog.delete_where(spark, t_py, key="k",
                        filters=[("k", "=", 5)])
    _eq(spark, t_sql, t_py)
    got = txnlog.read_table(spark, t_sql)
    assert got.filter("k = 9999").count() == 0, \
        "non-delete source rows must NOT be inserted"
    assert got.filter("k = 6").count() == 1, \
        "non-delete matched rows must be untouched"
    # partial arm sets refuse instead of silently writing
    with pytest.raises(txnsql.SqlSurfaceError, match="CDC shape"):
        txnsql.sql(spark, f"""
            MERGE INTO txnlog.`{t_sql}` AS a
            USING txnsql_del_only AS b ON a.k = b.k
            WHEN MATCHED AND b.op = 'delete' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *""")


def test_insert_requires_partition_columns(spark, pair):
    t_sql, _ = pair
    with pytest.raises(txnsql.SqlSurfaceError,
                       match="partition column"):
        txnsql.sql(spark, f"INSERT INTO txnlog.`{t_sql}` (k, val) "
                          f"VALUES (9000, 'x')")


def test_select_statement_with_time_travel(spark, pair):
    """One entry point for reads too: SELECT/WITH over txnlog refs,
    VERSION AS OF time travel, joins across two txnlog tables, and
    the tables mapping."""
    t_sql, t_py = pair
    v0_count = txnlog.read_table(spark, t_sql).count()
    txnsql.sql(spark, f"DELETE FROM txnlog.`{t_sql}` "
                      f"WHERE k >= 100 AND k < 150")
    df = txnsql.sql(spark, f"SELECT count(*) AS n "
                           f"FROM txnlog.`{t_sql}`")
    assert df.collect()[0].n == v0_count - 50
    old = txnsql.sql(spark, f"""
        SELECT count(*) AS n
        FROM txnlog.`{t_sql}` VERSION AS OF 1""")
    assert old.collect()[0].n == v0_count
    joined = txnsql.sql(spark, f"""
        WITH a AS (SELECT k FROM txnlog.`{t_sql}`)
        SELECT count(*) AS n
        FROM a JOIN txnlog.`{t_py}` AS b ON a.k = b.k""")
    assert joined.collect()[0].n == v0_count - 50
    named = txnsql.sql(spark, "SELECT max(k) AS mx FROM facts",
                       tables={"facts": t_py})
    assert named.collect()[0].mx == 199


def test_select_leaves_quoted_literals_alone(spark, pair):
    t_sql, _ = pair
    df = txnsql.sql(spark, f"""
        SELECT count(*) AS n, 'txnlog.`not-a-ref`' AS lit
        FROM txnlog.`{t_sql}` GROUP BY lit""")
    row = df.collect()[0]
    assert row.n == 200 and row.lit == "txnlog.`not-a-ref`"


def test_select_scanner_and_hygiene(spark, pair):
    """Post-review r15: comments and double-quoted/backslash-escaped
    literals are opaque to the rewriter; CTE-prefixed DML refuses;
    the helper temp views are dropped before returning (the result
    stays usable — spark.sql analyzes eagerly)."""
    t_sql, _ = pair
    df = txnsql.sql(spark, f"""
        SELECT count(*) AS n  -- not a ref: txnlog.`/line-comment`
        FROM txnlog.`{t_sql}` /* nor txnlog.`/block-comment` */""")
    assert not [v.name for v in spark.catalog.listTables()
                if v.name.startswith("_txnsql_")], \
        "helper views must be dropped before returning"
    assert df.collect()[0].n == 200, \
        "dropping the view must not break the returned frame"
    row = txnsql.sql(spark, f"""
        SELECT "txnlog.`dq`" AS d, 'esc\\' txnlog.`bs`' AS b,
               count(*) AS n
        FROM txnlog.`{t_sql}` GROUP BY d, b""").collect()[0]
    assert row.d == "txnlog.`dq`" and "txnlog.`bs`" in row.b \
        and row.n == 200
    with pytest.raises(txnsql.SqlSurfaceError, match="CTE-prefixed"):
        txnsql.sql(spark, f"""
            WITH s AS (SELECT 1 AS k)
            INSERT INTO txnlog.`{t_sql}` SELECT * FROM s""")
    # tables mapping ignores names that appear only inside literals
    spark.range(3).createOrReplaceTempView("user_facts")
    txnsql.sql(spark, f"SELECT 'user_facts' AS tag "
                      f"FROM txnlog.`{t_sql}` LIMIT 1",
               tables={"user_facts": t_sql})
    assert spark.table("user_facts").count() == 3, \
        "a literal-only match must not clobber the user's view"


def test_select_timestamp_as_of_session_tz(spark, pair):
    """TIMESTAMP AS OF interprets the literal in Spark's session
    timezone (Delta's rule), not the host's."""
    import datetime
    from zoneinfo import ZoneInfo
    t_sql, _ = pair
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try:
        now = datetime.datetime.now(
            ZoneInfo("Pacific/Kiritimati")) \
            + datetime.timedelta(seconds=5)
        df = txnsql.sql(spark, f"""
            SELECT count(*) AS n FROM txnlog.`{t_sql}`
            TIMESTAMP AS OF '{now.strftime('%Y-%m-%d %H:%M:%S')}'""")
        assert df.collect()[0].n == 200, \
            "a now-in-session-tz timestamp must resolve to the " \
            "latest version (a host-tz parse would be ±14 h off)"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
