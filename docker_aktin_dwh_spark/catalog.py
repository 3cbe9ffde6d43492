"""Table registry over the driver-generated parquet fixtures.

Maps the i2b2/AKTIN star-schema capability (reference:
src/docker/database/Dockerfile:25-34 — i2b2crcdata tables created by
concatenated init SQL) onto parquet-backed DataFrames.  The clinical
tables (patient_dimension / visit_dimension / observation_fact /
concept_dimension / ontology) are deterministic derivations of the
TPC-H-ish family-A fixtures, per FIXTURES.md §B, so the DuckDB oracle
can run the *same* derivation SQL.

Scale note: everything here is a lazy DataFrame over parquet — no
driver-side materialization.  At 100 TB the same code reads a
date-partitioned directory tree; the derivations are narrow (project +
join-on-key) and Catalyst pushes filters beneath them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import NANOS_AS_LONG

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: epoch for nanos->NTZ conversion; `ts div 1000` truncates to micros
#: (DuckDB's naive TIMESTAMP precision) without float rounding.
_NANOS_TO_NTZ = (
    "timestamp_ntz'1970-01-01 00:00:00' + "
    "make_interval(0,0,0,0,0,0, cast(cast(ts div 1000 as decimal(26,6)) / 1000000 as decimal(18,6)))"
)


#: Reader options every JDBC scan gets unless the spec overrides them.
#: fetchsize keeps the per-executor cursor streaming instead of
#: materializing the whole split; pushDownPredicate lets Catalyst send
#: filters into the database's WHERE clause.
JDBC_DEFAULT_OPTIONS = {
    "fetchsize": "10000",
    "pushDownPredicate": "true",
}

#: spec keys that control parallel (partitioned) JDBC scans — at scale a
#: JDBC read without these is ONE task holding one cursor; with them
#: Spark issues numPartitions range-bounded queries in parallel.
JDBC_PARTITION_KEYS = ("partitionColumn", "lowerBound", "upperBound",
                       "numPartitions")


def parse_jdbc_spec(spec: str) -> tuple[str, dict[str, str]]:
    """Split a ``jdbc:...`` table spec into (url, reader options).

    Spec shape: ``jdbc:<subprotocol>://host:port/db?k=v&k2=v2`` — the
    query part is lifted into Spark reader options (user, password,
    fetchsize, partitionColumn/lowerBound/upperBound/numPartitions, any
    other DataSource V1 JDBC option), the rest stays the connection URL.
    Mirrors SRC-01's declared compat path against the reference's
    Postgres engine (reference src/docker/database/Dockerfile:8) while
    keeping the parquet fixtures the default.
    """
    if not spec.startswith("jdbc:"):
        raise ValueError(f"not a jdbc spec: {spec!r}")
    base, _, query = spec.partition("?")
    opts = dict(JDBC_DEFAULT_OPTIONS)
    if query:
        from urllib.parse import unquote
        for kv in query.split("&"):
            if not kv:
                continue
            k, _, v = kv.partition("=")
            opts[unquote(k)] = unquote(v)
    part_given = [k for k in JDBC_PARTITION_KEYS if k in opts]
    if part_given and len(part_given) != len(JDBC_PARTITION_KEYS):
        missing = sorted(set(JDBC_PARTITION_KEYS) - set(part_given))
        raise ValueError(
            f"partitioned jdbc read needs all of {JDBC_PARTITION_KEYS}; "
            f"missing {missing}")
    return base, opts


def jdbc_reader(spark: SparkSession, spec: str, table: str):
    """DataFrameReader for one table behind a ``jdbc:`` spec.  Separate
    from :func:`load` so tests can verify option plumbing without a
    driver jar (none ships in this environment — the integration test is
    skip-marked on ``SPARK_GRAFT_JDBC_URL``)."""
    url, opts = parse_jdbc_spec(spec)
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the `events` nanos timestamp.

    ``sf_dir`` may also be a ``jdbc:`` table spec (see
    :func:`parse_jdbc_spec`) — then each table is a parallel JDBC scan
    instead of a parquet directory.  JDBC sources deliver real
    timestamp columns, so the parquet-specific nanos rewrite is skipped.
    """
    if sf_dir.startswith("pg+native:"):
        # LIVE Postgres over the pure-Python wire client (SRC-01's
        # compat arm, r12 — sources/pgwire.py): spec is
        # ``pg+native:<unix socket dir>[?db=<d>&port=<p>&user=<u>]``
        # (query params, because the socket dir is a path with
        # slashes), auth is trust, the fetch is driver-side and
        # ROWS_MAX-bounded.  The 100 TB path stays the JVM JDBC
        # reader (``jdbc:`` spec) — this arm exists so the compat
        # surface has one test against a REAL server even without a
        # driver jar on the classpath.
        from urllib.parse import parse_qs

        from .sources.pgwire import pg_native_load, quote_ident
        rest = sf_dir[len("pg+native:"):]
        q: dict[str, list[str]] = {}
        if "?" in rest:
            rest, qs = rest.split("?", 1)
            q = parse_qs(qs)
        return pg_native_load(
            spark, f"SELECT * FROM {quote_ident(name)}", unix_dir=rest,
            port=int(q.get("port", ["5432"])[0]),
            user=q.get("user", ["postgres"])[0],
            database=q.get("db", ["postgres"])[0])
    if sf_dir.startswith("jdbc:"):
        return jdbc_reader(spark, sf_dir, name).load()
    if name == "events":
        spark.conf.set(NANOS_AS_LONG, "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NANOS_TO_NTZ))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Row count of a fixture table from parquet FOOTER metadata — no
    Spark job, no data scan (ADVICE r8: a size-gate's control-plane
    scalar must not cost an O(table) pass).  Parquet footers carry
    exact row counts per file; summing them is a metadata read, the
    same statistic a lakehouse catalog serves.  Returns ``None`` when
    the source has no footer to read (JDBC specs, missing path) so
    callers fall back to their exact arm / a real count."""
    if sf_dir.startswith("jdbc:"):
        return None
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            return sum(pq.ParquetFile(os.path.join(path, f))
                       .metadata.num_rows
                       for f in os.listdir(path) if f.endswith(".parquet"))
    except OSError:
        return None
    return None


def register_views(spark: SparkSession, sf_dir: str,
                   clinical: bool = False) -> None:
    """Register fixture tables (and optionally the clinical derivations)
    as temp views so `spark.sql` works against them."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    if clinical:
        for name, df in clinical_tables(spark, sf_dir).items():
            df.createOrReplaceTempView(name)


def run_sql_script(spark: SparkSession, script: str) -> DataFrame | None:
    """SRC-02: execute a multi-statement SQL script, return the last
    statement's frame — the Spark form of the reference's concatenated
    init-SQL ingest (reference src/docker/database/Dockerfile:25-34:
    *.sql files catted into the database image).  Statements split on
    ';' outside single-quoted literals, double-quoted identifiers and
    -- / /* */ comments, so scripts copied from the reference's init
    SQL (which contain comments) split correctly."""
    out: DataFrame | None = None
    for stmt in _split_sql(script):
        out = spark.sql(stmt)
    return out


def _split_sql(script: str) -> list[str]:
    """Statement splitter with a 5-state scanner (sql / 'str' / "ident"
    / --line / block comment).  Comment text is preserved inside
    statements (Spark's parser accepts it); statements that contain
    ONLY comments/whitespace are dropped — they are not executable."""
    stmts: list[str] = []
    buf: list[str] = []
    mode = "sql"
    has_sql = False  # statement has content outside comments/whitespace
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if mode == "sql":
            if ch == "'":
                mode, has_sql = "squote", True
            elif ch == '"':
                mode, has_sql = "dquote", True
            elif ch == "-" and nxt == "-":
                mode = "line"
            elif ch == "/" and nxt == "*":
                mode = "block"
            elif ch == ";":
                s = "".join(buf).strip()
                if s and has_sql:
                    stmts.append(s)
                buf, has_sql = [], False
                i += 1
                continue
            elif not ch.isspace():
                has_sql = True
        elif mode == "squote":
            # a doubled '' toggles out and back in on the next quote
            if ch == "'":
                mode = "sql"
        elif mode == "dquote":
            if ch == '"':
                mode = "sql"
        elif mode == "line":
            if ch == "\n":
                mode = "sql"
        elif mode == "block":
            if ch == "*" and nxt == "/":
                buf.append("*/")
                mode = "sql"
                i += 2
                continue
        buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s and has_sql:
        stmts.append(s)
    return stmts


# ---------------------------------------------------------------------------
# Clinical star schema (FIXTURES.md §B) — i2b2crcdata analogue.
#
# The reference's fact table is EAV: one row per observation keyed by
# (encounter_num, concept_cd, provider_id, start_date, modifier_cd,
# instance_num), values split across tval_char / nval_num by valtype_cd
# (reference: src/docker/database/Dockerfile:25-34 provisioning the i2b2
# CRC schema; zip-as-string per update01_convert_zipcodes_to_str.sql at
# src/docker/database/Dockerfile:31).
# ---------------------------------------------------------------------------

def patient_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        c.c_custkey.alias("patient_num"),
        F.expr("date_add(date'1940-01-01', cast(c_custkey % 21915 as int))")
            .alias("birth_date"),
        F.element_at(F.array(F.lit("F"), F.lit("M"), F.lit("U")),
                     (c.c_custkey % 3).cast("int") + 1).alias("sex_cd"),
        F.lit("N").alias("vital_status_cd"),
        # string zip with leading zeros — update01 parity
        F.lpad((c.c_custkey % 99999).cast("string"), 5, "0").alias("zip_cd"),
    )


def visit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        o.o_orderkey.alias("encounter_num"),
        o.o_custkey.alias("patient_num"),
        o.o_orderdate.alias("start_date"),
        F.expr("o_orderdate + make_interval(0,0,0,0, 4 + cast(o_orderkey % 20 as int), 0, 0)")
            .alias("end_date"),
        F.when(o.o_orderkey % 10 < 2, "I").otherwise("O").alias("inout_cd"),
        o.o_orderpriority.alias("location_cd"),
    )


def observation_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    valtype = F.when(l.l_partkey % 3 == 0, "N").otherwise("T")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "inner")
        .select(
            l.l_orderkey.alias("encounter_num"),
            o.o_custkey.alias("patient_num"),
            F.concat(F.lit("AKTIN:"), l.l_returnflag, F.lit(":"),
                     (l.l_partkey % 50).cast("string")).alias("concept_cd"),
            (l.l_suppkey % 100).cast("string").alias("provider_id"),
            l.l_shipdate.alias("start_date"),
            F.lit("@").alias("modifier_cd"),
            l.l_linenumber.alias("instance_num"),
            valtype.alias("valtype_cd"),
            F.when(valtype == "T", l.l_linestatus).alias("tval_char"),
            F.when(valtype == "N", l.l_quantity.cast("decimal(18,5)"))
                .alias("nval_num"),
            F.lit("1").alias("units_cd"),
            l.l_shipdate.alias("end_date"),
        )
    )


def concept_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    code = (l.l_partkey % 50).cast("string")
    return (
        l.select(
            F.concat(F.lit("\\AKTIN\\"), l.l_returnflag, F.lit("\\"),
                     code, F.lit("\\")).alias("concept_path"),
            F.concat(F.lit("AKTIN:"), l.l_returnflag, F.lit(":"),
                     code).alias("concept_cd"),
        )
        .distinct()
        .withColumn("name_char", F.concat(F.lit("Concept "), F.col("concept_cd")))
    )


def ontology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i2b2metadata-shaped term table: folders (hlevel 1) + leaves (2).

    Materialized-path hierarchy via c_fullname, selected by prefix LIKE —
    the reference's ontology addon seeds this shape (reference:
    src/docker/database/Dockerfile:30 addon_i2b2metadata.sql).
    """
    leaves = concept_dimension(spark, sf_dir).select(
        F.lit(2).alias("c_hlevel"),
        F.col("concept_path").alias("c_fullname"),
        F.col("name_char").alias("c_name"),
        F.col("concept_cd").alias("c_basecode"),
        F.lit("LA").alias("c_visualattributes"),
    )
    flags = (
        leaves.select(F.split_part("c_fullname", F.lit("\\"), F.lit(3)).alias("flag"))
        .distinct()
        .select(
            F.lit(1).alias("c_hlevel"),
            F.concat(F.lit("\\AKTIN\\"), F.col("flag"), F.lit("\\")).alias("c_fullname"),
            F.concat(F.lit("Folder "), F.col("flag")).alias("c_name"),
            F.lit(None).cast("string").alias("c_basecode"),
            F.lit("FA").alias("c_visualattributes"),
        )
    )
    return leaves.unionByName(flags)


def clinical_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        "patient_dimension": patient_dimension(spark, sf_dir),
        "visit_dimension": visit_dimension(spark, sf_dir),
        "observation_fact": observation_fact(spark, sf_dir),
        "concept_dimension": concept_dimension(spark, sf_dir),
        "ontology": ontology(spark, sf_dir),
    }


# DuckDB-runnable CTE bodies of the same derivations (oracle parity).
CLINICAL_ORACLE_CTES = {
    "patient_dimension": """
        SELECT c_custkey AS patient_num,
               DATE '1940-01-01' + CAST(c_custkey % 21915 AS INT) AS birth_date,
               CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'F'
                    WHEN 1 THEN 'M' ELSE 'U' END AS sex_cd,
               'N' AS vital_status_cd,
               lpad(CAST(c_custkey % 99999 AS STRING), 5, '0') AS zip_cd
        FROM customer""",
    "visit_dimension": """
        SELECT o_orderkey AS encounter_num, o_custkey AS patient_num,
               o_orderdate AS start_date,
               o_orderdate + INTERVAL 1 HOUR * (4 + CAST(o_orderkey % 20 AS INT)) AS end_date,
               CASE WHEN o_orderkey % 10 < 2 THEN 'I' ELSE 'O' END AS inout_cd,
               o_orderpriority AS location_cd
        FROM orders""",
    "observation_fact": """
        SELECT l_orderkey AS encounter_num, o_custkey AS patient_num,
               'AKTIN:' || l_returnflag || ':' || CAST(l_partkey % 50 AS STRING) AS concept_cd,
               CAST(l_suppkey % 100 AS STRING) AS provider_id,
               l_shipdate AS start_date, '@' AS modifier_cd,
               l_linenumber AS instance_num,
               CASE WHEN l_partkey % 3 = 0 THEN 'N' ELSE 'T' END AS valtype_cd,
               CASE WHEN l_partkey % 3 <> 0 THEN l_linestatus END AS tval_char,
               CASE WHEN l_partkey % 3 = 0 THEN CAST(l_quantity AS DECIMAL(18,5)) END AS nval_num,
               '1' AS units_cd, l_shipdate AS end_date
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "concept_dimension": """
        SELECT concept_path, concept_cd, 'Concept ' || concept_cd AS name_char
        FROM (SELECT DISTINCT
                '\\AKTIN\\' || l_returnflag || '\\' || CAST(l_partkey % 50 AS STRING) || '\\' AS concept_path,
                'AKTIN:' || l_returnflag || ':' || CAST(l_partkey % 50 AS STRING) AS concept_cd
              FROM lineitem)""",
    "ontology": """
        SELECT 2 AS c_hlevel, concept_path AS c_fullname,
               'Concept ' || concept_cd AS c_name, concept_cd AS c_basecode,
               'LA' AS c_visualattributes
        FROM (SELECT DISTINCT
                '\\AKTIN\\' || l_returnflag || '\\' || CAST(l_partkey % 50 AS STRING) || '\\' AS concept_path,
                'AKTIN:' || l_returnflag || ':' || CAST(l_partkey % 50 AS STRING) AS concept_cd
              FROM lineitem)
        UNION ALL
        SELECT 1, '\\AKTIN\\' || flag || '\\', 'Folder ' || flag, NULL, 'FA'
        FROM (SELECT DISTINCT l_returnflag AS flag FROM lineitem)""",
}


def clinical_with_clause(names: tuple[str, ...]) -> str:
    """WITH-clause prefix for oracle SQL that needs clinical tables."""
    parts = [f"{n} AS ({CLINICAL_ORACLE_CTES[n]})" for n in names]
    return "WITH " + ",\n".join(parts) + "\n"
