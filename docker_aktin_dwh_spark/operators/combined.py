"""Consolidated declared queries — one key per SURVEY.md §2 *family*.

The correctness driver hash-checks the first 50 registry keys
(CORRECTNESS_r01 covered exactly positions 1-50), so every §2 row needs
a representative inside that window.  These keys consolidate the
fine-grained per-operator queries (which remain in the registry after
position 50 and stay locally oracle-tested) into family queries that
exercise every row's semantics:

- tagged unions for selection-shaped families (filters, semi/anti/
  cross/self joins, set ops, cohort panels) — every branch keeps full
  value-level verification, only re-shaped to a common (tag, v) schema;
- multi-column single-pass projections/aggregations for function and
  window families — the shape a real engine runs anyway (one scan,
  many expressions), and the 100 TB-friendly one.

Each key's docstring names the §2 rows it certifies.  Legacy key
parity: every branch/column reuses the same expressions as the
fine-grained key it absorbs (same determinism policy: decimal-routed
money sums, rounded doubles, sorted collects).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.determinism import davg, dsum, sql_davg, sql_dsum
from ..registry import QuerySpec
from . import cohort, multimodal, relational, textops

T = catalog.load


def _tag(df, tag: str, v) -> "F.DataFrame":
    return df.select(F.lit(tag).alias("tag"), v.alias("v"))


# ------------------------------------------------------------ FLT + SMP family

def flt_all(spark, sf):
    """FLT-01..07 + SMP-01 in one tagged union: equality, numeric
    range, date range, prefix LIKE, IN-list, NULL predicate, boolean
    combination, deterministic hash sample.  Branches reuse the legacy
    builders verbatim (flt_01..flt_07, smp_01) — each predicate still
    pushes down to its scan (tests/test_plans.py)."""
    R = relational
    out = _tag(R.flt_01(spark, sf), "f1",
               F.concat_ws("-", "l_orderkey", "l_linenumber"))
    out = out.unionByName(_tag(R.flt_02(spark, sf), "f2",
                               F.col("p_partkey").cast("string")))
    out = out.unionByName(_tag(R.flt_03(spark, sf), "f3",
                               F.col("n").cast("string")))
    out = out.unionByName(_tag(R.flt_04(spark, sf), "f4",
                               F.col("p_partkey").cast("string")))
    out = out.unionByName(_tag(R.flt_05(spark, sf), "f5", F.col("n_name")))
    out = out.unionByName(_tag(R.flt_06(spark, sf), "f6",
                               F.col("n").cast("string")))
    out = out.unionByName(_tag(R.flt_07(spark, sf), "f7",
                               F.col("o_orderkey").cast("string")))
    out = out.unionByName(_tag(R.smp_01(spark, sf), "smp",
                               F.concat_ws("|", "o_orderstatus", "n")))
    return out.orderBy("tag", "v")


def _flt_all_oracle() -> str:
    O = relational._ORACLES
    branches = [
        ("f1", "CAST(l_orderkey AS STRING) || '-' || CAST(l_linenumber AS STRING)",
         O["flt_01"]),
        ("f2", "CAST(p_partkey AS STRING)", O["flt_02"]),
        ("f3", "CAST(n AS STRING)", O["flt_03"]),
        ("f4", "CAST(p_partkey AS STRING)", O["flt_04"]),
        ("f5", "n_name", O["flt_05"]),
        ("f6", "CAST(n AS STRING)", O["flt_06"]),
        ("f7", "CAST(o_orderkey AS STRING)", O["flt_07"]),
        ("smp", "o_orderstatus || '|' || CAST(n AS STRING)", O["smp_01"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------------------------- JN family

def jn_misc(spark, sf):
    """JN-04 left-outer + JN-05 semi + JN-06 anti + JN-07 self + JN-10
    cross as a tagged union (the remaining join kinds after
    jn_03/jn_08/jn_09).  Branches reuse jn_04/05/06/07/10 verbatim.
    (jn_04 was folded in in round 6 to free a driver-window slot for
    llm_all; it stays a fine-grained post-50 key.)"""
    R = relational
    out = _tag(R.jn_05(spark, sf), "semi", F.col("c_custkey").cast("string"))
    out = out.unionByName(_tag(
        R.jn_04(spark, sf), "louter",
        F.concat_ws("-", "c_custkey", "n")))
    out = out.unionByName(_tag(R.jn_06(spark, sf), "anti",
                               F.col("c_custkey").cast("string")))
    out = out.unionByName(_tag(
        R.jn_07(spark, sf), "self",
        F.concat_ws("-", "l_orderkey", "l_linenumber", "other")))
    out = out.unionByName(_tag(R.jn_10(spark, sf), "cross",
                               F.concat_ws("|", "r_name", "o_orderpriority")))
    return out.orderBy("tag", "v")


def _jn_misc_oracle() -> str:
    O = relational._ORACLES
    branches = [
        ("semi", "CAST(c_custkey AS STRING)", O["jn_05"]),
        ("louter", "CAST(c_custkey AS STRING) || '-' || CAST(n AS STRING)",
         O["jn_04"]),
        ("anti", "CAST(c_custkey AS STRING)", O["jn_06"]),
        ("self", "CAST(l_orderkey AS STRING) || '-' || "
                 "CAST(l_linenumber AS STRING) || '-' || CAST(other AS STRING)",
         O["jn_07"]),
        ("cross", "r_name || '|' || o_orderpriority", O["jn_10"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------------------------ AGG family

def agg_core(spark, sf):
    """AGG-01/02/04/05/08/09/10 in one grouped pass over lineitem:
    count, count distinct, decimal-routed sum/avg, min/max, exact
    median, conditional aggregation (EAV shape), HAVING, sorted
    collect.  One hash agg, map-side combine — the single-pass shape a
    report engine wants at 100 TB."""
    l = T(spark, sf, "lineitem")
    cond = F.when(l.l_returnflag == "R", l.l_extendedprice) \
            .otherwise(F.lit(0.0)).cast("decimal(18,4)")
    return (l.groupBy("l_returnflag", "l_linestatus")
             .agg(F.count("*").alias("n"),
                  F.countDistinct("l_orderkey").alias("nd"),
                  dsum("l_quantity").alias("s"),
                  davg("l_extendedprice").alias("a"),
                  F.min("l_shipdate").alias("mn"),
                  F.max("l_shipdate").alias("mx"),
                  F.round(F.percentile("l_quantity", 0.5), 2).alias("med"),
                  F.round(F.sum(cond), 2).cast("double").alias("r_rev"),
                  F.array_join(F.array_sort(
                      F.collect_set(l.l_linenumber.cast("string"))), ",")
                   .alias("lis"))
             .filter(F.col("n") >= 10)
             .orderBy("l_returnflag", "l_linestatus"))


_AGG_CORE_ORACLE = (
    "SELECT l_returnflag, l_linestatus, count(*) AS n, "
    "count(DISTINCT l_orderkey) AS nd, "
    f"{sql_dsum('l_quantity')} AS s, {sql_davg('l_extendedprice')} AS a, "
    "MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx, "
    "ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) "
    "AS DOUBLE), 2) AS med, "
    "CAST(ROUND(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice "
    "ELSE 0.0 END AS DECIMAL(18,4))), 2) AS DOUBLE) AS r_rev, "
    "array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS STRING))), "
    "',') AS lis "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus "
    "HAVING count(*) >= 10")


def agg_olap(spark, sf):
    """AGG-06 histogram + AGG-07 rollup/cube subtotal lattice: CUBE over
    (status, price bin) — the bin-level slice IS the histogram, the
    lattice IS the report subtotals (grouping sets are what CUBE
    expands to)."""
    o = T(spark, sf, "orders")
    bin_ = F.floor(o.o_totalprice / 50000).cast("int").alias("bin")
    return (o.cube(o.o_orderstatus, bin_)
             .agg(F.count("*").alias("n"))
             .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("s"),
                     F.coalesce("bin", F.lit(-1)).alias("b"), "n")
             .orderBy("s", "b"))


_AGG_OLAP_ORACLE = (
    "SELECT COALESCE(o_orderstatus, 'ALL') AS s, COALESCE(bin, -1) AS b, "
    "count(*) AS n FROM (SELECT o_orderstatus, "
    "CAST(FLOOR(o_totalprice / 50000) AS INT) AS bin FROM orders) "
    "GROUP BY CUBE(o_orderstatus, bin)")


# ------------------------------------------------------------ WIN + SRT family

def win_all(spark, sf):
    """WIN-01..06 + SRT-01/02 in one windowed pass over orders
    (custkey < 150): row_number, lag-datediff, running decimal sum
    (rows frame), ntile, percent_rank, cume_dist, last-per-group
    (full-frame last_value), finished by a multi-key DESC sort +
    LIMIT top-k.

    SRT-01's full nulls contract (SURVEY §2.6) is the leading sort key:
    ``d`` is NULL on every partition's first row, and ``DESC NULLS
    LAST`` over it decides which rows survive the LIMIT — so the
    null-ordering semantics are hash-observable in the driver compare,
    not just cosmetic row order."""
    o = T(spark, sf, "orders").filter(F.col("o_custkey") < 150)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (o.select(
                "o_custkey", "o_orderkey", F.col("o_totalprice").alias("tp"),
                F.row_number().over(w).alias("rn"),
                F.datediff(o.o_orderdate, F.lag("o_orderdate").over(w))
                 .alias("d"),
                F.round(F.sum(o.o_totalprice.cast("decimal(18,2)")).over(wcum),
                        2).cast("double").alias("run"),
                F.ntile(4).over(w).alias("nt"),
                F.round(F.percent_rank().over(w), 6).alias("pr"),
                F.round(F.cume_dist().over(w), 6).alias("cd"),
                F.last("o_orderstatus").over(wall).alias("le"))
             .orderBy(F.col("d").desc_nulls_last(), F.desc("tp"),
                      F.asc("o_orderkey")).limit(500))


_WIN_ALL_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice AS tp,
         CAST(row_number() OVER w AS INT) AS rn,
         CAST(CAST(o_orderdate AS DATE) - CAST(lag(o_orderdate) OVER w AS DATE)
              AS INT) AS d,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS run,
         CAST(ntile(4) OVER w AS INT) AS nt,
         ROUND(percent_rank() OVER w, 6) AS pr,
         ROUND(cume_dist() OVER w, 6) AS cd,
         last_value(o_orderstatus) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS le
  FROM orders WHERE o_custkey < 150
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
ORDER BY d DESC NULLS LAST, tp DESC, o_orderkey LIMIT 500
"""


# ------------------------------------------------------------------ SET family

def set_all(spark, sf):
    """SET-01..05 tagged union: union all / union distinct / intersect /
    except / distinct.  Branches reuse set_01..set_05 verbatim."""
    R = relational
    out = _tag(R.set_01(spark, sf), "ua", F.col("k").cast("string"))
    out = out.unionByName(_tag(R.set_02(spark, sf), "ud",
                               F.col("k").cast("string")))
    out = out.unionByName(_tag(R.set_03(spark, sf), "ix",
                               F.col("o_custkey").cast("string")))
    out = out.unionByName(_tag(R.set_04(spark, sf), "ex",
                               F.col("c_custkey").cast("string")))
    out = out.unionByName(_tag(R.set_05(spark, sf), "di",
                               F.col("o_orderpriority")))
    return out.orderBy("tag", "v")


def _set_all_oracle() -> str:
    O = relational._ORACLES
    branches = [
        ("ua", "CAST(k AS STRING)", O["set_01"]),
        ("ud", "CAST(k AS STRING)", O["set_02"]),
        ("ix", "CAST(o_custkey AS STRING)", O["set_03"]),
        ("ex", "CAST(c_custkey AS STRING)", O["set_04"]),
        ("di", "o_orderpriority", O["set_05"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------------------------- FN family

def fn_pl(spark, sf):
    """FN-STR + FN-ARR + FN-MATH + FN-CAST in one projection over
    lineitem ⋈ broadcast(part): string surface on p_name/p_type/p_brand,
    array surface on split p_type, exact-decimal arithmetic and casts on
    the lineitem measures.  Same expressions as fn_str/fn_arr/fn_math/
    fn_cast, one scan + one broadcast."""
    l = T(spark, sf, "lineitem")
    p = T(spark, sf, "part")
    arr = F.split("p_type", " ")
    net = F.round(
        l.l_extendedprice.cast("decimal(18,2)")
        * (1 - l.l_discount.cast("decimal(8,2)"))
        * (1 + l.l_tax.cast("decimal(8,2)")), 2).cast("double")
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .select(
                "l_orderkey", "l_linenumber",
                # FN-STR
                F.upper(F.substring("p_name", 1, 5)).alias("u"),
                F.length("p_name").alias("sl"),
                F.lower(F.trim("p_type")).alias("lo"),
                F.concat("p_brand", F.lit("/"), "p_type").alias("cc"),
                F.replace("p_name", F.lit(" "), F.lit("_")).alias("rep"),
                F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("plz"),
                F.regexp_extract("p_name", "^[a-z]+", 0).alias("w1"),
                # FN-ARR
                F.size(arr).alias("k"),
                F.array_contains(arr, "BRUSHED").cast("int").alias("has_b"),
                F.array_join(F.array_sort(arr), "-").alias("sorted_j"),
                F.size(F.flatten(F.array(arr, arr))).alias("k2"),
                # FN-MATH
                net.alias("net"),
                F.floor("l_quantity").cast("long").alias("fq"),
                F.ceil("l_quantity").cast("long").alias("ce"),
                F.abs(F.col("l_linenumber") - 3).alias("ab"),
                F.signum(F.col("l_linenumber") - 3).cast("int").alias("sg"),
                (F.col("l_orderkey") % 7).alias("md"),
                F.round(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
                F.round(F.sqrt("l_quantity"), 4).alias("sq"),
                F.round(F.log("l_extendedprice"), 4).alias("lg"),
                # FN-CAST
                l.l_quantity.cast("int").alias("q"),
                l.l_quantity.cast("int").cast("string").alias("qs"))
             .orderBy("l_orderkey", "l_linenumber").limit(120))


_FN_PL_ORACLE = """
SELECT l_orderkey, l_linenumber,
       upper(substr(p_name, 1, 5)) AS u, CAST(length(p_name) AS INT) AS sl,
       lower(trim(p_type)) AS lo, p_brand || '/' || p_type AS cc,
       replace(p_name, ' ', '_') AS rep,
       lpad(CAST(p_partkey AS STRING), 8, '0') AS plz,
       COALESCE(regexp_extract(p_name, '^[a-z]+', 0), '') AS w1,
       CAST(len(t) AS INT) AS k,
       CAST(list_contains(t, 'BRUSHED') AS INT) AS has_b,
       array_to_string(list_sort(t), '-') AS sorted_j,
       CAST(len(flatten([t, t])) AS INT) AS k2,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(8,2)))
            * (1 + CAST(l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS net,
       CAST(floor(l_quantity) AS BIGINT) AS fq,
       CAST(ceil(l_quantity) AS BIGINT) AS ce,
       abs(l_linenumber - 3) AS ab,
       CAST(sign(l_linenumber - 3) AS INT) AS sg,
       l_orderkey % 7 AS md,
       ROUND(pow(l_quantity, 2), 2) AS p2,
       ROUND(sqrt(l_quantity), 4) AS sq,
       ROUND(ln(l_extendedprice), 4) AS lg,
       CAST(l_quantity AS INT) AS q,
       CAST(CAST(l_quantity AS INT) AS STRING) AS qs
FROM (SELECT *, string_split(p_type, ' ') AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey)
ORDER BY l_orderkey, l_linenumber LIMIT 120
"""


def fn_ord(spark, sf):
    """FN-COND + FN-DT + FN-HASH + PRJ-02 computed projection over
    orders: CASE/coalesce/nullif/greatest/least, calendar functions,
    sha-256 pseudonymization, exact-decimal VAT."""
    o = T(spark, sf, "orders")
    b = (F.when(o.o_totalprice > 200000, "hi")
          .when(o.o_totalprice > 100000, "mid")
          .otherwise("lo"))
    vat = F.round(o.o_totalprice.cast("decimal(18,2)")
                  * F.expr("CAST(0.19 AS DECIMAL(3,2))"), 2).cast("double")
    return (o.select(
                "o_orderkey", b.alias("b"),
                F.coalesce(F.nullif("o_orderstatus", F.lit("O")),
                           F.lit("open")).alias("co"),
                F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2)
                 .alias("gx"),
                F.round(F.least("o_totalprice", F.lit(150000.0)), 2)
                 .alias("lx"),
                F.year("o_orderdate").alias("y"),
                F.month("o_orderdate").alias("m"),
                F.dayofmonth("o_orderdate").alias("d"),
                F.date_trunc("month", "o_orderdate").alias("m0"),
                (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
                 .alias("plus30"),
                F.datediff(F.col("o_orderdate"),
                           F.lit("1995-01-01").cast("date")).alias("dsince"),
                vat.alias("vat"),
                F.sha2(F.col("o_orderkey").cast("string"), 256).alias("h"))
             .orderBy("o_orderkey").limit(100))


_FN_ORD_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'hi'
            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'lo' END AS b,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS co,
       ROUND(GREATEST(o_totalprice, 150000.0), 2) AS gx,
       ROUND(LEAST(o_totalprice, 150000.0), 2) AS lx,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m0,
       o_orderdate + INTERVAL 30 DAY AS plus30,
       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS dsince,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
            * CAST(0.19 AS DECIMAL(3,2)), 2) AS DOUBLE) AS vat,
       sha256(CAST(o_orderkey AS STRING)) AS h
FROM orders ORDER BY o_orderkey LIMIT 100
"""


def fn_ev(spark, sf):
    """FN-DT2 (time-of-day / parse / epoch) + FN-MAP + FN-JSON over the
    events stream in one projection (timezone-free on NTZ — session
    zone pinned UTC, session.py)."""
    e = T(spark, sf, "events")
    m = F.from_json(e.props, "map<string,string>")
    st = F.from_json("props", "struct<k:int>")
    return (e.select(
                "event_id",
                F.hour("ts").alias("h"),
                F.minute("ts").alias("mi"),
                F.second("ts").alias("s"),
                (F.unix_timestamp(F.col("ts").cast("timestamp"))
                 - F.unix_timestamp(F.date_trunc("day", "ts")
                                    .cast("timestamp"))).alias("sod"),
                F.to_timestamp_ntz(
                    F.date_format("ts", "yyyy-MM-dd HH:mm")).alias("pt"),
                F.to_date("ts").cast("string").alias("dt"),
                F.months_between(F.date_trunc("month", "ts"),
                                 F.lit("2023-06-01").cast("timestamp"))
                 .cast("int").alias("mb"),
                F.array_join(F.map_keys(m), ",").alias("ks"),
                F.element_at(m, "k").alias("mv"),
                F.get_json_object("props", "$.k").alias("v"),
                st.getField("k").alias("kv"),
                (st.getField("k") * 2).alias("kv2"))
             .orderBy("event_id").limit(200))


_FN_EV_ORACLE = """
SELECT event_id, CAST(hour(ts) AS INT) AS h, CAST(minute(ts) AS INT) AS mi,
       CAST(second(ts) AS INT) AS s,
       CAST(epoch(date_trunc('second', ts))
            - epoch(date_trunc('day', ts)) AS BIGINT) AS sod,
       strptime(strftime(ts, '%Y-%m-%d %H:%M'), '%Y-%m-%d %H:%M') AS pt,
       CAST(CAST(ts AS DATE) AS STRING) AS dt,
       CAST(datediff('month', TIMESTAMP '2023-06-01',
                     date_trunc('month', ts)) AS INT) AS mb,
       array_to_string(json_keys(props), ',') AS ks,
       json_extract_string(props, '$.k') AS mv,
       json_extract_string(props, '$.k') AS v,
       CAST(json_extract(props, '$.k') AS INT) AS kv,
       CAST(json_extract(props, '$.k') AS INT) * 2 AS kv2
FROM events ORDER BY event_id LIMIT 200
"""


def var_01(spark, sf):
    """FN-VARIANT (r12 extension): Spark 4's VariantType as the
    schema-on-read path for semi-structured event payloads — the OPEN
    half of FN-JSON's fixed-schema from_json.  A nested JSON document
    is built per event (type + integer-scaled value + the raw props
    object embedded verbatim + a tags array), parsed ONCE with
    ``parse_json`` into a variant, and every downstream extraction is
    a typed ``variant_get`` path (nested object, embedded-object
    field, array index) — the binary variant encoding makes repeated
    path access O(path) instead of re-parsing text, which is the
    100 TB telemetry-scan argument for the type.  ``try_variant_get``
    pins the coercion contract (a non-numeric string under a bigint
    target yields NULL, counted 0).  Floats enter the JSON as
    FLOOR(value·100) BIGINTs so the document bytes are bit-identical
    on both engines; the DuckDB oracle builds the same string and
    extracts with json_extract.  Reference analogue: JSONB columns a
    Postgres telemetry table would query with ``->``/``->>``."""
    e = T(spark, sf, "events")
    vint = F.floor(F.col("value") * 100).cast("long")
    jstr = F.concat(
        F.lit('{"meta":{"t":"'), F.col("event_type"), F.lit('","v":'),
        vint.cast("string"), F.lit('},"props":'), F.col("props"),
        F.lit(',"tags":['), (F.col("user_id") % 5).cast("string"),
        F.lit(','), (F.col("event_id") % 7).cast("string"),
        F.lit(']}'))
    v = F.parse_json(jstr)
    d = e.select(
        F.variant_get(v, "$.meta.t", "string").alias("mtype"),
        F.variant_get(v, "$.props.k", "bigint").alias("k"),
        F.variant_get(v, "$.tags[0]", "bigint").alias("t0"),
        F.variant_get(v, "$.meta.v", "bigint").alias("mv"),
        F.try_variant_get(v, "$.meta.t", "bigint").alias("bad"))
    return (d.groupBy("mtype")
             .agg(F.count("*").alias("n"),
                  F.sum("k").alias("sum_k"),
                  F.sum("t0").alias("sum_t0"),
                  F.sum("mv").alias("sum_mv"),
                  F.count("bad").alias("n_coerced"))
             .orderBy("mtype"))


_VAR_01_ORACLE = """
WITH j AS (SELECT '{"meta":{"t":"' || event_type || '","v":' ||
  CAST(CAST(FLOOR(value*100) AS BIGINT) AS VARCHAR) || '},"props":'
  || props || ',"tags":[' || CAST(user_id % 5 AS VARCHAR) || ','
  || CAST(event_id % 7 AS VARCHAR) || ']}' AS js
  FROM events),
x AS (SELECT js->>'$.meta.t' AS mtype,
             CAST(js->>'$.props.k' AS BIGINT) AS k,
             CAST(js->>'$.tags[0]' AS BIGINT) AS t0,
             CAST(js->>'$.meta.v' AS BIGINT) AS mv,
             TRY_CAST(js->>'$.meta.t' AS BIGINT) AS bad
      FROM j)
SELECT mtype, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(t0) AS BIGINT) AS sum_t0,
       CAST(sum(mv) AS BIGINT) AS sum_mv,
       CAST(count(bad) AS BIGINT) AS n_coerced
FROM x GROUP BY mtype ORDER BY mtype
"""


def var_02(spark, sf):
    """Variant SHREDDING (r13, VERDICT r12 item 5 — the storage half
    of the schema-on-read story; var_01 is the compute half): the
    var_01 documents are parsed once and WRITTEN with
    sources/varshred.write_shredded — typed subcolumns for
    ``$.meta.t`` / ``$.meta.v`` / ``$.props.k`` (the Parquet
    variant-shredding spec's typed_value lane, via try_variant_get so
    a type mismatch lands NULL + residual, never a lossy cast) beside
    the full variant residual — then every arm reads back from the
    SHREDDED parquet:

    - ``agg``: the var_01 aggregate where the three shredded paths
      come from typed parquet columns (no variant decode) and the
      un-shredded ``$.tags[0]`` falls back through the residual lane;
    - ``flt``: a filter on the shredded ``meta.v`` column — a REAL
      typed column, so the predicate reaches the scan as a parquet
      pushdown (plan-asserted in tests);
    - ``chk``: the reconstruction certificate — per-path count of
      rows where the typed column disagrees with extracting the same
      path from the residual; the oracle pins 0, so the hash FAILS if
      shredding ever diverges from the variant.

    Reference analogue: a JSONB column materialized into typed
    expression-index columns on stock Postgres."""
    import shutil
    import tempfile

    from ..sources import varshred

    e = T(spark, sf, "events")
    vint = F.floor(F.col("value") * 100).cast("long")
    jstr = F.concat(
        F.lit('{"meta":{"t":"'), F.col("event_type"), F.lit('","v":'),
        vint.cast("string"), F.lit('},"props":'), F.col("props"),
        F.lit(',"tags":['), (F.col("user_id") % 5).cast("string"),
        F.lit(','), (F.col("event_id") % 7).cast("string"),
        F.lit(']}'))
    tmp = tempfile.mkdtemp(prefix="spark_var02_")
    try:
        path = tmp + "/t"
        varshred.write_shredded(
            e.select(F.parse_json(jstr).alias("v")), "v",
            {"$.meta.t": "string", "$.meta.v": "bigint",
             "$.props.k": "bigint"}, path)
        s = varshred.read_shredded(spark, path)
        P = lambda p, t: varshred.path_col(s, p, t)     # noqa: E731
        agg = (s.select(P("$.meta.t", "string").alias("mtype"),
                        P("$.props.k", "bigint").alias("k"),
                        P("$.tags[0]", "bigint").alias("t0"),
                        P("$.meta.v", "bigint").alias("mv"))
               .groupBy("mtype")
               .agg(F.count("*").alias("n"),
                    F.sum("k").alias("sum_k"),
                    F.sum("t0").alias("sum_t0"),
                    F.sum("mv").alias("sum_mv"))
               .select(F.lit("agg").alias("arm"), "mtype", "n",
                       "sum_k", "sum_t0", "sum_mv"))
        flt = (s.filter(F.col(varshred.shred_name("$.meta.v")) >= 500)
               .agg(F.count("*").alias("n"),
                    F.sum(P("$.props.k", "bigint")).alias("sum_k"),
                    F.sum(P("$.meta.v", "bigint")).alias("sum_mv"))
               .select(F.lit("flt").alias("arm"),
                       F.lit("*").alias("mtype"), "n", "sum_k",
                       F.lit(0).cast("long").alias("sum_t0"),
                       "sum_mv"))
        mism = lambda p, t: F.sum(                      # noqa: E731
            (~F.col(varshred.shred_name(p)).eqNullSafe(
                F.variant_get(F.col(varshred.RESIDUAL), p, t)))
            .cast("long"))
        chk = (s.agg(mism("$.meta.t", "string").alias("n"),
                     mism("$.meta.v", "bigint").alias("sum_k"),
                     mism("$.props.k", "bigint").alias("sum_t0"))
               .select(F.lit("chk").alias("arm"),
                       F.lit("*").alias("mtype"), "n", "sum_k",
                       "sum_t0", F.lit(0).cast("long").alias("sum_mv")))
        out = agg.unionByName(flt).unionByName(chk)
        from ..functions.barrier import materialize
        try:
            return materialize(out).orderBy("arm", "mtype")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


_VAR_02_ORACLE = """
WITH j AS (SELECT '{"meta":{"t":"' || event_type || '","v":' ||
  CAST(CAST(FLOOR(value*100) AS BIGINT) AS VARCHAR) || '},"props":'
  || props || ',"tags":[' || CAST(user_id % 5 AS VARCHAR) || ','
  || CAST(event_id % 7 AS VARCHAR) || ']}' AS js
  FROM events),
x AS (SELECT js->>'$.meta.t' AS mtype,
             CAST(js->>'$.props.k' AS BIGINT) AS k,
             CAST(js->>'$.tags[0]' AS BIGINT) AS t0,
             CAST(js->>'$.meta.v' AS BIGINT) AS mv
      FROM j)
SELECT 'agg' AS arm, mtype, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(t0) AS BIGINT) AS sum_t0,
       CAST(sum(mv) AS BIGINT) AS sum_mv
FROM x GROUP BY mtype
UNION ALL
SELECT 'flt' AS arm, '*' AS mtype, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k, CAST(0 AS BIGINT) AS sum_t0,
       CAST(sum(mv) AS BIGINT) AS sum_mv
FROM x WHERE mv >= 500
UNION ALL
SELECT 'chk' AS arm, '*' AS mtype, CAST(0 AS BIGINT) AS n,
       CAST(0 AS BIGINT) AS sum_k, CAST(0 AS BIGINT) AS sum_t0,
       CAST(0 AS BIGINT) AS sum_mv
"""


# ------------------------------------------------------ STR batch equivalents

def str_tw(spark, sf):
    """STR-02 tumbling + STR-03 sliding window counts, tagged
    (streaming forms in streaming/windows.py; replay equivalence in
    tests/test_streaming.py)."""
    R = relational
    t = R.str_02(spark, sf).select(F.lit("tumble").alias("kind"), "ws", "n")
    s = R.str_03(spark, sf).select(F.lit("slide").alias("kind"), "ws", "n")
    return t.unionByName(s).orderBy("kind", "ws")


def _str_tw_oracle() -> str:
    O = relational._ORACLES
    return (f"SELECT 'tumble' AS kind, ws, n FROM ({O['str_02']})\n"
            f"UNION ALL\nSELECT 'slide' AS kind, ws, n FROM ({O['str_03']})")


def str_sd(spark, sf):
    """STR-04 session windows + STR-06 streaming dedup as one tagged
    union (batch forms; streaming forms in streaming/windows.py with
    replay equivalence in tests/test_streaming.py).  Branches reuse
    str_04/str_06 verbatim — folded to free CORE50 slots for the
    streaming-native str_01/str_05 keys (operators/streamnative.py)."""
    R = relational
    out = _tag(R.str_04(spark, sf), "sess",
               F.concat_ws("|", "user_id", "sess_seq",
                           F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss"),
                           "n_events"))
    out = out.unionByName(_tag(R.str_06(spark, sf), "dedup",
                               F.concat_ws("|", "user_id", "event_type",
                                           "event_id")))
    return out.orderBy("tag", "v")


def _str_sd_oracle() -> str:
    O = relational._ORACLES
    sess_v = ("CAST(user_id AS STRING) || '|' || CAST(sess_seq AS STRING) "
              "|| '|' || strftime(sess_start, '%Y-%m-%d %H:%M:%S') "
              "|| '|' || CAST(n_events AS STRING)")
    ded_v = ("CAST(user_id AS STRING) || '|' || event_type || '|' || "
             "CAST(event_id AS STRING)")
    return (f"SELECT 'sess' AS tag, {sess_v} AS v FROM ({O['str_04']})\n"
            f"UNION ALL\nSELECT 'dedup' AS tag, {ded_v} AS v "
            f"FROM ({O['str_06']})")


def str_win(spark, sf):
    """STR-02/03/04/06 in ONE tagged union (tumble + slide + session +
    dedup, batch forms; streaming forms in streaming/windows.py with
    replay equivalence tested).  Round-6 consolidation of str_tw +
    str_sd — the fine-grained keys stay post-50 — freeing a CORE50
    slot for maint_all so the maintenance/federation family is
    driver-certified too."""
    R = relational
    out = _tag(R.str_02(spark, sf), "tumble",
               F.concat_ws("|", F.date_format("ws", "yyyy-MM-dd HH:mm:ss"),
                           "n"))
    out = out.unionByName(_tag(
        R.str_03(spark, sf), "slide",
        F.concat_ws("|", F.date_format("ws", "yyyy-MM-dd HH:mm:ss"), "n")))
    out = out.unionByName(_tag(
        R.str_04(spark, sf), "sess",
        F.concat_ws("|", "user_id", "sess_seq",
                    F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss"),
                    "n_events")))
    out = out.unionByName(_tag(
        R.str_06(spark, sf), "dedup",
        F.concat_ws("|", "user_id", "event_type", "event_id")))
    return out.orderBy("tag", "v")


def _str_win_oracle() -> str:
    O = relational._ORACLES
    win_v = "strftime(ws, '%Y-%m-%d %H:%M:%S') || '|' || CAST(n AS STRING)"
    sess_v = ("CAST(user_id AS STRING) || '|' || CAST(sess_seq AS STRING) "
              "|| '|' || strftime(sess_start, '%Y-%m-%d %H:%M:%S') "
              "|| '|' || CAST(n_events AS STRING)")
    ded_v = ("CAST(user_id AS STRING) || '|' || event_type || '|' || "
             "CAST(event_id AS STRING)")
    return (f"SELECT 'tumble' AS tag, {win_v} AS v FROM ({O['str_02']})\n"
            f"UNION ALL\nSELECT 'slide' AS tag, {win_v} AS v "
            f"FROM ({O['str_03']})\n"
            f"UNION ALL\nSELECT 'sess' AS tag, {sess_v} AS v "
            f"FROM ({O['str_04']})\n"
            f"UNION ALL\nSELECT 'dedup' AS tag, {ded_v} AS v "
            f"FROM ({O['str_06']})")


# ------------------------------------------------- maintenance family

def maint_all(spark, sf):
    """The round-6 maintenance/federation family in one tagged union so
    the driver window hash-certifies all of it: CDC snapshot diff,
    SCD2 history, layout roundtrip, data-quality audit, rollup merge,
    federated HLL distinct, heavy hitters, and the bigram-LM gate.
    Branches reuse the fine-grained builders verbatim
    (operators/maintenance.py, cohort.py, textops.py).  Doubles are
    folded as ROUND(x·10^k) bigints and NULLs coalesced to literals so
    the string rendering is engine-independent."""
    from . import cohort, maintenance, textops as tx
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = _tag(maintenance.cdc_01(spark, sf), "cdc",
               F.concat_ws("|", "o_orderkey", "op"))
    out = out.unionByName(_tag(
        maintenance.scd_01(spark, sf), "scd",
        F.concat_ws("|", "o_orderkey", cents, "o_orderstatus",
                    "valid_from", F.coalesce("valid_to", F.lit("open")))))
    out = out.unionByName(_tag(
        maintenance.lay_01(spark, sf), "lay",
        F.concat_ws("|", "source", "n_docs", "chars", "min_doc",
                    "max_doc")))
    out = out.unionByName(_tag(
        maintenance.dq_01(spark, sf), "dq",
        F.concat_ws("|", "check_name", "violations",
                    F.col("passed").cast("string"))))
    out = out.unionByName(_tag(
        maintenance.rollup_01(spark, sf), "rollup",
        F.concat_ws("|", "m", "n", F.round(F.col("rev") * 100)
                    .cast("long"))))
    out = out.unionByName(_tag(
        cohort.fed_hll(spark, sf), "fedhll",
        F.concat_ws("|", "o_orderstatus", "exact_patients", "n_sites",
                    F.col("within_bound").cast("string"))))
    out = out.unionByName(_tag(
        tx.hh_01(spark, sf), "hh",
        F.concat_ws("|", "t", "c",
                    F.round(F.col("rel_freq") * 1000000).cast("long"))))
    out = out.unionByName(_tag(
        tx.lm_01(spark, sf), "lm",
        F.concat_ws("|", "doc_id", "n_bigrams", "n_rare",
                    "min_bg_count")))
    return out.orderBy("tag", "v")


def _maint_all_oracle() -> str:
    from . import cohort, maintenance, textops as tx

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    MO = maintenance._ORACLES
    branches = [
        ("cdc", cat("o_orderkey", "op"), MO["cdc_01"]),
        ("scd", cat("o_orderkey",
                    "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
                    "o_orderstatus", "valid_from",
                    "COALESCE(valid_to, 'open')"), MO["scd_01"]),
        ("lay", cat("source", "n_docs", "chars", "min_doc", "max_doc"),
         MO["lay_01"]),
        ("dq", cat("check_name", "violations", "passed"), MO["dq_01"]),
        ("rollup", cat("m", "n", "CAST(ROUND(rev * 100) AS BIGINT)"),
         MO["rollup_01"]),
        ("fedhll", cat("o_orderstatus", "exact_patients", "n_sites",
                       "within_bound"), cohort._ORACLES["fed_hll"]),
        ("hh", cat("t", "c", "CAST(ROUND(rel_freq * 1000000) AS BIGINT)"),
         tx._ORACLES["hh_01"]),
        ("lm", cat("doc_id", "n_bigrams", "n_rare", "min_bg_count"),
         tx._ORACLES["lm_01"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def str_08(spark, sf):
    """STR-08 batch equivalent: stream–static broadcast enrich (events ⋈
    event-class dimension) then rollup — the streaming form is
    windows.enrich_with_dim."""
    e = T(spark, sf, "events")
    cls = (F.when(F.col("event_type").isin("click", "view"), "interaction")
            .when(F.col("event_type").isin("purchase", "signup"), "conversion")
            .otherwise("fault"))
    dim = (e.select("event_type").distinct()
            .withColumn("concept_class", cls))
    return (e.join(F.broadcast(dim), "event_type")
             .groupBy("concept_class").agg(F.count("*").alias("n"))
             .orderBy("concept_class"))


_STR_08_ORACLE = """
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'interaction'
            WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
            ELSE 'fault' END AS concept_class, count(*) AS n
FROM events GROUP BY 1
"""


# ----------------------------------------------------------- cohort families

def coh_panel(spark, sf):
    """Panel algebra: AND / OR-within-panel / NOT-exclusion
    (coh_01/02/03) as one tagged union of patient counts."""
    C = cohort
    out = C.coh_01(spark, sf).select(F.lit("and").alias("panel"), "n_patients")
    out = out.unionByName(
        C.coh_02(spark, sf).select(F.lit("or").alias("panel"), "n_patients"))
    out = out.unionByName(
        C.coh_03(spark, sf).select(F.lit("not").alias("panel"), "n_patients"))
    return out.orderBy("panel")


def _coh_panel_oracle() -> str:
    ct = catalog.clinical_with_clause(("observation_fact",))
    return ct + """
SELECT 'and' AS panel, count(DISTINCT patient_num) AS n_patients
FROM observation_fact f1
WHERE concept_cd = 'AKTIN:R:1' AND EXISTS (
    SELECT 1 FROM observation_fact f2
    WHERE f2.patient_num = f1.patient_num AND f2.concept_cd = 'AKTIN:N:2')
UNION ALL
SELECT 'or', count(DISTINCT patient_num) FROM observation_fact
WHERE concept_cd IN ('AKTIN:R:1','AKTIN:A:5','AKTIN:N:7')
UNION ALL
SELECT 'not', count(DISTINCT patient_num)
FROM observation_fact f1
WHERE concept_cd = 'AKTIN:R:1' AND NOT EXISTS (
    SELECT 1 FROM observation_fact f2
    WHERE f2.patient_num = f1.patient_num AND f2.concept_cd = 'AKTIN:N:2')
"""


def coh_enc(spark, sf):
    """Same-encounter constraint (coh_04) + value/date constraints by
    sex (coh_05) as one tagged union."""
    C = cohort
    a = C.coh_04(spark, sf).select(F.lit("enc").alias("tag"),
                                   F.lit("*").alias("k"),
                                   F.col("n_patients").alias("n"))
    b = C.coh_05(spark, sf).select(F.lit("sex").alias("tag"),
                                   F.col("sex_cd").alias("k"), "n")
    return a.unionByName(b).orderBy("tag", "k")


def _coh_enc_oracle() -> str:
    ct = catalog.clinical_with_clause(("observation_fact",
                                       "patient_dimension"))
    return ct + """
SELECT 'enc' AS tag, '*' AS k, count(DISTINCT patient_num) AS n
FROM observation_fact f1
WHERE concept_cd = 'AKTIN:R:1' AND EXISTS (
    SELECT 1 FROM observation_fact f2
    WHERE f2.encounter_num = f1.encounter_num AND f2.concept_cd = 'AKTIN:N:2')
UNION ALL
SELECT 'sex', sex_cd, count(*) FROM patient_dimension
WHERE patient_num IN (
    SELECT patient_num FROM observation_fact
    WHERE valtype_cd = 'N' AND nval_num >= 30.0
      AND start_date >= TIMESTAMP '1996-01-01'
      AND start_date < TIMESTAMP '1998-01-01')
GROUP BY sex_cd
"""


def coh_tmp(spark, sf):
    """Occurrence-count panel (coh_06) + temporal pair panel (coh_07) as
    one tagged union of patient counts."""
    C = cohort
    a = C.coh_06(spark, sf).select(F.lit("occ").alias("tag"),
                                   F.col("n_patients").alias("n"))
    b = C.coh_07(spark, sf).select(F.lit("pair").alias("tag"),
                                   F.col("n_patients").alias("n"))
    return a.unionByName(b).orderBy("tag")


def _coh_tmp_oracle() -> str:
    ct = catalog.clinical_with_clause(("observation_fact",))
    return ct + """
SELECT 'occ' AS tag, count(DISTINCT patient_num) AS n FROM (
    SELECT patient_num FROM observation_fact
    WHERE concept_cd = 'AKTIN:R:1'
    GROUP BY patient_num HAVING count(*) >= 3)
UNION ALL
SELECT 'pair', count(DISTINCT a.patient_num)
FROM observation_fact a JOIN observation_fact b
  ON a.encounter_num = b.encounter_num
WHERE a.concept_cd = 'AKTIN:R:11' AND b.concept_cd = 'AKTIN:R:22'
  AND b.start_date >= a.start_date
  AND b.start_date <= a.start_date + INTERVAL 4320 HOUR
"""


def coh_misc(spark, sf):
    """coh_enc + coh_tmp consolidated (coh_04..07, four branches) —
    round-6 second-half slot reshuffle: the fine-grained pair keys stay
    post-50, and the freed CORE50 slot driver-certifies ext_all."""
    return (coh_enc(spark, sf)
            .unionByName(coh_tmp(spark, sf)
                         .select("tag", F.lit("*").alias("k"), "n"))
            .orderBy("tag", "k"))


def _coh_misc_oracle() -> str:
    return (f"SELECT tag, k, n FROM ({_coh_enc_oracle()})\n"
            f"UNION ALL\nSELECT tag, '*' AS k, n "
            f"FROM ({_coh_tmp_oracle()})")


def udf_px(spark, sf):
    """udf_01 (pandas_udf normalize) + udf_04 (mapInPandas bucketing)
    consolidated — same slot-reshuffle move as coh_misc; the freed
    CORE50 slot driver-certifies the streaming-native str_11.
    r12 fold-in: udf_02's applyInPandas grouped stat rides as the
    "gstat" branch (builder verbatim; its CORE50 slot went to
    r12_all).  Prices fold as ROUND(x·100) BIGINTs — exact for the
    cents-precision fixture, and the only dual-dialect-stable
    rendering (double CAST AS STRING differs between engines)."""
    from . import udfs
    a = _tag(udfs.udf_01(spark, sf), "norm",
             F.concat_ws("|", "c_custkey", "norm_name"))
    b = _tag(udfs.udf_04(spark, sf), "bucket",
             F.concat_ws("|", "c_custkey", "bal_bucket"))
    c = _tag(udfs.udf_02(spark, sf), "gstat",
             F.concat_ws("|", "l_returnflag", "n",
                         F.round(F.col("min_price") * 100).cast("long"),
                         F.round(F.col("max_price") * 100).cast("long")))
    return a.unionByName(b).unionByName(c).orderBy("tag", "v")


def _udf_px_oracle() -> str:
    from . import udfs

    def cat(*cols):
        # STRING (not VARCHAR): both dialects accept it, so this oracle
        # also runs verbatim on spark.sql (test_sql_surface)
        return " || '|' || ".join(f"CAST({c} AS STRING)" for c in cols)

    O = udfs._ORACLES
    return (f"SELECT 'norm' AS tag, {cat('c_custkey', 'norm_name')} AS v "
            f"FROM ({O['udf_01']})\nUNION ALL\n"
            f"SELECT 'bucket' AS tag, {cat('c_custkey', 'bal_bucket')} "
            f"AS v FROM ({O['udf_04']})\nUNION ALL\n"
            f"SELECT 'gstat' AS tag, "
            f"{cat('l_returnflag', 'n', 'CAST(ROUND(min_price * 100) AS BIGINT)', 'CAST(ROUND(max_price * 100) AS BIGINT)')} "
            f"AS v FROM ({O['udf_02']})")


def ext_all(spark, sf):
    """The round-6 second-wave extensions in one tagged union so the
    driver window hash-certifies them: funnel attribution (seq_01),
    event-path patterns (seq_02), time-series gap fill (ts_01), the
    bigram-LM gate (lm_01), the ORC interchange roundtrip (src_orc),
    the mapInArrow lane (udf_06) and the FULL release chain (pipe_03).
    Same folding rules as maint_all: doubles as ROUND(x·10^k) bigints,
    dates/timestamps via explicit format strings."""
    from . import prep, relational as R, roundtrips, textops as tx, udfs
    out = _tag(R.seq_01(spark, sf), "seq1",
               F.concat_ws("|", "user_id", "click_id", "purchase_id",
                           "gap_sec"))
    out = out.unionByName(_tag(
        R.seq_02(spark, sf), "seq2",
        F.concat_ws("|", "user_id", "path", "n_funnels")))
    out = out.unionByName(_tag(
        R.ts_01(spark, sf), "ts",
        F.concat_ws("|", "user_id", F.date_format("d", "yyyy-MM-dd"),
                    F.col("observed").cast("string"),
                    F.round(F.col("v_filled") * 100).cast("long"))))
    out = out.unionByName(_tag(
        tx.lm_01(spark, sf), "lm",
        F.concat_ws("|", "doc_id", "n_bigrams", "n_rare",
                    "min_bg_count")))
    out = out.unionByName(_tag(
        roundtrips.src_orc(spark, sf), "orc",
        F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderstatus",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                    F.date_format("o_orderdate", "yyyy-MM-dd"),
                    "o_orderpriority")))
    out = out.unionByName(_tag(
        udfs.udf_06(spark, sf), "arrow",
        F.concat_ws("|", "vec_id",
                    F.round(F.col("l2_norm") * 1000000).cast("long"))))
    out = out.unionByName(_tag(
        prep.pipe_03(spark, sf), "rel",
        F.concat_ws("|", "lang", "n_docs", "total_tokens", "n_chunks",
                    "first_doc")))
    return out.orderBy("tag", "v")


def _ext_all_oracle() -> str:
    from . import prep, relational as R, roundtrips, textops as tx, udfs

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("seq1", cat("user_id", "click_id", "purchase_id", "gap_sec"),
         R._ORACLES["seq_01"]),
        ("seq2", cat("user_id", "path", "n_funnels"),
         R._ORACLES["seq_02"]),
        ("ts", cat("user_id", "strftime(d, '%Y-%m-%d')", "observed",
                   "CAST(ROUND(v_filled * 100) AS BIGINT)"),
         R._ORACLES["ts_01"]),
        ("lm", cat("doc_id", "n_bigrams", "n_rare", "min_bg_count"),
         tx._ORACLES["lm_01"]),
        ("orc", cat("o_orderkey", "o_custkey", "o_orderstatus",
                    "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
                    "strftime(o_orderdate, '%Y-%m-%d')",
                    "o_orderpriority"),
         roundtrips._SRC_ORC_ORACLE),
        ("arrow", cat("vec_id", "CAST(ROUND(l2_norm * 1000000) AS BIGINT)"),
         udfs._ORACLES["udf_06"]),
        ("rel", cat("lang", "n_docs", "total_tokens", "n_chunks",
                    "first_doc"), prep._pipe_03_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------------------------ UDF family

def udf_tf(spark, sf):
    """UDF-03 both shapes in one key: a genuine Python UDTF (lateral
    doc → token rows, the CDA-shred extension point) feeding the
    aggregated token-count output of the explode form (udf_03/udf_05
    remain as fine-grained keys)."""
    from pyspark.sql.functions import udtf

    class Tokenize:
        def eval(self, doc_id, text):
            for i, tok in enumerate((text or "").strip().split()):
                yield doc_id, i + 1, tok

    spark.udtf.register(
        "tokenize_udtf_c",
        udtf(Tokenize, returnType="doc_id bigint, idx bigint, tok string"))
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("_udtf_docs_c")
    return spark.sql(
        "SELECT t.tok AS token, count(*) AS n "
        "FROM _udtf_docs_c, LATERAL tokenize_udtf_c(doc_id, text) t "
        "WHERE t.tok <> '' GROUP BY t.tok ORDER BY token")


_UDF_TF_ORACLE = (
    "SELECT token, count(*) AS n FROM ("
    "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
    "FROM documents WHERE doc_id < 100) WHERE token <> '' "
    "GROUP BY token")


# ----------------------------------------------------------------- text family

def text_all(spark, sf):
    """All four text-analysis operators in ONE scan of documents:
    token/subtoken/char counts, quality stats, language-ID vote,
    fingerprint — the single-pass corpus-profiling shape (at 100 TB you
    never want four scans for four columns)."""
    from ..functions.textfns import tokens
    d = T(spark, sf, "documents")
    # tokens bound to a column (r12, the col_01 finding): the union
    # projection reads the array ~8 times (counts, stop filter, one
    # vote filter per language) — bound, one tokenize per row
    d = d.select("doc_id", "lang", "text", tokens("text").alias("_tk"))
    tok = F.col("_tk")
    all_stops = tuple(sorted({w for ws in textops.STOPWORDS.values()
                              for w in ws}))
    stop_cnt = F.size(F.filter(tok, lambda t: t.isin(*all_stops)))
    n_tok = F.size(tok)
    mean_len = F.round((F.length(F.trim("text")) - (n_tok - 1))
                       / n_tok.cast("double"), 4)
    votes = {lang: F.size(F.filter(tok, lambda t: t.isin(*ws)))
             for lang, ws in textops.STOPWORDS.items()}
    best, best_cnt = F.lit("und"), F.lit(0)
    for lang in textops.LANG_ORDER:
        v = votes[lang]
        take = v > best_cnt
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_cnt = F.when(take, v).otherwise(best_cnt)
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return (d.select(
                "doc_id",
                n_tok.alias("n_tokens"),
                F.size(F.regexp_extract_all("text", F.lit(textops.BPEISH), 0))
                 .alias("n_subtokens"),
                F.length("text").alias("len_chars"),
                stop_cnt.alias("stop_cnt"),
                F.round(stop_cnt / n_tok.cast("double"), 4)
                 .alias("stop_ratio"),
                mean_len.alias("mean_tok_len"),
                best.alias("pred_lang"), "lang",
                F.md5(norm).alias("fp"))
             .orderBy("doc_id"))


def _text_all_oracle() -> str:
    from ..functions.textfns import SQL_TOKENS
    stops = textops._ALL_STOPS
    t = SQL_TOKENS.format(col="text")
    expr, cnt = "'und'", "0"
    for lang in textops.LANG_ORDER:
        v = textops._sql_vote(textops.STOPWORDS[lang])
        expr = f"CASE WHEN {v} > {cnt} THEN '{lang}' ELSE {expr} END"
        cnt = f"CASE WHEN {v} > {cnt} THEN {v} ELSE {cnt} END"
    b = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return f"""
WITH b AS (SELECT doc_id, lang, text, {t} AS t FROM documents)
SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{b}')) AS INT) AS n_subtokens,
       CAST(length(text) AS INT) AS len_chars,
       CAST(len(list_filter(t, x -> x IN ({stops}))) AS INT) AS stop_cnt,
       ROUND(len(list_filter(t, x -> x IN ({stops})))
             / CAST(len(t) AS DOUBLE), 4) AS stop_ratio,
       ROUND((length(trim(text)) - (len(t) - 1))
             / CAST(len(t) AS DOUBLE), 4) AS mean_tok_len,
       {expr} AS pred_lang, lang,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM b
"""


# ----------------------------------------------------------- multimodal stubs

def mm_decode(spark, sf):
    """mm_02 decode + mm_03 resize + mm_png REAL pixel decode in one
    key (multimodal.fake_decode fallback path, png_resize_features and
    the stdlib PNG codec in functions/png.py; mapInPandas plumbing is
    real throughout).

    Hash-checked on two levels: the pinned stub columns are a pure
    function of sha256(payload), which the DuckDB oracle reproduces
    byte-for-byte (Arrow batch plumbing, schemas, decode→resize join) —
    this is the declared fallback lane for formats without a codec;
    the png_* columns come from ACTUALLY round-tripping real PNG bytes
    (encode → chunk walk → inflate → unfilter, all five filters) and
    the rs_* columns from REALLY resampling them (decode →
    nearest-neighbor → re-encode → decode back; stub resize retired
    r6), both recomputed analytically by the oracle from the synthesis
    contract."""
    d = (T(spark, sf, "documents")
         .filter(F.col("doc_id") < multimodal.PNG_SYNTH_DOCS))
    m = multimodal.as_media(d)
    feat = multimodal.decode_features(m)
    synth = multimodal.synth_png_media(d.select("doc_id"))
    png = multimodal.png_decode_features(synth)
    rs = multimodal.png_resize_features(synth)
    return feat.join(rs, "doc_id").join(png, "doc_id").orderBy("doc_id")


# the stub decode derives (width, height, mean_luma) from sha256 of the
# UTF-8 payload (multimodal.fake_decode); the fixture text is pure ASCII
# (octet_length == length at every SF), so DuckDB's sha256(varchar)
# hashes the same bytes and each stat is reproducible in SQL.  The
# png_* columns recompute the synthesis gradient analytically; the
# rs_* columns recompute its 8x8 nearest-neighbor resample (floor
# source mapping, functions/png.py resize_nearest).
_MM_DECODE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS nb, sha256(text) AS hx
  FROM documents WHERE doc_id < {multimodal.PNG_SYNTH_DOCS}
),
pdim AS (
  SELECT doc_id, CAST({multimodal.SQL_PNG_W} AS INT) AS png_w,
         CAST({multimodal.SQL_PNG_H} AS INT) AS png_h
  FROM documents WHERE doc_id < {multimodal.PNG_SYNTH_DOCS}
),
pg AS (
  SELECT doc_id, png_w, png_h, ROUND(AVG(v) / 255.0, 6) AS png_luma
  FROM (SELECT doc_id, png_w, png_h,
               {multimodal.SQL_PNG_V} AS v
        FROM (SELECT doc_id, png_w, png_h,
                     unnest(range(png_w * png_h)) AS i FROM pdim))
  GROUP BY 1, 2, 3
),
rs AS (
  SELECT doc_id, ROUND(AVG(v) / 255.0, 6) AS rs_luma
  FROM (SELECT doc_id,
               (((i % 8) * png_w // 8) + 3 * ((i // 8) * png_h // 8)
                + doc_id) % 256 AS v
        FROM (SELECT doc_id, png_w, png_h, unnest(range(64)) AS i
              FROM pdim))
  GROUP BY doc_id
)
SELECT h.doc_id, CAST(nb AS INT) AS n_bytes,
       CAST(16 + ('0x' || substring(hx, 1, 2))::INT % 64 AS INT) AS width,
       CAST(16 + ('0x' || substring(hx, 3, 2))::INT % 64 AS INT) AS height,
       ROUND(('0x' || substring(hx, 5, 2))::INT / 255.0, 6) AS mean_luma,
       CAST(8 AS INT) AS rs_w, CAST(8 AS INT) AS rs_h, rs.rs_luma,
       pg.png_w, pg.png_h, pg.png_luma
FROM h JOIN pg ON h.doc_id = pg.doc_id JOIN rs ON h.doc_id = rs.doc_id
ORDER BY h.doc_id
"""


# --------------------------------------------------------- LLM-pipeline family

def llm_all(spark, sf):
    """The six LLM-pipeline batch operators in one tagged union so the
    driver window hash-certifies all of them: sequence packing
    (pack_01), mixture sampling (mix_01), sliding-window chunking
    (chunk_01), per-language vocabulary top-K (vocab_01), benchmark
    decontamination (decon_01), and near-dup connected-components
    clustering (dupcc_01).  Branches reuse the fine-grained builders
    verbatim (operators/packing.py, prep.py, textops.py, dedup.py);
    every branch column is folded into `v` with '|' separators so the
    union keeps full value-level verification.  All branch columns are
    integer/string typed, so Spark's concat_ws and the oracle's VARCHAR
    casts render identically."""
    from . import dedup, packing, prep
    out = _tag(packing.pack_01(spark, sf), "pack",
               F.concat_ws("|", "source", "seq_id", "n_docs", "tokens",
                           "first_doc"))
    out = out.unionByName(_tag(
        packing.mix_01(spark, sf), "mix",
        F.concat_ws("|", "lang", "n_total", "n_kept", "kept_tokens")))
    out = out.unionByName(_tag(
        packing.chunk_01(spark, sf), "chunk",
        F.concat_ws("|", "doc_id", "chunk_idx", "n_tok", "chunk_md5")))
    out = out.unionByName(_tag(
        textops.vocab_01(spark, sf), "vocab",
        F.concat_ws("|", "lang", "rank", "t", "n")))
    out = out.unionByName(_tag(
        prep.decon_01(spark, sf), "decon",
        F.concat_ws("|", "i", "j", "shared")))
    out = out.unionByName(_tag(
        dedup.dupcc_01(spark, sf), "dupcc",
        F.concat_ws("|", "doc_id", "cluster_rep")))
    return out.orderBy("tag", "v")


def _llm_all_oracle() -> str:
    from . import dedup, packing, prep, textops as tx

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("pack", cat("source", "seq_id", "n_docs", "tokens", "first_doc"),
         packing._PACK_ORACLE),
        ("mix", cat("lang", "n_total", "n_kept", "kept_tokens"),
         packing._MIX_ORACLE),
        ("chunk", cat("doc_id", "chunk_idx", "n_tok", "chunk_md5"),
         packing._CHUNK_ORACLE),
        ("vocab", cat("lang", "rank", "t", "n"), tx._VOCAB_ORACLE),
        ("decon", cat("i", "j", "shared"), prep._DECON_ORACLE),
        ("dupcc", cat("doc_id", "cluster_rep"), dedup._DUPCC_ORACLE),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------ round-7 final-wave family

def fin_all(spark, sf):
    """The round-6 final-wave batch extensions in one tagged union so
    the driver window hash-certifies the last post-50 keys (VERDICT r6
    item 1): quality-based dup retention (dupsel_01), hierarchical
    sharded packing (pack_02), deterministic corpus shuffle (shuf_01),
    train/val/test split (split_01), boilerplate detection (bplate_01),
    the JSONL corpus roundtrip (src_jsonl), one-pass table profiling
    (prof_01), k-anonymity suppression (priv_01), federated
    partial-aggregate merge (fed_01), and the percentile-sketch
    self-check (agg_12).  Branches reuse the fine-grained builders
    verbatim; folding rules as maint_all (doubles as ROUND(x·10^k)
    bigints, NULLs coalesced to literals — concat_ws silently drops
    nulls, so every nullable column is wrapped; document text folded
    through md5 so the union row stays one line)."""
    from . import cohort, dedup, packing, relational as R, roundtrips
    out = _tag(dedup.dupsel_01(spark, sf), "dupsel",
               F.concat_ws("|", "cluster_rep", "keep_id", "n_members",
                           "kept_chars"))
    out = out.unionByName(_tag(
        packing.pack_02(spark, sf), "pack2",
        F.concat_ws("|", "source", "shard", "seq_id", "n_docs", "tokens",
                    "first_doc")))
    out = out.unionByName(_tag(
        packing.shuf_01(spark, sf), "shuf",
        F.concat_ws("|", "shard", "pos", "doc_id")))
    out = out.unionByName(_tag(
        packing.split_01(spark, sf), "split",
        F.concat_ws("|", "lang", "split", "n_docs", "tokens")))
    out = out.unionByName(_tag(
        packing.bplate_01(spark, sf), "bplate",
        F.concat_ws("|", "chunk_md5", "n_docs", "n_occurrences",
                    "first_doc")))
    out = out.unionByName(_tag(
        roundtrips.src_jsonl(spark, sf), "jsonl",
        F.concat_ws("|", "doc_id", "lang", "source", F.md5("text"))))
    out = out.unionByName(_tag(
        R.prof_01(spark, sf), "prof",
        F.concat_ws("|", "col", "n_rows", "n_null", "n_distinct",
                    "min_v", "max_v")))
    out = out.unionByName(_tag(
        cohort.priv_01(spark, sf), "priv",
        F.concat_ws("|", "m", "inout_cd",
                    F.coalesce(F.col("n").cast("string"), F.lit("supp")),
                    F.col("suppressed").cast("string"))))
    out = out.unionByName(_tag(
        cohort.fed_01(spark, sf), "fed",
        F.concat_ws("|", "o_orderstatus", "n",
                    F.round(F.col("rev") * 100).cast("long"), "n_sites")))
    out = out.unionByName(_tag(
        relational.agg_12(spark, sf), "agg12",
        F.concat_ws("|", "l_returnflag",
                    F.round(F.col("exact_median") * 100).cast("long"),
                    F.col("within_bound").cast("string"))))
    return out.orderBy("tag", "v")


def _fin_all_oracle() -> str:
    from . import cohort, dedup, packing, relational as R, roundtrips

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("dupsel", cat("cluster_rep", "keep_id", "n_members", "kept_chars"),
         dedup._DUPSEL_ORACLE),
        ("pack2", cat("source", "shard", "seq_id", "n_docs", "tokens",
                      "first_doc"), packing._PACK2_ORACLE),
        ("shuf", cat("shard", "pos", "doc_id"), packing._SHUF_ORACLE),
        ("split", cat("lang", "split", "n_docs", "tokens"),
         packing._SPLIT_ORACLE),
        ("bplate", cat("chunk_md5", "n_docs", "n_occurrences", "first_doc"),
         packing._BPLATE_ORACLE),
        ("jsonl", cat("doc_id", "lang", "source", "md5(text)"),
         roundtrips._SRC_JSONL_ORACLE),
        ("prof", cat("col", "n_rows", "n_null", "n_distinct", "min_v",
                     "max_v"), R._prof_01_oracle()),
        ("priv", cat("m", "inout_cd",
                     "COALESCE(CAST(n AS VARCHAR), 'supp')", "suppressed"),
         cohort._ORACLES["priv_01"]),
        ("fed", cat("o_orderstatus", "n",
                    "CAST(ROUND(rev * 100) AS BIGINT)", "n_sites"),
         cohort._ORACLES["fed_01"]),
        ("agg12", cat("l_returnflag",
                      "CAST(ROUND(exact_median * 100) AS BIGINT)",
                      "within_bound"), R._ORACLES["agg_12"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def str_out(spark, sf):
    """The streaming-native post-50 keys in one tagged union so the
    driver certifies the LEFT OUTER stream–stream watermark-eviction
    contract (str_12), event-time-timer sessionization (str_13) —
    VERDICT r6 item 1's streaming half — and, since round 8 (VERDICT
    r7 item 1), NATIVE session_window sessionization (str_14), the
    HLL-in-state-store windowed approximate distinct (str_15),
    exactly-once dedup of planted at-least-once re-deliveries
    (str_16, r8), the streaming Count-Min sketch with bounded-state
    per-batch partial merges (str_17, r9), the Misra–Gries streaming
    heavy hitters (str_18, r9), and the commit-log streaming SOURCE
    over the txnlog table (str_19, r9 — version-offset tailing via a
    Python DataSource; all certified the round they land).
    Every branch runs a REAL readStream replay (chunked files, one per
    trigger) exactly as the fine-grained keys do; timestamps fold
    through unix_micros (session TZ pinned UTC, so DuckDB's epoch_us
    on the naive timestamp renders the identical integer — the
    microsecond-exact fold NOTES prescribes for cross-engine time).

    r11: the branch builders MATERIALIZE their replays eagerly, so
    building them sequentially made this union's wall time the sum of
    ten replays — the suite's critical path.  They are independent
    (own tmp dirs, own sinks, Spark schedules concurrent jobs fine),
    so a thread pool runs them together; each result is already
    pinned by localCheckpoint when the builder returns."""
    from concurrent.futures import ThreadPoolExecutor

    from . import streamnative as SN
    with ThreadPoolExecutor(max_workers=11) as ex:
        f12 = ex.submit(SN.str_12, spark, sf)
        f13 = ex.submit(SN.str_13, spark, sf)
        f14 = ex.submit(SN.str_14, spark, sf)
        f15 = ex.submit(SN.str_15, spark, sf)
        f16 = ex.submit(SN.str_16, spark, sf)
        f17 = ex.submit(SN.str_17, spark, sf)
        f18 = ex.submit(SN.str_18, spark, sf)
        f19 = ex.submit(SN.str_19, spark, sf)
        f07 = ex.submit(relational.str_07, spark, sf)
        f21 = ex.submit(SN.str_21, spark, sf)
        f20 = ex.submit(SN.str_20, spark, sf)
    a = _tag(f12.result(), "outer",
             F.concat_ws(
                 "|", "a_id",
                 F.coalesce(F.col("b_id").cast("string"), F.lit("none")),
                 "user_id",
                 F.unix_micros(F.col("a_ts").cast("timestamp"))
                  .cast("string"),
                 F.coalesce(F.unix_micros(F.col("b_ts").cast("timestamp"))
                             .cast("string"), F.lit("none"))))
    b = _tag(f13.result(), "sess",
             F.concat_ws(
                 "|", "user_id",
                 F.unix_micros(F.col("sess_start").cast("timestamp"))
                  .cast("string"), "n_events"))
    c = _tag(f14.result(), "sess14",
             F.concat_ws(
                 "|", "user_id",
                 F.unix_micros(F.col("sess_start").cast("timestamp"))
                  .cast("string"), "n_events"))
    d = _tag(f15.result(), "hll",
             F.concat_ws(
                 "|",
                 F.unix_micros(F.col("ws").cast("timestamp"))
                  .cast("string"), "exact_users",
                 F.col("within_bound").cast("string")))
    e = _tag(f16.result(), "dedup16",
             F.concat_ws(
                 "|", "event_id",
                 F.unix_micros(F.col("ts").cast("timestamp"))
                  .cast("string"), "user_id", "event_type"))
    f = _tag(f17.result(), "cms17",
             F.concat_ws(
                 "|", "user_id", "exact", "est",
                 F.col("ge_exact").cast("string"),
                 F.col("within_bound").cast("string")))
    g = _tag(f18.result(), "hh18",
             F.concat_ws(
                 "|", "user_id", "n",
                 F.round(F.col("share") * 10_000).cast("long")))
    h = _tag(f19.result(), "txs19",
             F.concat_ws("|", "encounter_num", "patient_num",
                         "inout_cd", "commit_version"))
    # r10 fold-in (VERDICT r9 item 7): str_07's batch-equivalent
    # per-user state machine, builder verbatim — the CORE50 slot it
    # donated went to str_20, whose streaming replay joins here too
    i = _tag(f07.result(), "st7",
             F.concat_ws(
                 "|", "user_id", "n_events",
                 F.unix_micros(F.col("opened").cast("timestamp"))
                  .cast("string"),
                 F.col("closed").cast("string")))
    # r11: the streaming change-data feed (txnlog_cdc DataSource) —
    # classified per-version diffs streamed from the commit log,
    # certified the round it lands (shares cdc_03's oracle shape)
    j = _tag(f21.result(), "cdf21",
             F.concat_ws(
                 "|", "encounter_num", "patient_num",
                 F.unix_micros(F.col("start_date").cast("timestamp"))
                  .cast("string"),
                 "inout_cd", "change_type", "commit_version"))
    # r12 fold-in (slot economy): str_20's streaming KMV bottom-k
    # sample, builder verbatim — its CORE50 slot went to ds_02 (the
    # txnlog writer surface)
    k = _tag(f20.result(), "kmv20",
             F.concat_ws("|", "doc_id", "lang", "pr"))
    return (a.unionByName(b).unionByName(c).unionByName(d)
            .unionByName(e).unionByName(f).unionByName(g)
            .unionByName(h).unionByName(i).unionByName(j)
            .unionByName(k)
            .orderBy("tag", "v"))


def _str_out_oracle() -> str:
    from . import streamnative as SN
    outer_v = ("CAST(a_id AS VARCHAR) || '|' || "
               "COALESCE(CAST(b_id AS VARCHAR), 'none') || '|' || "
               "CAST(user_id AS VARCHAR) || '|' || "
               "CAST(epoch_us(a_ts) AS VARCHAR) || '|' || "
               "COALESCE(CAST(epoch_us(b_ts) AS VARCHAR), 'none')")
    sess_v = ("CAST(user_id AS VARCHAR) || '|' || "
              "CAST(epoch_us(sess_start) AS VARCHAR) || '|' || "
              "CAST(n_events AS VARCHAR)")
    hll_v = ("CAST(epoch_us(ws) AS VARCHAR) || '|' || "
             "CAST(exact_users AS VARCHAR) || '|' || "
             "CAST(within_bound AS VARCHAR)")
    ded_v = ("CAST(event_id AS VARCHAR) || '|' || "
             "CAST(epoch_us(ts) AS VARCHAR) || '|' || "
             "CAST(user_id AS VARCHAR) || '|' || event_type")
    cms_v = ("CAST(user_id AS VARCHAR) || '|' || "
             "CAST(exact AS VARCHAR) || '|' || "
             "CAST(est AS VARCHAR) || '|' || "
             "CAST(ge_exact AS VARCHAR) || '|' || "
             "CAST(within_bound AS VARCHAR)")
    return (f"SELECT 'outer' AS tag, {outer_v} AS v "
            f"FROM ({SN._STR_12_ORACLE})\n"
            f"UNION ALL\nSELECT 'sess' AS tag, {sess_v} AS v "
            f"FROM ({SN._STR_13_ORACLE})\n"
            f"UNION ALL\nSELECT 'sess14' AS tag, {sess_v} AS v "
            f"FROM ({SN._STR_14_ORACLE})\n"
            f"UNION ALL\nSELECT 'hll' AS tag, {hll_v} AS v "
            f"FROM ({SN._STR_15_ORACLE})\n"
            f"UNION ALL\nSELECT 'dedup16' AS tag, {ded_v} AS v "
            f"FROM ({SN._STR_16_ORACLE})\n"
            f"UNION ALL\nSELECT 'cms17' AS tag, {cms_v} AS v "
            f"FROM ({SN._STR_17_ORACLE})"
            "\nUNION ALL\nSELECT 'hh18' AS tag, "
            "CAST(user_id AS VARCHAR) || '|' || CAST(n AS VARCHAR) "
            "|| '|' || CAST(CAST(ROUND(share * 10000) AS BIGINT) "
            "AS VARCHAR) AS v "
            f"FROM ({SN._STR_18_ORACLE})"
            "\nUNION ALL\nSELECT 'txs19' AS tag, "
            "CAST(encounter_num AS VARCHAR) || '|' || "
            "CAST(patient_num AS VARCHAR) || '|' || inout_cd "
            "|| '|' || CAST(commit_version AS VARCHAR) AS v "
            f"FROM ({SN._STR_19_ORACLE})"
            "\nUNION ALL\nSELECT 'st7' AS tag, "
            "CAST(user_id AS VARCHAR) || '|' || "
            "CAST(n_events AS VARCHAR) || '|' || "
            "CAST(epoch_us(opened) AS VARCHAR) || '|' || "
            "CAST(closed AS VARCHAR) AS v "
            f"FROM ({relational._ORACLES['str_07']})"
            "\nUNION ALL\nSELECT 'cdf21' AS tag, "
            "CAST(encounter_num AS VARCHAR) || '|' || "
            "CAST(patient_num AS VARCHAR) || '|' || "
            "CAST(epoch_us(start_date) AS VARCHAR) || '|' || "
            "inout_cd || '|' || change_type || '|' || "
            "CAST(commit_version AS VARCHAR) AS v FROM ("
            + __import__("docker_aktin_dwh_spark.operators.roundtrips",
                         fromlist=["x"])._cdc_03_oracle() + ")"
            "\nUNION ALL\nSELECT 'kmv20' AS tag, "
            "CAST(doc_id AS VARCHAR) || '|' || lang || '|' || pr AS v "
            f"FROM ({SN._STR_20_ORACLE})")


def r7_all(spark, sf):
    """The seven round-7 post-50 BATCH keys in one tagged union so the
    driver window hash-certifies them (VERDICT r7 item 1, the
    fin_all/str_out pattern): BM25 top-k retrieval (bm25_01), blocked
    entity resolution (er_01), PageRank over the near-dup graph
    (pr_01), the event-time RANGE frame (win_07), schema-evolution
    read (src_evo), the Tukey-fence outlier audit (dq_02), and
    temperature mixture sampling (mix_02).  Branches reuse the
    fine-grained builders verbatim; folding rules as fin_all (doubles
    as ROUND(x·10^k) bigints, nullables coalesced — concat_ws silently
    drops nulls)."""
    from . import entity, graph, maintenance, packing, retrieval, \
        roundtrips
    out = _tag(retrieval.bm25_01(spark, sf), "bm25",
               F.concat_ws("|", "query", "rank", "doc_id",
                           F.round(F.col("score") * 10000).cast("long")))
    out = out.unionByName(_tag(
        entity.er_01(spark, sf), "er",
        F.concat_ws("|", "i", "j", "dist")))
    out = out.unionByName(_tag(
        graph.pr_01(spark, sf), "pr",
        F.concat_ws("|", "doc_id",
                    F.round(F.col("pr") * 1_000_000).cast("long"))))
    out = out.unionByName(_tag(
        relational.win_07(spark, sf), "win07",
        F.concat_ws("|", "event_id", "user_id", "n_24h",
                    F.round(F.col("v_24h") * 100).cast("long"))))
    out = out.unionByName(_tag(
        roundtrips.src_evo(spark, sf), "srcevo",
        F.concat_ws("|", "o_orderkey",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                    F.coalesce("o_orderstatus", F.lit("none")))))
    out = out.unionByName(_tag(
        maintenance.dq_02(spark, sf), "dq2",
        F.concat_ws("|", "l_returnflag", "n", "n_outliers")))
    out = out.unionByName(_tag(
        packing.mix_02(spark, sf), "mix2",
        F.concat_ws("|", "lang", "n_total", "n_kept", "kept_tokens",
                    "keep_thr")))
    return out.orderBy("tag", "v")


def _r7_all_oracle() -> str:
    from . import entity, graph, maintenance, packing, retrieval, \
        roundtrips

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("bm25", cat("query", "rank", "doc_id",
                     "CAST(ROUND(score * 10000) AS BIGINT)"),
         retrieval._bm25_oracle()),
        ("er", cat("i", "j", "dist"), entity._ER_ORACLE),
        ("pr", cat("doc_id", "CAST(ROUND(pr * 1000000) AS BIGINT)"),
         graph._pr_oracle()),
        ("win07", cat("event_id", "user_id", "n_24h",
                      "CAST(ROUND(v_24h * 100) AS BIGINT)"),
         relational._ORACLES["win_07"]),
        ("srcevo", cat("o_orderkey",
                       "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
                       "COALESCE(o_orderstatus, 'none')"),
         roundtrips._SRC_EVO_ORACLE),
        ("dq2", cat("l_returnflag", "n", "n_outliers"),
         maintenance._DQ2_ORACLE),
        ("mix2", cat("lang", "n_total", "n_kept", "kept_tokens",
                     "keep_thr"), packing._MIX2_ORACLE),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r8_all(spark, sf):
    """Round-8 new operators, driver-certified in the SAME round they
    land (closing the one-generation certification lag VERDICT r7
    called out): two-pass blocked entity resolution (er_02),
    embedding scalar quantization (vq_01), token-budget data
    selection (tok_01), the fixed-size stratified sample (smp_03),
    the deterministic-Laplace DP release (priv_02), the GIF/LZW real
    decode (mm_gif), animated-GIF frame sampling (mm_vid), the
    Z-order clustering audit (lay_02), and CDC-fed incremental view
    maintenance — batch (ivm_01) and streaming foreachBatch (ivm_02,
    a REAL replay whose maintained view must converge to the
    recompute), the shuffle-free bucketed-join roundtrip (bkt_01),
    the Count-Min frequency sketch (cms_01), the i2b2 totalnum
    hierarchy rollup (ont_02) with its HLL-sketch form (ont_03), and
    the budgeted multilingual release
    chain (pipe_04 — the r8 curation verbs composed into ONE
    Catalyst plan)."""
    from . import entity, maintenance, packing, prep, roundtrips, \
        similarity
    out = _tag(entity.er_02(spark, sf), "er2",
               F.concat_ws("|", "i", "j", "dist"))
    out = out.unionByName(_tag(
        similarity.vq_01(spark, sf), "vq",
        F.concat_ws("|", "label", "n_vecs",
                    F.round(F.col("mean_err_ppm") * 10000).cast("long"),
                    F.col("within_half_step").cast("string"))))
    out = out.unionByName(_tag(
        packing.tok_01(spark, sf), "tok",
        F.concat_ws("|", "lang", "n_docs_sel", "tokens_sel",
                    "thr_tokens",
                    F.round(F.col("budget_frac") * 10000).cast("long"))))
    out = out.unionByName(_tag(
        relational.smp_03(spark, sf), "smp3",
        F.concat_ws("|", "o_orderpriority", "pick", "o_orderkey")))
    out = out.unionByName(_tag(
        cohort.priv_02(spark, sf), "priv2",
        F.concat_ws("|", "m", "inout_cd", "n_noisy")))
    out = out.unionByName(_tag(
        multimodal.mm_gif(spark, sf), "gif",
        F.concat_ws("|", "doc_id", "gif_w", "gif_h",
                    F.round(F.col("gif_luma") * 1_000_000)
                     .cast("long"))))
    out = out.unionByName(_tag(
        multimodal.mm_vid(spark, sf), "vid",
        F.concat_ws("|", "doc_id", "frame_idx", "vid_w", "vid_h",
                    F.round(F.col("fr_luma") * 1_000_000)
                     .cast("long"))))
    out = out.unionByName(_tag(
        maintenance.lay_02(spark, sf), "lay2",
        F.concat_ws("|", "zcell", "n", "min_c", "max_c",
                    F.round(F.col("min_p") * 100).cast("long"),
                    F.round(F.col("max_p") * 100).cast("long"))))
    out = out.unionByName(_tag(
        maintenance.ivm_01(spark, sf), "ivm",
        F.concat_ws("|", "c_nationkey", "n_orders",
                    F.round(F.col("revenue") * 100).cast("long"))))
    out = out.unionByName(_tag(
        roundtrips.bkt_01(spark, sf), "bkt",
        F.concat_ws("|", "c_nationkey", "n_orders",
                    F.round(F.col("revenue") * 100).cast("long"))))
    out = out.unionByName(_tag(
        prep.pipe_04(spark, sf), "pipe4",
        F.concat_ws("|", "lang", "n_docs_sel", "tokens_sel",
                    "keep_thr", "thr_tokens",
                    F.round(F.col("budget_frac") * 10000).cast("long"))))
    out = out.unionByName(_tag(
        cohort.ont_02(spark, sf), "ont2",
        F.concat_ws("|", "c_fullname", "n_facts", "totalnum")))
    out = out.unionByName(_tag(
        cohort.ont_03(spark, sf), "ont3",
        F.concat_ws("|", "c_fullname", "totalnum",
                    F.col("within_bound").cast("string"))))
    out = out.unionByName(_tag(
        textops.cms_01(spark, sf), "cms",
        F.concat_ws("|", "t", "exact", "est",
                    F.col("ge_exact").cast("string"),
                    F.col("within_bound").cast("string"))))
    out = out.unionByName(_tag(
        maintenance.ivm_02(spark, sf), "ivm2",
        F.concat_ws("|", "c_nationkey", "n_orders",
                    F.round(F.col("revenue") * 100).cast("long"))))
    return out.orderBy("tag", "v")


def _r8_all_oracle() -> str:
    from . import entity, maintenance, packing, prep, roundtrips, \
        similarity, textops

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("er2", cat("i", "j", "dist"), entity._er2_oracle()),
        ("vq", cat("label", "n_vecs",
                   "CAST(ROUND(mean_err_ppm * 10000) AS BIGINT)",
                   "within_half_step"), similarity._vq_oracle()),
        ("tok", cat("lang", "n_docs_sel", "tokens_sel", "thr_tokens",
                    "CAST(ROUND(budget_frac * 10000) AS BIGINT)"),
         packing._TOK_ORACLE),
        ("smp3", cat("o_orderpriority", "pick", "o_orderkey"),
         relational._ORACLES["smp_03"]),
        ("priv2", cat("m", "inout_cd", "n_noisy"),
         cohort._ORACLES["priv_02"]),
        ("gif", cat("doc_id", "gif_w", "gif_h",
                    "CAST(ROUND(gif_luma * 1000000) AS BIGINT)"),
         multimodal._ORACLES["mm_gif"]),
        ("vid", cat("doc_id", "frame_idx", "vid_w", "vid_h",
                    "CAST(ROUND(fr_luma * 1000000) AS BIGINT)"),
         multimodal._ORACLES["mm_vid"]),
        ("lay2", cat("zcell", "n", "min_c", "max_c",
                     "CAST(ROUND(min_p * 100) AS BIGINT)",
                     "CAST(ROUND(max_p * 100) AS BIGINT)"),
         maintenance._lay2_oracle()),
        ("ivm", cat("c_nationkey", "n_orders",
                    "CAST(ROUND(revenue * 100) AS BIGINT)"),
         maintenance._IVM_ORACLE),
        ("ivm2", cat("c_nationkey", "n_orders",
                     "CAST(ROUND(revenue * 100) AS BIGINT)"),
         maintenance._IVM_ORACLE),
        ("bkt", cat("c_nationkey", "n_orders",
                    "CAST(ROUND(revenue * 100) AS BIGINT)"),
         roundtrips._BKT_01_ORACLE),
        ("cms", cat("t", "exact", "est", "ge_exact", "within_bound"),
         textops._cms_oracle()),
        ("ont2", cat("c_fullname", "n_facts", "totalnum"),
         cohort._ORACLES["ont_02"]),
        ("ont3", cat("c_fullname", "totalnum", "within_bound"),
         cohort._ORACLES["ont_03"]),
        ("pipe4", cat("lang", "n_docs_sel", "tokens_sel", "keep_thr",
                      "thr_tokens",
                      "CAST(ROUND(budget_frac * 10000) AS BIGINT)"),
         prep._pipe_04_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def ann_bx(spark, sf):
    """The two bucketed-ANN certification keys in one tagged union
    (CORE50 consolidation, VERDICT r7 item 1's freed-slot list): LSH
    signature → band-bucket join → re-rank and IVF train → assign →
    probe → re-rank, each certified by planted-duplicate retrieval at
    rank 1.  Fine-grained ann_lsh / ann_ivf keys stay post-50."""
    from . import similarity as S
    a = _tag(S.ann_lsh(spark, sf), "lsh",
             F.concat_ws("|", "q_id",
                         F.col("planted_at_rank1").cast("string")))
    b = _tag(S.ann_ivf(spark, sf), "ivf",
             F.concat_ws("|", "q_id",
                         F.col("planted_at_rank1").cast("string")))
    return a.unionByName(b).orderBy("tag", "v")


def _ann_bx_oracle() -> str:
    from . import similarity as S
    v = ("CAST(q_id AS VARCHAR) || '|' || "
         "CAST(planted_at_rank1 AS VARCHAR)")
    return (f"SELECT 'lsh' AS tag, {v} AS v FROM ({S._PLANTED_ORACLE})\n"
            f"UNION ALL\nSELECT 'ivf' AS tag, {v} AS v "
            f"FROM ({S._PLANTED_ORACLE})")


def r9_all(spark, sf):
    """Round-9 certification union: the NEW baseline-JPEG real-decode
    lane (mm_jpg — the last stubbed modality, functions/jpeg.py)
    lands driver-certified in the same round it is written (the r8
    discipline), plus the three CORE50 fold-ins VERDICT r8 item 5
    named, reusing their builders verbatim so the window slot still
    certifies the same semantics: mm_04 frame sampling (slot donor),
    emb_01 mean-pool embeddings, and ded_incr incremental near-dup
    (new batch vs stored corpus index)."""
    from . import dedup, graph, similarity
    out = _tag(multimodal.mm_jpg(spark, sf), "jpg",
               F.concat_ws("|", "doc_id", "jpg_w", "jpg_h",
                           F.round(F.col("jpg_luma") * 1_000_000)
                            .cast("long"),
                           F.col("jpg_exact").cast("string")))
    out = out.unionByName(_tag(
        multimodal.mm_04(spark, sf), "mm4",
        F.concat_ws("|", "doc_id", "frame_idx", "frame_md5")))
    out = out.unionByName(_tag(
        similarity.emb_01(spark, sf), "emb",
        F.concat_ws("|", "g", "dims",
                    F.round(F.col("l2") * 10000).cast("long"))))
    out = out.unionByName(_tag(
        dedup.ded_incr(spark, sf), "dinc",
        F.concat_ws("|", "i", "j",
                    F.round(F.col("jac") * 1000).cast("long"))))
    out = out.unionByName(_tag(
        similarity.ann_sq(spark, sf), "sq",
        F.concat_ws("|", "q_id",
                    F.col("planted_at_rank1").cast("string"))))
    out = out.unionByName(_tag(
        similarity.km_01(spark, sf), "km",
        F.concat_ws("|", "cid", "n",
                    F.round(F.col("cnorm") * 1_000_000).cast("long"),
                    F.round(F.col("inertia") * 1_000_000).cast("long"))))
    out = out.unionByName(_tag(
        dedup.ded_substr(spark, sf), "sub",
        F.concat_ws("|", "doc_id", "n_spans", "n_dup_spans",
                    F.round(F.col("dup_frac") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        textops.qc_01(spark, sf), "qc",
        F.concat_ws("|", "lang", "n_docs", "n_pred_en",
                    F.round(F.col("mean_margin") * 1_000_000)
                     .cast("long"))))
    out = out.unionByName(_tag(
        graph.tri_01(spark, sf), "tri",
        F.concat_ws("|", "doc_id", "degree", "n_tri")))
    return out.orderBy("tag", "v")


def r9b_all(spark, sf):
    """Round-9 second-wave certification union (same-round driver
    certification for the operators that landed after r9_all froze),
    reusing each builder verbatim: blm_01 Bloom-pruned semi-join,
    kw_01 TF-IDF keyword top-k, er_03 sorted-neighborhood entity
    resolution (the distributed global-rank primitive), ann_pq flat
    product quantization with ADC scoring, ded_embed2 LSH-bucketed
    embedding near-dup (ded_embed's declared scale path), and
    ded_ngram2 prefix-filtered exact Jaccard (ngram's unguarded exact
    scale path, sharing ded_ngram's brute-force oracle), ups_02 ACID
    MERGE through the commit-log table format (sources/txnlog),
    ivm_03 exactly-once streaming IVM (view + batch id in one atomic
    commit), cdc_02 change-data feed (Delta-CDF diff of the
    version-asymmetric file sets), cdc_03 per-version change feed
    (readChangeFeed shape, intermediate states visible), fun_01
    funnel conversion (JVM
    ordered-chain fold), col_01 PMI collocations (integer-division
    lift ranking), mba_01 market-basket association (bounded basket
    pair explosion), sky_01 Pareto skyline (monotone frontier, no
    self-join), rfm_01 RFM segmentation (closed-form NTILE on the
    distributed global rank), fed_02 federated overlap (HLL
    inclusion-exclusion, bounded self-check), fed_03 KMV/theta
    overlap (the estimate itself hash-certified), cor_01 grouped
    Pearson correlation (exact decimal moment sums), surv_01
    Kaplan-Meier survival curves (bit-identical ordered product
    folds), and ab_01 two-proportion z-test (IEEE-exact closed
    form)."""
    from . import (bloomjoin, dedup, entity, maintenance, roundtrips,
                   similarity)
    out = _tag(bloomjoin.blm_01(spark, sf), "blm",
               F.concat_ws("|", "o_orderpriority", "n_orders",
                           F.round(F.col("revenue") * 100).cast("long")))
    out = out.unionByName(_tag(
        textops.kw_01(spark, sf), "kw",
        F.concat_ws("|", "doc_id", "rnk", "term", "score_s")))
    out = out.unionByName(_tag(
        entity.er_03(spark, sf), "er3",
        F.concat_ws("|", "i", "j", "dist")))
    out = out.unionByName(_tag(
        similarity.ann_pq(spark, sf), "pq",
        F.concat_ws("|", "q_id",
                    F.col("planted_at_rank1").cast("string"))))
    out = out.unionByName(_tag(
        dedup.ded_embed2(spark, sf), "de2",
        F.concat_ws("|", "i", "j",
                    F.round(F.col("cos") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        relational.ret_01(spark, sf), "ret",
        F.concat_ws("|", F.date_format("cohort", "yyyy-MM-dd"),
                    "day_offset", "n_active", "n_cohort",
                    F.round(F.col("retention") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        relational.trn_01(spark, sf), "trn",
        F.concat_ws("|", "src", "dst", "n",
                    F.round(F.col("p") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        multimodal.mm_phash(spark, sf), "ph",
        F.concat_ws("|", "i", "j", "kind",
                    F.col("paired").cast("string"))))
    out = out.unionByName(_tag(
        dedup.ded_ngram2(spark, sf), "ng2",
        F.concat_ws("|", "i", "j",
                    F.round(F.col("jac") * 1000).cast("long"))))
    out = out.unionByName(_tag(
        roundtrips.ups_02(spark, sf), "ups2",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.date_format("start_date", "yyyy-MM-dd HH:mm:ss"),
                    "inout_cd")))
    out = out.unionByName(_tag(
        maintenance.ivm_03(spark, sf), "ivm3",
        F.concat_ws("|", "c_nationkey", "n_orders",
                    F.round(F.col("revenue") * 100).cast("long"))))
    out = out.unionByName(_tag(
        roundtrips.cdc_02(spark, sf), "cdc",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.date_format("start_date", "yyyy-MM-dd HH:mm:ss"),
                    "inout_cd", "change_type")))
    out = out.unionByName(_tag(
        roundtrips.stats_01(spark, sf), "st1",
        F.concat_ws("|", "col", "n_rows", "n_nulls",
                    F.coalesce(F.round(F.col("min_v") * 10_000)
                               .cast("long").cast("string"),
                               F.lit("none")),
                    F.coalesce(F.round(F.col("max_v") * 10_000)
                               .cast("long").cast("string"),
                               F.lit("none")))))
    out = out.unionByName(_tag(
        roundtrips.cdc_03(spark, sf), "cdc3",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.date_format("start_date", "yyyy-MM-dd HH:mm:ss"),
                    "inout_cd", "change_type", "commit_version")))
    out = out.unionByName(_tag(
        relational.fun_01(spark, sf), "fun",
        F.concat_ws("|", "step_idx", "step", "n_users",
                    F.round(F.col("conversion") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        textops.col_01(spark, sf), "col",
        F.concat_ws("|", "w1", "w2", "n", "lift_s")))
    out = out.unionByName(_tag(
        relational.ab_01(spark, sf), "ab",
        F.concat_ws("|", "n0", "x0", "n1", "x1", "rate0_s", "rate1_s",
                    "z_s")))
    out = out.unionByName(_tag(
        relational.surv_01(spark, sf), "srv",
        F.concat_ws("|", "arm", "t_days", "n_risk", "d", "surv_s")))
    out = out.unionByName(_tag(
        relational.cor_01(spark, sf), "cor",
        F.concat_ws("|", "l_returnflag", "n", "corr_s")))
    out = out.unionByName(_tag(
        cohort.fed_03(spark, sf), "fed3",
        F.concat_ws("|", "exact_union", "exact_overlap", "sample_n",
                    "est", F.col("within_bound").cast("string"))))
    out = out.unionByName(_tag(
        cohort.fed_02(spark, sf), "fed2",
        F.concat_ws("|", "exact_a", "exact_b", "exact_union",
                    "exact_overlap",
                    F.col("within_bound").cast("string"))))
    out = out.unionByName(_tag(
        relational.rfm_01(spark, sf), "rfm",
        F.concat_ws("|", "r_score", "f_score", "m_score", "n_customers",
                    F.round(F.col("segment_revenue") * 100).cast("long"))))
    out = out.unionByName(_tag(
        relational.mba_01(spark, sf), "mba",
        F.concat_ws("|", "p1", "p2", "sup", "m1", "m2", "lift_s")))
    out = out.unionByName(_tag(
        relational.sky_01(spark, sf), "sky",
        F.concat_ws("|", "p_brand", "p_partkey",
                    F.round(F.col("price") * 100).cast("long"), "size")))
    return out.orderBy("tag", "v")


def _r9b_all_oracle() -> str:
    from . import (bloomjoin, dedup, entity, maintenance, roundtrips,
                   similarity)

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("blm", cat("o_orderpriority", "n_orders",
                    "CAST(ROUND(revenue * 100) AS BIGINT)"),
         bloomjoin._BLM_ORACLE),
        ("kw", cat("doc_id", "rnk", "term", "score_s"),
         textops._kw_oracle()),
        ("er3", cat("i", "j", "dist"), entity._er3_oracle()),
        ("pq", cat("q_id", "planted_at_rank1"),
         similarity._PLANTED_ORACLE),
        ("de2", cat("i", "j", "CAST(ROUND(cos * 10000) AS BIGINT)"),
         dedup._EMBED2_ORACLE),
        ("ret", "strftime(cohort, '%Y-%m-%d') || '|' || "
                + cat("day_offset", "n_active", "n_cohort",
                      "CAST(ROUND(retention * 10000) AS BIGINT)"),
         relational._ORACLES["ret_01"]),
        ("trn", cat("src", "dst", "n",
                    "CAST(ROUND(p * 10000) AS BIGINT)"),
         relational._ORACLES["trn_01"]),
        ("ph", cat("i", "j", "kind", "paired"),
         multimodal._MM_PHASH_ORACLE),
        ("ng2", cat("i", "j", "CAST(ROUND(jac * 1000) AS BIGINT)"),
         dedup._NGRAM_ORACLE),
        ("ups2", cat("encounter_num", "patient_num") + " || '|' || "
                 "strftime(start_date, '%Y-%m-%d %H:%M:%S') || '|' || "
                 "inout_cd",
         roundtrips._ups_01_oracle()),
        ("ivm3", cat("c_nationkey", "n_orders",
                     "CAST(ROUND(revenue * 100) AS BIGINT)"),
         maintenance._IVM_ORACLE),
        ("cdc", cat("encounter_num", "patient_num") + " || '|' || "
                "strftime(start_date, '%Y-%m-%d %H:%M:%S') || '|' || "
                "inout_cd || '|' || change_type",
         roundtrips._cdc_02_oracle()),
        ("st1", "col || '|' || CAST(n_rows AS VARCHAR) || '|' || "
                "CAST(n_nulls AS VARCHAR) || '|' || "
                "COALESCE(CAST(CAST(ROUND(min_v * 10000) AS BIGINT) "
                "AS VARCHAR), 'none') || '|' || "
                "COALESCE(CAST(CAST(ROUND(max_v * 10000) AS BIGINT) "
                "AS VARCHAR), 'none')",
         roundtrips._STATS_01_ORACLE),
        ("cdc3", cat("encounter_num", "patient_num") + " || '|' || "
                 "strftime(start_date, '%Y-%m-%d %H:%M:%S') || '|' || "
                 "inout_cd || '|' || change_type || '|' || "
                 "CAST(commit_version AS VARCHAR)",
         roundtrips._cdc_03_oracle()),
        ("fun", cat("step_idx", "step", "n_users",
                    "CAST(ROUND(conversion * 10000) AS BIGINT)"),
         relational._ORACLES["fun_01"]),
        ("col", cat("w1", "w2", "n", "lift_s"),
         textops._col_oracle()),
        ("ab", cat("n0", "x0", "n1", "x1", "rate0_s", "rate1_s",
                   "z_s"),
         relational._ORACLES["ab_01"]),
        ("srv", cat("arm", "t_days", "n_risk", "d", "surv_s"),
         relational._ORACLES["surv_01"]),
        ("cor", cat("l_returnflag", "n", "corr_s"),
         relational._ORACLES["cor_01"]),
        ("fed3", cat("exact_union", "exact_overlap", "sample_n",
                     "est", "within_bound"),
         cohort._ORACLES["fed_03"]),
        ("fed2", cat("exact_a", "exact_b", "exact_union",
                     "exact_overlap", "within_bound"),
         cohort._ORACLES["fed_02"]),
        ("rfm", cat("r_score", "f_score", "m_score", "n_customers",
                    "CAST(ROUND(segment_revenue * 100) AS BIGINT)"),
         relational._ORACLES["rfm_01"]),
        ("mba", cat("p1", "p2", "sup", "m1", "m2", "lift_s"),
         relational._ORACLES["mba_01"]),
        ("sky", cat("p_brand", "p_partkey",
                    "CAST(ROUND(price * 100) AS BIGINT)", "size"),
         relational._ORACLES["sky_01"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r10_all(spark, sf):
    """Round-10 certification union (same-round driver certification,
    the r8/r9 discipline): the NEW r10 operators — pvt_01 explicit
    PIVOT/UNPIVOT roundtrip, gsets_01 GROUPING SETS subtotal lattice
    with grouping_id, smp_04 deterministic mergeable bottom-k hash
    sample (KMV), curr_01 curriculum difficulty deciles on the
    distributed global rank — plus the two CORE50 fold-ins VERDICT r9
    item 7 named, reusing their builders verbatim so the window slot
    still certifies the same semantics: ann_topk exact brute-force
    cosine top-k (slot donor) and ded_simhash planted-duplicate
    certification (slot donor; its banding generics stay exercised by
    mm_phash in r9b_all too)."""
    from . import dedup, similarity
    out = _tag(relational.pvt_01(spark, sf), "pvt",
               F.concat_ws("|", "m", "o_orderstatus",
                           F.round(F.col("rev") * 100).cast("long")))
    out = out.unionByName(_tag(
        relational.gsets_01(spark, sf), "gs",
        F.concat_ws("|", "s", "m", "gid", "n",
                    F.round(F.col("rev") * 100).cast("long"))))
    out = out.unionByName(_tag(
        relational.smp_04(spark, sf), "smp4",
        F.concat_ws("|", "o_orderkey", "pr")))
    out = out.unionByName(_tag(
        textops.curr_01(spark, sf), "curr",
        F.concat_ws("|", "doc_id", "n_tokens", "n_rare", "diff_s",
                    "bucket")))
    out = out.unionByName(_tag(
        similarity.ann_topk(spark, sf), "topk",
        F.concat_ws("|", "q_id", "neighbor_id", "rank",
                    F.round(F.col("cos") * 10_000).cast("long"))))
    out = out.unionByName(_tag(
        dedup.ded_simhash(spark, sf), "sim",
        F.concat_ws("|", "i", "j",
                    F.col("simhash_found").cast("string"))))
    return out.orderBy("tag", "v")


def _r10_all_oracle() -> str:
    from . import dedup, similarity

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("pvt", cat("m", "o_orderstatus",
                    "CAST(ROUND(rev * 100) AS BIGINT)"),
         relational._ORACLES["pvt_01"]),
        ("gs", cat("s", "m", "gid", "n",
                   "CAST(ROUND(rev * 100) AS BIGINT)"),
         relational._ORACLES["gsets_01"]),
        ("smp4", cat("o_orderkey", "pr"),
         relational._ORACLES["smp_04"]),
        ("curr", cat("doc_id", "n_tokens", "n_rare", "diff_s",
                     "bucket"),
         textops._ORACLES["curr_01"]),
        ("topk", cat("q_id", "neighbor_id", "rank",
                     "CAST(ROUND(cos * 10000) AS BIGINT)"),
         similarity._TOPK_ORACLE),
        ("sim", cat("i", "j", "simhash_found"),
         dedup._SIMHASH_ORACLE),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r10b_all(spark, sf):
    """Round-10 second-wave certification union (same-round driver
    certification for the operators that landed after r10_all froze),
    builders verbatim: jn_11 forward/tolerance as-of join (the
    merge_asof(direction='forward') verb on one shuffle), reg_01
    grouped OLS regression from exact decimal moment sums, and cpd_01
    CUSUM changepoint detection with the n-scaled exact-integer
    statistic; plus the ded_incr fold-in (its CORE50 slot donor —
    ded_incr's builder already rides r9_all's "dinc" branch verbatim,
    so this union inherits the freed slot rather than duplicating the
    branch)."""
    out = _tag(relational.jn_11(spark, sf), "asof",
               F.concat_ws("|", "event_id",
                           F.coalesce(F.col("nxt_val").cast("string"),
                                      F.lit("none"))))
    out = out.unionByName(_tag(
        relational.reg_01(spark, sf), "reg",
        F.concat_ws("|", "l_returnflag", "n", "slope_s", "icept_s")))
    out = out.unionByName(_tag(
        relational.cpd_01(spark, sf), "cpd",
        F.concat_ws("|",
                    F.unix_micros(F.col("d").cast("timestamp"))
                     .cast("string"),
                    "x", "c_s", F.col("peak").cast("string"))))
    out = out.unionByName(_tag(
        relational.jn_12(spark, sf), "q17",
        F.concat_ws("|", "n_items",
                    F.round(F.col("rev") * 100).cast("long"))))
    out = out.unionByName(_tag(
        relational.agg_13(spark, sf), "mcd",
        F.concat_ws("|", "o_orderpriority", "n", "n_cust", "n_status",
                    "n_dates")))
    out = out.unionByName(_tag(
        relational.win_08(spark, sf), "wau",
        F.concat_ws("|",
                    F.unix_micros(F.col("day").cast("timestamp"))
                     .cast("string"), "wau")))
    from . import packing
    out = out.unionByName(_tag(
        packing.shard_01(spark, sf), "shd",
        F.concat_ws("|", "shard", "n_docs", "tokens", "dev_bp")))
    out = out.unionByName(_tag(
        cohort.priv_03(spark, sf), "pv3",
        F.concat_ws("|", "pid", "n_visits", "shift_d", "first_s",
                    "span_s")))
    return out.orderBy("tag", "v")


def _r10b_all_oracle() -> str:
    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("asof", "CAST(event_id AS VARCHAR) || '|' || "
                 "COALESCE(CAST(nxt_val AS VARCHAR), 'none')",
         relational._ORACLES["jn_11"]),
        ("reg", cat("l_returnflag", "n", "slope_s", "icept_s"),
         relational._ORACLES["reg_01"]),
        ("cpd", "CAST(epoch_us(d) AS VARCHAR) || '|' || "
                + cat("x", "c_s", "peak"),
         relational._ORACLES["cpd_01"]),
        ("q17", cat("n_items", "CAST(ROUND(rev * 100) AS BIGINT)"),
         relational._ORACLES["jn_12"]),
        ("mcd", cat("o_orderpriority", "n", "n_cust", "n_status",
                    "n_dates"),
         relational._ORACLES["agg_13"]),
        ("wau", "CAST(epoch_us(day) AS VARCHAR) || '|' || "
                "CAST(wau AS VARCHAR)",
         relational._ORACLES["win_08"]),
        ("shd", cat("shard", "n_docs", "tokens", "dev_bp"),
         __import__("docker_aktin_dwh_spark.operators.packing",
                    fromlist=["x"])._SHARD_ORACLE),
        ("pv3", cat("pid", "n_visits", "shift_d", "first_s", "span_s"),
         cohort._ORACLES["priv_03"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r11_all(spark, sf):
    """Round-11 certification union (same-round driver certification,
    the r8/r9/r10 discipline): the NEW r11 operator sdd_01 — SemDeDup
    semantic dedup (k-means clusters + cluster-bounded pairwise cosine
    prune, planted duplicates certified through the unrolled-SQL Lloyd
    oracle) — plus the ded_minhash fold-in VERDICT r10 item 7 named
    (slot donor; its builder rides verbatim, and its banding generics
    stay exercised by pipe_02/pipe_03's chains too)."""
    from concurrent.futures import ThreadPoolExecutor

    from . import dedup, roundtrips
    # sdd_01 (eager k-means collects) and rst_01 (eager txnlog
    # roundtrip) build concurrently — the str_out discipline
    with ThreadPoolExecutor(max_workers=2) as _ex:
        _fs = _ex.submit(dedup.sdd_01, spark, sf)
        _fr = _ex.submit(roundtrips.rst_01, spark, sf)
    out = _tag(_fs.result(), "sdd",
               F.concat_ws("|", "cid", "i", "j",
                           F.round(F.col("cos_r") * 10_000)
                            .cast("long")))
    out = out.unionByName(_tag(
        dedup.ded_minhash(spark, sf), "mh",
        F.concat_ws("|", "i", "j",
                    F.round(F.col("jac") * 1000).cast("long"))))
    out = out.unionByName(_tag(
        _fr.result(), "rst",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.unix_micros(F.col("start_date")
                                  .cast("timestamp")).cast("string"),
                    "inout_cd")))
    return out.orderBy("tag", "v")


def _r11_all_oracle() -> str:
    from . import dedup

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("sdd", cat("cid", "i", "j",
                    "CAST(ROUND(cos_r * 10000) AS BIGINT)"),
         dedup._sdd_oracle()),
        ("mh", cat("i", "j", "CAST(ROUND(jac * 1000) AS BIGINT)"),
         dedup._MINHASH_ORACLE),
        ("rst", "CAST(encounter_num AS VARCHAR) || '|' || "
                "CAST(patient_num AS VARCHAR) || '|' || "
                "CAST(epoch_us(start_date) AS VARCHAR) || '|' || "
                "inout_cd",
         __import__("docker_aktin_dwh_spark.operators.roundtrips",
                    fromlist=["x"])._rst_01_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r12_all(spark, sf):
    """Round-12 certification union (same-round driver certification,
    the r8-r11 discipline): the NEW r12 operators — var_01 (Spark 4
    VariantType schema-on-read analytics) and sdd_02 (INCREMENTAL
    SemDeDup: arrivals assigned to frozen corpus centroids, pruned
    only against existing cluster members) — builders verbatim.  The
    slot comes from udf_02, which folds into udf_px's gstat branch."""
    from concurrent.futures import ThreadPoolExecutor

    from . import dedup
    with ThreadPoolExecutor(max_workers=2) as _ex:
        _fs = _ex.submit(dedup.sdd_02, spark, sf)
        _fv = _ex.submit(var_01, spark, sf)
    out = _tag(_fv.result(), "var",
               F.concat_ws("|", "mtype", "n", "sum_k", "sum_t0",
                           "sum_mv", "n_coerced"))
    out = out.unionByName(_tag(
        _fs.result(), "sdd2",
        F.concat_ws("|", "cid", "i", "j",
                    F.round(F.col("cos_r") * 10_000).cast("long"))))
    return out.orderBy("tag", "v")


def _r12_all_oracle() -> str:
    from . import dedup

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("var", cat("mtype", "n", "sum_k", "sum_t0", "sum_mv",
                    "n_coerced"), _VAR_01_ORACLE),
        ("sdd2", cat("cid", "i", "j",
                     "CAST(ROUND(cos_r * 10000) AS BIGINT)"),
         dedup._sdd_02_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r13_all(spark, sf):
    """Round-13 certification union (same-round driver certification,
    the r8-r12 discipline): the NEW r13 operator colmap_01 — column
    mapping: rename/drop as metadata-only txnlog commits, merge on
    the renamed column, time travel across the rename, fresh-physical
    re-add (no resurrection), CDC across all of it — plus the cdc_04
    fold-in (slot donor; its atomic-apply builder rides verbatim)."""
    from concurrent.futures import ThreadPoolExecutor

    from . import roundtrips
    # all three are eager roundtrips — build concurrently
    with ThreadPoolExecutor(max_workers=3) as _ex:
        _fm = _ex.submit(roundtrips.colmap_01, spark, sf)
        _fc = _ex.submit(roundtrips.cdc_04, spark, sf)
        _fv = _ex.submit(var_02, spark, sf)
    out = _tag(_fm.result(), "cm",
               F.concat_ws("|", "arm", "change_type", "encounter_num",
                           "patient_num",
                           F.unix_micros(F.col("ts").cast("timestamp"))
                            .cast("string"),
                           F.coalesce(F.col("io"), F.lit("NUL"))))
    out = out.unionByName(_tag(
        _fc.result(), "cdc4",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.unix_micros(F.col("start_date")
                                  .cast("timestamp")).cast("string"),
                    "inout_cd")))
    out = out.unionByName(_tag(
        _fv.result(), "vs",
        F.concat_ws("|", "arm", "mtype", "n", "sum_k", "sum_t0",
                    "sum_mv")))
    return out.orderBy("tag", "v")


def _r13_all_oracle() -> str:
    from . import roundtrips

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("cm", cat("arm", "change_type", "encounter_num",
                   "patient_num", "epoch_us(ts)",
                   "COALESCE(io, 'NUL')"),
         roundtrips._colmap_01_oracle()),
        ("cdc4", cat("encounter_num", "patient_num",
                     "epoch_us(start_date)", "inout_cd"),
         roundtrips._cdc_04_oracle()),
        ("vs", cat("arm", "mtype", "n", "sum_k", "sum_t0", "sum_mv"),
         _VAR_02_ORACLE),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


def r14_all(spark, sf):
    """Round-14 certification union (same-round driver certification,
    the r8-r13 discipline): the NEW r14 operator part_01 — partitioned
    txnlog tables: hive-layout create, partition-scoped merge,
    partition-pruned read (plan-asserted in the builder),
    metadata-only DROP PARTITION, time travel + CDC across all of
    it — plus the ups_01 fold-in (slot donor; its upsert-sink
    roundtrip builder rides verbatim)."""
    from concurrent.futures import ThreadPoolExecutor

    from . import roundtrips
    with ThreadPoolExecutor(max_workers=3) as _ex:
        _fp = _ex.submit(roundtrips.part_01, spark, sf)
        _fu = _ex.submit(roundtrips.ups_01, spark, sf)
        _fd = _ex.submit(roundtrips.upd_01, spark, sf)
    out = _tag(_fp.result(), "pt",
               F.concat_ws("|", "arm", "change_type", "encounter_num",
                           "patient_num",
                           F.unix_micros(F.col("ts").cast("timestamp"))
                            .cast("string"),
                           F.coalesce(F.col("io"), F.lit("NUL"))))
    out = out.unionByName(_tag(
        _fu.result(), "ups",
        F.concat_ws("|", "encounter_num", "patient_num",
                    F.unix_micros(F.col("start_date")
                                  .cast("timestamp")).cast("string"),
                    "inout_cd")))
    out = out.unionByName(_tag(
        _fd.result(), "upd",
        F.concat_ws("|", "arm", "change_type", "encounter_num",
                    "patient_num",
                    F.unix_micros(F.col("ts").cast("timestamp"))
                     .cast("string"), "io")))
    return out.orderBy("tag", "v")


def _r14_all_oracle() -> str:
    from . import roundtrips

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("pt", cat("arm", "change_type", "encounter_num",
                   "patient_num", "epoch_us(ts)",
                   "COALESCE(io, 'NUL')"),
         roundtrips._part_01_oracle()),
        ("ups", cat("encounter_num", "patient_num",
                    "epoch_us(start_date)", "inout_cd"),
         roundtrips._ups_01_oracle()),
        ("upd", cat("arm", "change_type", "encounter_num",
                    "patient_num", "epoch_us(ts)", "io"),
         roundtrips._upd_01_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)



def _r9_all_oracle() -> str:
    from . import dedup, graph, similarity

    def cat(*cols):
        return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)

    branches = [
        ("jpg", cat("doc_id", "jpg_w", "jpg_h",
                    "CAST(ROUND(jpg_luma * 1000000) AS BIGINT)",
                    "jpg_exact"), multimodal._ORACLES["mm_jpg"]),
        ("mm4", cat("doc_id", "frame_idx", "frame_md5"),
         multimodal._ORACLES["mm_04"]),
        ("emb", cat("g", "dims", "CAST(ROUND(l2 * 10000) AS BIGINT)"),
         similarity._EMB01_ORACLE),
        ("dinc", cat("i", "j", "CAST(ROUND(jac * 1000) AS BIGINT)"),
         dedup._ORACLES["ded_incr"]),
        ("sq", cat("q_id", "planted_at_rank1"),
         similarity._PLANTED_ORACLE),
        ("km", cat("cid", "n",
                   "CAST(ROUND(cnorm * 1000000) AS BIGINT)",
                   "CAST(ROUND(inertia * 1000000) AS BIGINT)"),
         similarity._km_oracle()),
        ("sub", cat("doc_id", "n_spans", "n_dup_spans",
                    "CAST(ROUND(dup_frac * 10000) AS BIGINT)"),
         dedup._SUBSTR_ORACLE),
        ("tri", cat("doc_id", "degree", "n_tri"),
         graph._tri_oracle()),
        ("qc", cat("lang", "n_docs", "n_pred_en",
                   "CAST(ROUND(mean_margin * 1000000) AS BIGINT)"),
         textops._qc_oracle()),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tag, {v} AS v FROM ({q})" for t, v, q in branches)


# ------------------------------------------------------------------ registry

_DOCS = {
    "flt_all": "FLT-01..07 + SMP-01 tagged union (all predicate kinds)",
    "jn_misc": "JN-04/05/06/07/10 louter/semi/anti/self/cross tagged union",
    "llm_all": "LLM-pipeline batch ops tagged union (pack/mix/chunk/"
               "vocab/decon/dupcc)",
    "agg_core": "AGG-01/02/04/05/08/09/10 single-pass grouped aggregate",
    "agg_olap": "AGG-06/07 histogram + CUBE subtotal lattice",
    "win_all": "WIN-01..06 + SRT-01/02 single windowed pass + top-k",
    "set_all": "SET-01..05 tagged union",
    "fn_pl": "FN-STR/ARR/MATH/CAST one-pass projection (lineitem ⋈ part)",
    "fn_ord": "FN-COND/DT/HASH + PRJ-02 projection (orders)",
    "fn_ev": "FN-DT2/MAP/JSON projection (events)",
    "var_01": "FN-VARIANT (r12): Spark 4 VariantType schema-on-read "
              "over nested event JSON — parse_json once, typed "
              "variant_get paths (nested object / embedded props / "
              "array index), try_variant_get coercion contract",
    "str_tw": "STR-02/03 tumbling + sliding window counts (batch form)",
    "str_sd": "STR-04 session + STR-06 dedup tagged union (batch form)",
    "str_win": "STR-02/03/04/06 consolidated tagged union (batch "
               "forms; CORE50 slot — fine-grained str_tw/str_sd stay "
               "post-50)",
    "maint_all": "Maintenance/federation tagged union (cdc/scd/lay/dq/"
                 "rollup/fed_hll/hh/lm) — driver-certifies the round-6 "
                 "family",
    "str_08": "STR-08 stream–static broadcast enrich (batch form)",
    "coh_panel": "Cohort panel AND/OR/NOT (coh_01..03)",
    "coh_enc": "Cohort same-encounter + value/date-by-sex (coh_04/05)",
    "coh_tmp": "Cohort occurrence + temporal pair (coh_06/07)",
    "coh_misc": "coh_04..07 consolidated tagged union (CORE50 slot; "
                "fine-grained pair keys stay post-50)",
    "udf_px": "udf_01 + udf_04 consolidated (pandas_udf + mapInPandas "
              "lanes, CORE50 slot)",
    "ext_all": "Round-6 second-wave extensions tagged union (seq/ts/lm/"
               "orc/mapInArrow/pipe_03) — driver-certified",
    "udf_tf": "UDF-03 Python UDTF lateral shred → token counts",
    "text_all": "All text-analysis metrics in one documents scan",
    "mm_decode": "Multimodal decode (stub fallback lane, sha256-"
                 "reproducing oracle) + REAL stdlib-PNG pixel decode "
                 "and REAL nearest-neighbor resize vs analytic oracle",
    "fin_all": "Round-6 final-wave batch tagged union (dupsel/pack2/"
               "shuf/split/bplate/jsonl/prof/priv/fed/agg12) — "
               "driver-certifies the last post-50 batch keys",
    "str_out": "Streaming-native tagged union: str_12 LEFT OUTER "
               "stream-stream join + str_13 event-time-timer "
               "sessionization + str_14 native session_window + "
               "str_15 HLL-in-state-store windowed distinct + "
               "str_16 exactly-once re-delivery dedup + str_17 "
               "streaming Count-Min sketch (bounded-state partial "
               "merges; driver-certified)",
    "r7_all": "Round-7 batch extensions tagged union (bm25/er/pr/"
              "win07/srcevo/dq2/mix2) — driver-certifies the r7 "
              "post-50 keys",
    "r8_all": "Round-8 new-operator tagged union (er2/vq/tok/smp3/"
              "priv2/gif/vid/lay2/ivm/ivm2/bkt/cms/ont2/ont3/pipe4) "
              "— same-round driver certification",
    "ann_bx": "Bucketed-ANN consolidated union (ann_lsh + ann_ivf "
              "planted-rank1 certifications; CORE50 slot)",
    "r9_all": "Round-9 tagged union: REAL baseline-JPEG decode "
              "(mm_jpg, hand-written ITU T.81 codec) + IVF-SQ "
              "quantized-index ANN (ann_sq) + distributed Lloyd "
              "k-means (km_01) + exact-substring dedup (ded_substr) "
              "+ Naive-Bayes quality classifier (qc_01) + triangle "
              "census of the near-dup graph (tri_01) + CORE50 "
              "fold-ins mm_04/emb_01/ded_incr — same-round driver "
              "certification",
    "r9b_all": "Round-9 second-wave tagged union: Bloom-pruned "
               "semi-join (blm_01), TF-IDF keyword top-k (kw_01), "
               "sorted-neighborhood entity resolution on the "
               "distributed global rank (er_03), flat product "
               "quantization with ADC scoring (ann_pq), and "
               "LSH-bucketed embedding near-dup (ded_embed2), "
               "cohort retention matrix (ret_01), event-type "
               "transition matrix (trn_01), and image near-dup by "
               "DCT perceptual hash (mm_phash), prefix-filtered "
               "exact Jaccard dedup (ded_ngram2), the commit-log "
               "table-format ACID MERGE (ups_02), exactly-once "
               "streaming IVM on the txn log (ivm_03), change-data "
               "feed from the version-asymmetric file sets (cdc_02), "
               "funnel conversion (fun_01), PMI collocations "
               "(col_01), market-basket association by lift "
               "(mba_01), the per-brand Pareto skyline as a "
               "monotone frontier (sky_01), RFM quartile "
               "segmentation on the distributed global rank (rfm_01), "
               "federated patient overlap via HLL "
               "inclusion-exclusion (fed_02), grouped Pearson "
               "correlation with exact decimal moment sums (cor_01), "
               "Kaplan-Meier survival curves with bit-identical "
               "ordered product folds (surv_01), the two-proportion "
               "conversion z-test (ab_01), and KMV/theta-sketch "
               "overlap with the estimate itself hash-certified "
               "(fed_03) — same-round driver certification",
    "r10_all": "Round-10 tagged union: PIVOT/UNPIVOT roundtrip "
               "(pvt_01), GROUPING SETS subtotal lattice with "
               "grouping_id (gsets_01), deterministic mergeable "
               "bottom-k hash sample (smp_04, KMV), curriculum "
               "difficulty deciles on the distributed global rank "
               "(curr_01) + CORE50 fold-ins ann_topk/ded_simhash — "
               "same-round driver certification",
    "r10b_all": "Round-10 second-wave tagged union: forward/tolerance "
                "as-of join (jn_11, merge_asof direction=forward), "
                "grouped OLS regression from exact decimal moments "
                "(reg_01), CUSUM changepoint with the n-scaled "
                "exact-integer statistic (cpd_01), Q17-shape "
                "decorrelated scalar subquery (jn_12), and one-pass "
                "multi-column COUNT DISTINCT (agg_13), and the "
                "rolling 7-day distinct active users via bounded "
                "day-bucket explode (win_08), the coordination-free "
                "training-shard manifest with certified balance "
                "(shard_01), and date-shift pseudonymization whose "
                "hash match proves interval preservation (priv_03) — "
                "same-round driver certification (slot donated by "
                "ded_incr, which rides r9_all's dinc branch "
                "verbatim)",
    "r11_all": "Round-11 tagged union: SemDeDup semantic dedup "
               "(sdd_01 — k-means clusters + cluster-bounded pairwise "
               "cosine prune, planted duplicates certified through "
               "the unrolled-SQL Lloyd oracle), the RESTORE roundtrip "
               "(rst_01 — metadata-only rollback hash-certified "
               "against the base selection), and the ded_minhash "
               "CORE50 fold-in (builder verbatim) — same-round driver "
               "certification",
    "r12_all": "Round-12 tagged union: Spark 4 VariantType "
               "schema-on-read analytics (var_01 — parse_json + typed "
               "variant_get paths vs a DuckDB json_extract oracle) "
               "and INCREMENTAL SemDeDup (sdd_02 — arrivals assigned "
               "to frozen corpus centroids, pruned only against "
               "existing cluster members; frozen assignment + "
               "asymmetric prune hash-certified) — same-round driver "
               "certification; the slot comes from udf_02's fold "
               "into udf_px",
    "var_02": "Variant SHREDDING (r13): the var_01 documents written "
              "with typed subcolumns for three paths (Parquet "
              "variant-shredding spec's typed_value lane, "
              "try_variant_get no-coercion rule) beside the variant "
              "residual; arms read back from the shredded parquet — "
              "typed-column aggregate, a pushed-down filter on the "
              "shredded column, and a per-path typed-vs-residual "
              "reconstruction certificate the oracle pins at 0",
    "r13_all": "Round-13 tagged union: column mapping (colmap_01 — "
               "rename/drop as metadata-only txnlog commits, merge on "
               "the renamed column, time travel across the rename, "
               "fresh-physical re-add with no resurrection, CDC "
               "endpoint diff across all of it), variant shredding "
               "(var_02 — typed subcolumns + residual, pushdown on a "
               "shredded path, reconstruction certificate), plus the "
               "cdc_04 atomic-CDC-apply fold-in (slot donor; builder "
               "verbatim) — same-round driver certification",
    "r14_all": "Round-14 tagged union: partitioned txnlog tables "
               "(part_01 — hive-layout create, partition-scoped "
               "merge, partition-pruned read (plan-asserted), "
               "metadata-only DROP PARTITION, time travel + CDC "
               "across it all), the atomic UPDATE verb (upd_01 — "
               "conjunction-pruned merge-on-read update + CDC "
               "pre/post pairs), plus the ups_01 upsert-sink fold-in "
               "(slot donor; builder verbatim) — same-round driver "
               "certification",
}


def specs() -> list[QuerySpec]:
    oracles = {
        "flt_all": _flt_all_oracle(),
        "jn_misc": _jn_misc_oracle(),
        "llm_all": _llm_all_oracle(),
        "agg_core": _AGG_CORE_ORACLE,
        "agg_olap": _AGG_OLAP_ORACLE,
        "win_all": _WIN_ALL_ORACLE,
        "set_all": _set_all_oracle(),
        "fn_pl": _FN_PL_ORACLE,
        "fn_ord": _FN_ORD_ORACLE,
        "fn_ev": _FN_EV_ORACLE,
        "var_01": _VAR_01_ORACLE,
        "var_02": _VAR_02_ORACLE,
        "str_tw": _str_tw_oracle(),
        "str_sd": _str_sd_oracle(),
        "str_win": _str_win_oracle(),
        "maint_all": _maint_all_oracle(),
        "coh_misc": _coh_misc_oracle(),
        "udf_px": _udf_px_oracle(),
        "ext_all": _ext_all_oracle(),
        "str_08": _STR_08_ORACLE,
        "coh_panel": _coh_panel_oracle(),
        "coh_enc": _coh_enc_oracle(),
        "coh_tmp": _coh_tmp_oracle(),
        "udf_tf": _UDF_TF_ORACLE,
        "text_all": _text_all_oracle(),
        # mm_decode's pinned stub is sha256-pure → the oracle reproduces
        # it exactly; real pixel decode stays env-blocked (real_decode)
        "mm_decode": _MM_DECODE_ORACLE,
        "fin_all": _fin_all_oracle(),
        "str_out": _str_out_oracle(),
        "r7_all": _r7_all_oracle(),
        "r8_all": _r8_all_oracle(),
        "ann_bx": _ann_bx_oracle(),
        "r9_all": _r9_all_oracle(),
        "r9b_all": _r9b_all_oracle(),
        "r10_all": _r10_all_oracle(),
        "r10b_all": _r10b_all_oracle(),
        "r11_all": _r11_all_oracle(),
        "r12_all": _r12_all_oracle(),
        "r13_all": _r13_all_oracle(),
        "r14_all": _r14_all_oracle(),
    }
    g = globals()
    return [QuerySpec(key=k, fn=g[k], oracle=oracles.get(k), doc=d,
                      tags=("combined",))
            for k, d in _DOCS.items()]
