"""Relational core — SURVEY.md §2.2–§2.8 declared operators.

Each builder is the idiomatic DataFrame expression of a query shape the
provisioned i2b2/AKTIN workload issues against PostgreSQL (operator
anchors in SURVEY.md §2; the reference itself implements no operators —
it provisions postgres:14, reference src/docker/database/Dockerfile:8).

Plan hygiene notes (100 TB posture):
- dimension joins broadcast (JN-02) — no shuffle of the fact side;
- aggregations are partial+final hash aggs (map-side combine for free);
- filters/projections sit directly on the parquet scan (pushdown —
  asserted in tests/test_plans.py);
- the range join (JN-08) is bucketized: equi-join on a coarse time
  bucket + residual predicate, never a broadcast nested loop over the
  full fact table;
- the as-of join (JN-09) is union + ordered window, a single shuffle by
  key instead of a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.determinism import davg, dsum, sql_davg, sql_dsum
from ..registry import QuerySpec
from . import temporal

T = catalog.load


# --------------------------------------------------------------- §2.2 PRJ/FLT

def prj_01(spark, sf):
    l = T(spark, sf, "lineitem")
    return l.select("l_orderkey", "l_quantity").orderBy("l_orderkey")


def prj_02(spark, sf):
    # VAT in exact decimal: price has 2-decimal semantics, so the
    # product has 4 — rounding the *double* product would be at the
    # mercy of shortest-repr vs binary rounding (engine-dependent).
    o = T(spark, sf, "orders")
    vat = F.round(o.o_totalprice.cast("decimal(18,2)")
                  * F.expr("CAST(0.19 AS DECIMAL(3,2))"), 2).cast("double")
    return o.select("o_orderkey", vat.alias("vat")).orderBy("o_orderkey")


def flt_01(spark, sf):
    l = T(spark, sf, "lineitem")
    return l.filter(l.l_returnflag == "R").orderBy("l_orderkey", "l_linenumber")


def flt_02(spark, sf):
    p = T(spark, sf, "part")
    return p.filter(p.p_size.between(10, 20)).orderBy("p_partkey")


def flt_03(spark, sf):
    o = T(spark, sf, "orders")
    return (o.filter((o.o_orderdate >= F.expr("timestamp_ntz'1995-01-01 00:00:00'"))
                     & (o.o_orderdate < F.expr("timestamp_ntz'1996-01-01 00:00:00'")))
             .agg(F.count("*").alias("n")))


def flt_04(spark, sf):
    p = T(spark, sf, "part")
    return p.filter(p.p_type.startswith("PROMO")).select("p_partkey") \
            .orderBy("p_partkey")


def flt_05(spark, sf):
    n = T(spark, sf, "nation")
    return n.filter(n.n_regionkey.isin(0, 2)).select("n_name").orderBy("n_name")


def flt_06(spark, sf):
    e = T(spark, sf, "events")
    return e.filter(e.props.isNotNull()).agg(F.count("*").alias("n"))


def flt_07(spark, sf):
    o = T(spark, sf, "orders")
    cond = ((o.o_orderstatus == "F") | (o.o_orderstatus == "O")) & \
           ~(o.o_orderpriority == "1-URGENT")
    return o.filter(cond).select("o_orderkey").orderBy("o_orderkey")


# ------------------------------------------------------------------- §2.3 JN

def jn_01(spark, sf):
    c, n = T(spark, sf, "customer"), T(spark, sf, "nation")
    return (c.join(n, c.c_nationkey == n.n_nationkey, "inner")
             .groupBy("n_name").agg(F.count("*").alias("c"))
             .orderBy("n_name"))


def jn_02(spark, sf):
    # same result as JN-01, explicit broadcast of the dimension —
    # plan-level assertion lives in tests/test_plans.py
    c, n = T(spark, sf, "customer"), T(spark, sf, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
             .groupBy("n_name").agg(F.count("*").alias("c"))
             .orderBy("n_name"))


def jn_03(spark, sf):
    """Star join: revenue per region (minimum end-to-end slice, SURVEY §7.1).

    Broadcast hints only on the FIXED-cardinality dims (nation: 25 rows,
    region: 5).  customer is a *growing* dimension (patients, in the
    clinical mapping) — a forced broadcast OOMs at 100×; the size-gated
    decision is left to the planner/AQE (autoBroadcastJoinThreshold),
    which still broadcasts it at fixture scale (tests/test_plans.py)."""
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = T(spark, sf, "region").select("r_regionkey", "r_name")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("r_name").agg(dsum("l_extendedprice").alias("rev"))
             .orderBy("r_name"))


def jn_04(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .groupBy("c_custkey").agg(F.count("o_orderkey").alias("n"))
             .orderBy("c_custkey"))


def jn_05(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    big = o.filter(o.o_totalprice > 100000)
    return (c.join(big, c.c_custkey == big.o_custkey, "left_semi")
             .select("c_custkey").orderBy("c_custkey"))


def jn_06(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey").orderBy("c_custkey"))


def jn_07(spark, sf):
    l = T(spark, sf, "lineitem")
    a = l.alias("a")
    b = l.alias("b")
    return (a.filter(F.col("a.l_orderkey") < 100)
             .join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_linenumber") < F.col("b.l_linenumber")))
             .select(F.col("a.l_orderkey").alias("l_orderkey"),
                     F.col("a.l_linenumber").alias("l_linenumber"),
                     F.col("b.l_linenumber").alias("other"))
             .orderBy("l_orderkey", "l_linenumber", "other"))


def jn_08(spark, sf):
    """Interval join: events within 5 minutes after an anchor event.

    Bucketized equi-join (temporal.range_join) — the scale-safe plan; a
    naive theta join would degenerate to BroadcastNestedLoopJoin.
    """
    e = T(spark, sf, "events")
    a = e.filter(e.event_id < 300).select(F.col("event_id"), F.col("ts"))
    b = e.select(F.col("event_id").alias("other_id"), F.col("ts").alias("ts_b"))
    joined = temporal.range_join(a, b, left_ts="ts", right_ts="ts_b",
                                 window_seconds=300)
    return joined.select("event_id", "other_id").orderBy("event_id", "other_id")


def jn_09(spark, sf):
    """As-of join: for each click, the latest prior 'view' of that user."""
    e = T(spark, sf, "events")
    clicks = e.filter(e.event_type == "click") \
              .select("event_id", "user_id", "ts")
    views = e.filter(e.event_type == "view") \
             .select(e.user_id.alias("v_user"), e.ts.alias("v_ts"))
    res = temporal.asof_join(clicks, views,
                             left_key="user_id", right_key="v_user",
                             left_ts="ts", right_ts="v_ts",
                             value_col="v_ts", out_col="prior_view_ts")
    return (res.select("event_id",
                       F.date_trunc("second", "prior_view_ts")
                        .alias("prior_view_ts"))
               .orderBy("event_id"))


def jn_10(spark, sf):
    r = T(spark, sf, "region").select("r_name")
    o = T(spark, sf, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(o).orderBy("r_name", "o_orderpriority")


# ------------------------------------------------------------------ §2.4 AGG

def agg_01(spark, sf):
    o = T(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(F.count("*").alias("n")) \
            .orderBy("o_orderstatus")


def agg_02(spark, sf):
    o = T(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("patients"))
             .orderBy("o_orderpriority"))


#: approx_count_distinct rsd (its default); the in-query acceptance
#: bound is 5x this relative error (~5σ).  HLL++ is deterministic per
#: dataset, so the bound is calibrated against the fixtures rather than
#: probabilistic: 3σ left a single group able to deterministically
#: exceed it on a regenerated fixture (ADVICE r5); 5σ keeps the check
#: real (a broken sketch off by >25% still flips the hashed boolean)
#: while leaving honest-sketch headroom.  tests/test_properties.py
#: asserts the tighter 3σ form on the current fixtures.
_AGG_03_RSD = 0.05


def agg_03(spark, sf):
    """AGG-03 HLL++ approximate distinct, oracle-checked as a bounded
    self-test: the exact count(DISTINCT) and the sketch estimate are
    computed in the SAME grouped aggregation, and the query returns the
    exact value plus ``within_bound`` = |approx-exact| <= 5*rsd*exact
    (fixture-calibrated bound — see _AGG_03_RSD note).  HLL++ is
    hash-deterministic, so the boolean is stable; the DuckDB oracle
    asserts TRUE, making sketch accuracy hash-verified instead of
    rows-only (VERDICT r4 item 5)."""
    o = T(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(F.approx_count_distinct("o_custkey", _AGG_03_RSD)
                   .alias("_apx"),
                  F.countDistinct("o_custkey").alias("exact_patients"))
             .select("o_orderpriority", "exact_patients",
                     (F.abs(F.col("_apx") - F.col("exact_patients"))
                      <= 5 * _AGG_03_RSD * F.col("exact_patients"))
                     .alias("within_bound"))
             .orderBy("o_orderpriority"))


def agg_04(spark, sf):
    l = T(spark, sf, "lineitem")
    return (l.groupBy("l_returnflag", "l_linestatus")
             .agg(dsum("l_quantity").alias("s"),
                  davg("l_extendedprice").alias("a"),
                  F.min("l_shipdate").alias("mn"),
                  F.max("l_shipdate").alias("mx"))
             .orderBy("l_returnflag", "l_linestatus"))


def agg_05(spark, sf):
    """EAV-flattening shape: conditional aggregation (i2b2 wide view)."""
    l = T(spark, sf, "lineitem")
    dec = F.when(l.l_returnflag == "R", l.l_extendedprice) \
           .otherwise(F.lit(0.0)).cast("decimal(18,4)")
    return (l.groupBy("l_orderkey")
             .agg(F.round(F.sum(dec), 2).cast("double").alias("r_rev"))
             .orderBy("l_orderkey"))


def agg_06(spark, sf):
    o = T(spark, sf, "orders")
    return (o.groupBy(F.floor(o.o_totalprice / 50000).cast("int").alias("bin"))
             .agg(F.count("*").alias("n"))
             .orderBy("bin"))


def agg_07(spark, sf):
    o = T(spark, sf, "orders")
    return (o.rollup("o_orderstatus")
             .agg(F.count("*").alias("n"))
             .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("s"), "n")
             .orderBy("s"))


def agg_11(spark, sf):
    """AGG-07 continued: CUBE over two dims — all four grouping levels
    (the report subtotal lattice: per-status, per-priority, both,
    grand total)."""
    o = T(spark, sf, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count("*").alias("n"))
             .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("s"),
                     F.coalesce("o_orderpriority", F.lit("ALL")).alias("p"),
                     "n")
             .orderBy("s", "p"))


def agg_12(spark, sf):
    """Approximate percentile (the second sketch family after agg_03's
    HLL): exact median and the KLL-style percentile_approx estimate
    computed in the SAME grouped pass, returned as the exact value plus
    a ``within_bound`` = |approx − exact| ≤ 2% · exact boolean.
    percentile_approx is deterministic per dataset (mergeable sketch,
    order-insensitive at these accuracies), so the boolean is stable;
    the oracle asserts TRUE.  At 100 TB the sketch is the only viable
    percentile: exact percentile needs a full sort per group, the
    sketch merges map-side."""
    l = T(spark, sf, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.percentile_approx("l_extendedprice", 0.5, 10000)
                   .alias("_apx"),
                  F.round(F.percentile("l_extendedprice", 0.5), 2)
                   .alias("exact_median"))
             .select("l_returnflag", "exact_median",
                     (F.abs(F.col("_apx") - F.col("exact_median"))
                      <= 0.02 * F.col("exact_median")).alias("within_bound"))
             .orderBy("l_returnflag"))


def agg_08(spark, sf):
    o = T(spark, sf, "orders")
    return (o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
             .filter(F.col("cnt") >= 10)
             .select("o_custkey").orderBy("o_custkey"))


def agg_09(spark, sf):
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").filter(F.col("o_orderkey") < 50) \
                              .select("o_orderkey")
    return (l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
             .groupBy("o_orderkey")
             .agg(F.array_join(
                     F.array_sort(F.collect_list(l.l_linenumber.cast("string"))),
                     ",").alias("li"))
             .orderBy("o_orderkey"))


def agg_10(spark, sf):
    l = T(spark, sf, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.round(F.percentile("l_quantity", 0.5), 2).alias("med"))
             .orderBy("l_returnflag"))


# ------------------------------------------------------------------ §2.5 WIN

def win_01(spark, sf):
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select("o_custkey", "o_orderkey",
                     F.row_number().over(w).alias("rn"))
             .filter(F.col("rn") == 1)
             .orderBy("o_custkey"))


def win_02(spark, sf):
    o = T(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select("o_custkey", "o_orderkey",
                     F.datediff(o.o_orderdate,
                                F.lag("o_orderdate").over(w)).alias("d"))
             .orderBy("o_custkey", "o_orderkey"))


def win_03(spark, sf):
    o = T(spark, sf, "orders").filter(F.col("o_orderkey") < 200)
    w = (Window.orderBy("o_orderkey")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (o.select("o_orderkey",
                     F.round(F.sum("o_totalprice").over(w), 2).alias("run"))
             .orderBy("o_orderkey"))


def win_04(spark, sf):
    e = T(spark, sf, "events")
    return (e.groupBy("user_id")
             .agg(F.max_by("event_type", "ts").alias("last_ev"))
             .orderBy("user_id"))


def win_05(spark, sf):
    o = T(spark, sf, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (o.select(F.ntile(4).over(w).alias("n"))
             .groupBy("n").agg(F.count("*").alias("c"))
             .orderBy("n"))


def win_06(spark, sf):
    """WIN-05 continued: percent_rank / cume_dist (quantile position of
    each row — report percentile-band assignment)."""
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return (o.select("o_orderkey", "o_orderpriority",
                     F.round(F.percent_rank().over(w), 6).alias("pr"),
                     F.round(F.cume_dist().over(w), 6).alias("cd"))
             .orderBy("o_orderkey").limit(200))


def win_07(spark, sf):
    """WIN-07 time-RANGE frame: per-user rolling 24-hour event count
    and value sum — the feature-engineering staple (rate features,
    velocity checks) the ROWS frames of win_all can't express: the
    frame is bounded by EVENT TIME distance, not row count.  Ordering
    key is unix_micros (microsecond-exact on both engines, the NOTES
    epoch rule), frame = RANGE [-24h, now] in microseconds.  One
    shuffle on user_id; the frame never materializes more than the
    horizon per user — bounded like a watermark."""
    e = T(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day_us = 24 * 3600 * 1_000_000
    w = (Window.partitionBy("user_id").orderBy(us)
         .rangeBetween(-day_us, 0))
    # frame sum decimal-routed (the dsum rule): a raw double SUM over
    # the frame accumulates in engine-specific order and can flip a
    # ROUND boundary between engines
    vsum = F.sum(F.col("value").cast("decimal(18,4)")).over(w)
    return (e.select("event_id", "user_id",
                     F.count("*").over(w).cast("int").alias("n_24h"),
                     F.round(vsum, 2).cast("double").alias("v_24h"))
             .orderBy("event_id").limit(4000))


# -------------------------------------------------------------- §2.6 SRT/SET

def srt_01(spark, sf):
    c = T(spark, sf, "customer")
    return (c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
             .select("c_custkey").limit(100))


def srt_02(spark, sf):
    p = T(spark, sf, "part")
    return (p.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
             .select("p_partkey", "p_retailprice").limit(10))


def set_01(spark, sf):
    c = T(spark, sf, "customer")
    s = T(spark, sf, "supplier")
    return (c.filter(c.c_nationkey == 1).select(c.c_custkey.alias("k"))
             .unionByName(
                 s.filter(s.s_nationkey == 1).select(s.s_suppkey.alias("k")))
             .orderBy("k"))


def set_02(spark, sf):
    c = T(spark, sf, "customer")
    s = T(spark, sf, "supplier")
    return (c.filter(c.c_nationkey == 1).select(c.c_custkey.alias("k"))
             .union(s.filter(s.s_nationkey == 1).select(s.s_suppkey.alias("k")))
             .distinct().orderBy("k"))


def set_03(spark, sf):
    o = T(spark, sf, "orders")
    f = o.filter(o.o_orderstatus == "F").select("o_custkey")
    op = o.filter(o.o_orderstatus == "O").select("o_custkey")
    return f.intersect(op).orderBy("o_custkey")


def set_04(spark, sf):
    c = T(spark, sf, "customer").select(F.col("c_custkey"))
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct().orderBy("c_custkey")


def set_05(spark, sf):
    o = T(spark, sf, "orders")
    return o.select("o_orderpriority").distinct().orderBy("o_orderpriority")


def smp_01(spark, sf):
    """Deterministic hash sample (~10%): keep rows whose md5(key) hex
    prefix falls under a threshold.  This is the sampling pattern a
    100 TB pipeline actually wants — reproducible across runs, engines
    and cluster layouts, no RNG state — and it is exactly
    oracle-matchable (md5 agrees between Spark and DuckDB).  26/256
    two-hex-char buckets ≈ 10.16%."""
    o = T(spark, sf, "orders")
    pick = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    return (o.filter(pick)
             .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
             .orderBy("o_orderstatus"))


#: smp_03's per-stratum sample size
SMP3_K = 25


def smp_03(spark, sf):
    """Fixed-SIZE stratified sample (exactly k rows per stratum — the
    "give me 1000 examples per language for eval" verb; smp_01/mix_01
    are rate-based, this is count-based): rank rows per stratum by
    md5(key) and keep the k smallest — a deterministic reservoir that
    any engine reproduces bit-for-bit (no RNG state, layout-free).
    The per-stratum ranking is a window ORDER BY over the md5 rank —
    Spark pushes the k-limit into each partition (WindowGroupLimit,
    plan-asserted in test_plans), so no stratum's task ever sorts more
    than it must and nothing global-sorts; at 100 TB this runs as one
    shuffle on the stratum key with per-group top-k short-circuiting."""
    o = T(spark, sf, "orders")
    rk = F.md5(F.col("o_orderkey").cast("string"))
    w = Window.partitionBy("o_orderpriority").orderBy(rk, "o_orderkey")
    return (o.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= SMP3_K)
             .select("o_orderpriority", F.col("_rn").alias("pick"),
                     "o_orderkey")
             .orderBy("o_orderpriority", "pick"))


def smp_02(spark, sf):
    """Seeded Bernoulli sample via df.sample (SURVEY.md §2.10 rule 5:
    engine-specific row pick → rows-only key).  Spark 4 note, measured:
    an explicit seed makes re-execution of the SAME DataFrame stable,
    but each new .sample() call draws a fresh stream — cross-run
    reproducibility needs the hash sample (smp_01)."""
    o = T(spark, sf, "orders")
    return (o.sample(fraction=0.1, seed=42)
             .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
             .orderBy("o_orderstatus"))


# ------------------------------------------------------------------- §2.7 FN

def fn_str(spark, sf):
    """FN-STR full surface: substr/upper/lower/trim/length/concat/
    replace/lpad/regexp_extract (LIKE covered by FLT-04, split by
    FN-ARR).  lpad: the zero-padded-PLZ semantics of update01
    (reference src/docker/database/Dockerfile:31)."""
    p = T(spark, sf, "part")
    return (p.select(
                "p_partkey",
                F.upper(F.substring("p_name", 1, 5)).alias("u"),
                F.length("p_name").alias("l"),
                F.lower(F.trim("p_type")).alias("lo"),
                F.concat("p_brand", F.lit("/"), "p_type").alias("cc"),
                F.replace("p_name", F.lit(" "), F.lit("_")).alias("rep"),
                F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("plz"),
                F.regexp_extract("p_name", "^[a-z]+", 0).alias("w1"))
             .orderBy("p_partkey").limit(50))


def fn_dt(spark, sf):
    """FN-DT surface: year/month/day/date_trunc/date_add/datediff over
    the order date (age-computation shapes)."""
    o = T(spark, sf, "orders")
    return (o.select(
                "o_orderkey",
                F.year("o_orderdate").alias("y"),
                F.month("o_orderdate").alias("m"),
                F.dayofmonth("o_orderdate").alias("d"),
                F.date_trunc("month", "o_orderdate").alias("m0"),
                (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
                F.datediff(F.col("o_orderdate"),
                           F.lit("1995-01-01").cast("date")).alias("dsince"))
             .orderBy("o_orderkey").limit(100))


def fn_math(spark, sf):
    """FN-MATH surface: round/floor/abs/sign/mod/pow/sqrt/ln + the
    exact-decimal net-price product (2+2+2 decimal operands → 6-decimal
    result; see prj_02 for why the double route is engine-dependent)."""
    l = T(spark, sf, "lineitem")
    net = F.round(
        l.l_extendedprice.cast("decimal(18,2)")
        * (1 - l.l_discount.cast("decimal(8,2)"))
        * (1 + l.l_tax.cast("decimal(8,2)")), 2).cast("double")
    return (l.select(
                "l_orderkey", "l_linenumber", net.alias("net"),
                F.floor("l_quantity").cast("long").alias("fq"),
                F.ceil("l_quantity").cast("long").alias("ce"),
                F.abs(F.col("l_linenumber") - 3).alias("ab"),
                F.signum(F.col("l_linenumber") - 3).cast("int").alias("sg"),
                (F.col("l_orderkey") % 7).alias("md"),
                F.round(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
                F.round(F.sqrt("l_quantity"), 4).alias("sq"),
                F.round(F.log("l_extendedprice"), 4).alias("lg"))
             .orderBy("l_orderkey", "l_linenumber").limit(100))


def fn_cond(spark, sf):
    """FN-COND surface: CASE WHEN / coalesce / nullif / greatest / least
    (valtype_cd T/N dispatch shape, SURVEY.md §2.7)."""
    o = T(spark, sf, "orders")
    b = (F.when(o.o_totalprice > 200000, "hi")
          .when(o.o_totalprice > 100000, "mid")
          .otherwise("lo"))
    return (o.select(
                "o_orderkey", b.alias("b"),
                F.coalesce(F.nullif("o_orderstatus", F.lit("O")),
                           F.lit("open")).alias("co"),
                F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2).alias("gx"),
                F.round(F.least("o_totalprice", F.lit(150000.0)), 2).alias("lx"))
             .orderBy("o_orderkey").limit(100))


def fn_dt2(spark, sf):
    """FN-DT time-of-day / parse / epoch surface over the event stream:
    hour/minute/second, seconds-since-midnight via unix-epoch
    difference (timezone-free on NTZ), minute-resolution format→parse
    round trip, to_date, and whole-month months_between vs an anchor.
    Oracle is DuckDB-dialect (strftime/strptime/epoch/datediff)."""
    e = T(spark, sf, "events")
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
                 .cast("int").alias("mb"))
             .orderBy("event_id").limit(200))


def fn_cast(spark, sf):
    l = T(spark, sf, "lineitem")
    return (l.groupBy(l.l_quantity.cast("int").alias("q"))
             .agg(F.count("*").alias("n")).orderBy("q"))


def fn_arr(spark, sf):
    """FN-ARR surface: split/size/array_contains/array_sort/array_join/
    flatten (ontology-path splitting, diagnosis lists)."""
    p = T(spark, sf, "part")
    arr = F.split("p_type", " ")
    return (p.select(
                "p_partkey",
                F.size(arr).alias("k"),
                F.array_contains(arr, "BRUSHED").cast("int").alias("has_b"),
                F.array_join(F.array_sort(arr), "-").alias("sorted_j"),
                F.size(F.flatten(F.array(arr, arr))).alias("k2"))
             .orderBy("p_partkey").limit(100))


def fn_map(spark, sf):
    e = T(spark, sf, "events")
    m = F.from_json(e.props, "map<string,string>")
    return (e.select(F.array_join(F.map_keys(m), ",").alias("ks"),
                     F.element_at(m, "k").alias("v"))
             .groupBy("ks")
             .agg(F.count("*").alias("n"), F.countDistinct("v").alias("nv"))
             .orderBy("ks"))


def fn_json(spark, sf):
    """FN-JSON surface: string-path extraction (get_json_object), typed
    struct parse (from_json) with arithmetic on the typed field.
    NULL-props rows flow through as NULLs (the CDA-attribute-absent
    case); missing-path extraction is unit-tested in test_t1_smoke."""
    e = T(spark, sf, "events")
    st = F.from_json("props", "struct<k:int>")
    return (e.select(
                "event_id",
                F.get_json_object("props", "$.k").alias("v"),
                st.getField("k").alias("kv"),
                (st.getField("k") * 2).alias("kv2"))
             .orderBy("event_id").limit(200))


def fn_hash(spark, sf):
    c = T(spark, sf, "customer")
    return (c.select("c_custkey", F.sha2(c.c_name, 256).alias("h"))
             .orderBy("c_custkey").limit(20))


# ------------------------------------------ §2.8 streaming (batch equivalents)

def str_02(spark, sf):
    e = T(spark, sf, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("ws"))
             .agg(F.count("*").alias("n"))
             .orderBy("ws"))


def str_03(spark, sf):
    """Sliding window (1h / 15min): each event lands in 4 windows."""
    e = T(spark, sf, "events")
    base = F.date_trunc("hour", F.col("ts"))
    q = F.floor(F.minute(F.col("ts")) / 15).cast("int")
    ws = base + F.expr("make_interval(0,0,0,0,0, 15 * (q - j), 0)")
    return (e.select(F.col("ts"), q.alias("q"))
             .select("ts", "q", F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"))
             .select(ws.alias("ws"))
             .groupBy("ws").agg(F.count("*").alias("n"))
             .orderBy("ws"))


def str_04(spark, sf):
    """Session windows (30 min gap) — gaps-and-islands batch form."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(w).isNull() | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")), 1)
         .otherwise(0).alias("new_sess"))
    wcum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = flagged.select("user_id", "ts",
                          F.sum("new_sess").over(wcum).alias("sess_seq"))
    return (sess.groupBy("user_id", "sess_seq")
                .agg(F.date_trunc("second", F.min("ts")).alias("sess_start"),
                     F.count("*").alias("n_events"))
                .orderBy("user_id", "sess_seq"))


def str_06(spark, sf):
    """Deterministic dedup: first event per (user_id, event_type)."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (e.select("user_id", "event_type", "event_id",
                     F.row_number().over(w).alias("rn"))
             .filter(F.col("rn") == 1)
             .select("user_id", "event_type", "event_id")
             .orderBy("user_id", "event_type"))


def str_07(spark, sf):
    """STR-07 batch equivalent: final per-user state of the encounter
    state machine (streaming form: streaming/stateful.py) — event
    count, visit open timestamp, closed-by-discharge flag."""
    e = T(spark, sf, "events")
    return (e.groupBy("user_id")
             .agg(F.count("*").alias("n_events"),
                  F.min("ts").alias("opened"),
                  (F.max(F.when(F.col("event_type") == "purchase", 1)
                          .otherwise(0)) == 1).alias("closed"))
             .orderBy("user_id"))


# ----------------------------------------------------------------- oracles

_ORACLES = {
    "prj_01": "SELECT l_orderkey, l_quantity FROM lineitem",
    "prj_02": ("SELECT o_orderkey, CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) "
               "* CAST(0.19 AS DECIMAL(3,2)), 2) AS DOUBLE) AS vat FROM orders"),
    "flt_01": "SELECT * FROM lineitem WHERE l_returnflag = 'R'",
    "flt_02": "SELECT * FROM part WHERE p_size BETWEEN 10 AND 20",
    "flt_03": ("SELECT count(*) AS n FROM orders "
               "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
               "AND o_orderdate < TIMESTAMP '1996-01-01'"),
    "flt_04": "SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%'",
    "flt_05": "SELECT n_name FROM nation WHERE n_regionkey IN (0, 2)",
    "flt_06": "SELECT count(*) AS n FROM events WHERE props IS NOT NULL",
    "flt_07": ("SELECT o_orderkey FROM orders "
               "WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O') "
               "AND NOT o_orderpriority = '1-URGENT'"),
    "jn_01": ("SELECT n_name, count(*) AS c FROM customer "
              "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    "jn_02": ("SELECT n_name, count(*) AS c FROM customer "
              "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    "jn_03": (f"SELECT r_name, {sql_dsum('l_extendedprice')} AS rev "
              "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
              "JOIN customer ON o_custkey = c_custkey "
              "JOIN nation ON c_nationkey = n_nationkey "
              "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"),
    "jn_04": ("SELECT c_custkey, count(o_orderkey) AS n FROM customer "
              "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey"),
    "jn_05": ("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders "
              "WHERE o_custkey = c_custkey AND o_totalprice > 100000)"),
    "jn_06": ("SELECT c_custkey FROM customer WHERE NOT EXISTS "
              "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    "jn_07": ("SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS l_linenumber, "
              "b.l_linenumber AS other FROM lineitem a JOIN lineitem b "
              "ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber "
              "WHERE a.l_orderkey < 100"),
    "jn_08": ("SELECT a.event_id AS event_id, b.event_id AS other_id "
              "FROM events a JOIN events b "
              "ON (epoch_ns(b.ts) // 1000) >= (epoch_ns(a.ts) // 1000) "
              "AND (epoch_ns(b.ts) // 1000) < (epoch_ns(a.ts) // 1000) + 300000000 "
              "WHERE a.event_id < 300"),
    "jn_09": ("SELECT c.event_id, date_trunc('second', "
              "(SELECT max(v.ts) FROM events v WHERE v.user_id = c.user_id "
              "AND v.event_type = 'view' AND (epoch_ns(v.ts) // 1000) <= (epoch_ns(c.ts) // 1000))) "
              "AS prior_view_ts FROM events c WHERE c.event_type = 'click'"),
    "jn_10": ("SELECT r_name, o_orderpriority FROM region CROSS JOIN "
              "(SELECT DISTINCT o_orderpriority FROM orders)"),
    "agg_01": "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    "agg_02": ("SELECT o_orderpriority, count(DISTINCT o_custkey) AS patients "
               "FROM orders GROUP BY o_orderpriority"),
    # exact side reproduced in SQL; the bound boolean must come out TRUE
    # on the Spark side for the value hash to match
    "agg_03": ("SELECT o_orderpriority, "
               "count(DISTINCT o_custkey) AS exact_patients, "
               "TRUE AS within_bound "
               "FROM orders GROUP BY o_orderpriority"),
    "agg_04": (f"SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS s, "
               f"{sql_davg('l_extendedprice')} AS a, "
               "MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx "
               "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "agg_05": ("SELECT l_orderkey, CAST(ROUND(SUM(CAST(CASE WHEN l_returnflag = 'R' "
               "THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4))), 2) AS DOUBLE) "
               "AS r_rev FROM lineitem GROUP BY l_orderkey"),
    "agg_06": ("SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bin, "
               "count(*) AS n FROM orders GROUP BY 1"),
    "agg_07": ("SELECT COALESCE(o_orderstatus, 'ALL') AS s, count(*) AS n "
               "FROM orders GROUP BY ROLLUP(o_orderstatus)"),
    "agg_08": ("SELECT o_custkey FROM orders GROUP BY o_custkey "
               "HAVING count(*) >= 10"),
    "agg_09": ("SELECT o_orderkey, array_to_string(list_sort("
               "list(CAST(l_linenumber AS VARCHAR))), ',') AS li "
               "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
               "WHERE o_orderkey < 50 GROUP BY o_orderkey"),
    "agg_10": ("SELECT l_returnflag, ROUND(CAST(percentile_cont(0.5) "
               "WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 2) "
               "AS med FROM lineitem GROUP BY l_returnflag"),
    "win_01": ("SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, "
               "CAST(row_number() OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderdate, o_orderkey) AS INT) AS rn FROM orders) "
               "WHERE rn = 1"),
    "win_02": ("SELECT o_custkey, o_orderkey, "
               "CAST(CAST(o_orderdate AS DATE) - "
               "CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderdate, o_orderkey) AS DATE) AS INT) AS d "
               "FROM orders WHERE o_custkey < 100"),
    "win_03": ("SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER ("
               "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
               "CURRENT ROW), 2) AS run FROM orders WHERE o_orderkey < 200"),
    "win_04": ("SELECT user_id, max_by(event_type, ts) AS last_ev "
               "FROM events GROUP BY user_id"),
    "win_05": ("SELECT n, count(*) AS c FROM (SELECT CAST(ntile(4) OVER ("
               "ORDER BY o_totalprice, o_orderkey) AS INT) AS n FROM orders) "
               "GROUP BY n"),
    "win_06": ("SELECT o_orderkey, o_orderpriority, "
               "ROUND(percent_rank() OVER (PARTITION BY o_orderpriority "
               "ORDER BY o_totalprice, o_orderkey), 6) AS pr, "
               "ROUND(cume_dist() OVER (PARTITION BY o_orderpriority "
               "ORDER BY o_totalprice, o_orderkey), 6) AS cd "
               "FROM orders ORDER BY o_orderkey LIMIT 200"),
    "win_07": ("SELECT event_id, user_id, "
               "CAST(count(*) OVER w AS INT) AS n_24h, "
               "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 2) "
               "AS DOUBLE) AS v_24h "
               "FROM events WINDOW w AS (PARTITION BY user_id "
               "ORDER BY epoch_us(ts) "
               "RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) "
               "ORDER BY event_id LIMIT 4000"),
    "srt_01": ("SELECT c_custkey FROM (SELECT c_custkey FROM customer "
               "ORDER BY c_acctbal DESC, c_custkey LIMIT 100)"),
    "srt_02": ("SELECT p_partkey, p_retailprice FROM part "
               "ORDER BY p_retailprice DESC, p_partkey LIMIT 10"),
    "set_01": ("SELECT c_custkey AS k FROM customer WHERE c_nationkey = 1 "
               "UNION ALL SELECT s_suppkey FROM supplier WHERE s_nationkey = 1"),
    "set_02": ("SELECT c_custkey AS k FROM customer WHERE c_nationkey = 1 "
               "UNION SELECT s_suppkey FROM supplier WHERE s_nationkey = 1"),
    "set_03": ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
               "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"),
    "set_04": ("SELECT c_custkey FROM customer "
               "EXCEPT SELECT o_custkey FROM orders"),
    "set_05": "SELECT DISTINCT o_orderpriority FROM orders",
    "smp_03": ("SELECT o_orderpriority, pick, o_orderkey FROM ("
               "SELECT o_orderpriority, o_orderkey, "
               "CAST(row_number() OVER (PARTITION BY o_orderpriority "
               "ORDER BY md5(CAST(o_orderkey AS STRING)), o_orderkey) "
               "AS INT) AS pick FROM orders) "
               "WHERE pick <= 25 ORDER BY o_orderpriority, pick"),
    "smp_01": ("SELECT o_orderstatus, count(*) AS n FROM orders "
               "WHERE substr(md5(CAST(o_orderkey AS STRING)), 1, 2) < '1a' "
               "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "fn_str": ("SELECT p_partkey, upper(substr(p_name, 1, 5)) AS u, "
               "CAST(length(p_name) AS INT) AS l, "
               "lower(trim(p_type)) AS lo, "
               "p_brand || '/' || p_type AS cc, "
               "replace(p_name, ' ', '_') AS rep, "
               "lpad(CAST(p_partkey AS STRING), 8, '0') AS plz, "
               "COALESCE(regexp_extract(p_name, '^[a-z]+', 0), '') AS w1 "
               "FROM part ORDER BY p_partkey LIMIT 50"),
    "fn_dt": ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
              "CAST(month(o_orderdate) AS INT) AS m, "
              "CAST(day(o_orderdate) AS INT) AS d, "
              "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m0, "
              "o_orderdate + INTERVAL 30 DAY AS plus30, "
              "CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) "
              "AS dsince FROM orders ORDER BY o_orderkey LIMIT 100"),
    "fn_math": ("SELECT l_orderkey, l_linenumber, CAST(ROUND("
                "CAST(l_extendedprice AS DECIMAL(18,2)) * "
                "(1 - CAST(l_discount AS DECIMAL(8,2))) * "
                "(1 + CAST(l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS net, "
                "CAST(floor(l_quantity) AS BIGINT) AS fq, "
                "CAST(ceil(l_quantity) AS BIGINT) AS ce, "
                "abs(l_linenumber - 3) AS ab, "
                "CAST(sign(l_linenumber - 3) AS INT) AS sg, "
                "l_orderkey % 7 AS md, "
                "ROUND(pow(l_quantity, 2), 2) AS p2, "
                "ROUND(sqrt(l_quantity), 4) AS sq, "
                "ROUND(ln(l_extendedprice), 4) AS lg "
                "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100"),
    "fn_cond": ("SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'hi' "
                "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'lo' END AS b, "
                "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS co, "
                "ROUND(GREATEST(o_totalprice, 150000.0), 2) AS gx, "
                "ROUND(LEAST(o_totalprice, 150000.0), 2) AS lx "
                "FROM orders ORDER BY o_orderkey LIMIT 100"),
    "fn_dt2": ("SELECT event_id, CAST(hour(ts) AS INT) AS h, "
               "CAST(minute(ts) AS INT) AS mi, CAST(second(ts) AS INT) AS s, "
               "CAST(epoch(date_trunc('second', ts)) "
               "- epoch(date_trunc('day', ts)) AS BIGINT) AS sod, "
               "strptime(strftime(ts, '%Y-%m-%d %H:%M'), '%Y-%m-%d %H:%M') AS pt, "
               "CAST(CAST(ts AS DATE) AS STRING) AS dt, "
               "CAST(datediff('month', TIMESTAMP '2023-06-01', "
               "date_trunc('month', ts)) AS INT) AS mb "
               "FROM events ORDER BY event_id LIMIT 200"),
    "fn_cast": ("SELECT CAST(l_quantity AS INT) AS q, count(*) AS n "
                "FROM lineitem GROUP BY 1"),
    "fn_arr": ("SELECT p_partkey, CAST(len(t) AS INT) AS k, "
               "CAST(list_contains(t, 'BRUSHED') AS INT) AS has_b, "
               "array_to_string(list_sort(t), '-') AS sorted_j, "
               "CAST(len(flatten([t, t])) AS INT) AS k2 "
               "FROM (SELECT p_partkey, string_split(p_type, ' ') AS t "
               "FROM part) ORDER BY p_partkey LIMIT 100"),
    "agg_12": ("SELECT l_returnflag, "
               "ROUND(CAST(percentile_cont(0.5) WITHIN GROUP "
               "(ORDER BY l_extendedprice) AS DOUBLE), 2) "
               "AS exact_median, TRUE AS within_bound "
               "FROM lineitem GROUP BY l_returnflag"),
    "agg_11": ("SELECT COALESCE(o_orderstatus, 'ALL') AS s, "
               "COALESCE(o_orderpriority, 'ALL') AS p, count(*) AS n "
               "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) "
               "ORDER BY s, p"),
    "fn_map": ("SELECT array_to_string(json_keys(props), ',') AS ks, "
               "count(*) AS n, count(DISTINCT json_extract_string(props, '$.k')) "
               "AS nv FROM events GROUP BY 1"),
    "fn_json": ("SELECT event_id, json_extract_string(props, '$.k') AS v, "
                "CAST(json_extract(props, '$.k') AS INT) AS kv, "
                "CAST(json_extract(props, '$.k') AS INT) * 2 AS kv2 "
                "FROM events ORDER BY event_id LIMIT 200"),
    "fn_hash": ("SELECT c_custkey, sha256(c_name) AS h FROM customer "
                "ORDER BY c_custkey LIMIT 20"),
    "str_02": ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, "
               "count(*) AS n FROM events GROUP BY 1"),
    "str_03": ("WITH RECURSIVE js(j) AS (SELECT 0 UNION ALL "
               "SELECT j + 1 FROM js WHERE j < 3) "
               "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) + "
               "INTERVAL 15 MINUTE * "
               "(CAST(FLOOR(minute(ts) / 15.0) AS INT) - j) AS ws, "
               "count(*) AS n FROM events, js GROUP BY 1"),
    "str_04": ("WITH flagged AS (SELECT user_id, ts, event_id, CASE WHEN "
               "lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE "
               "THEN 1 ELSE 0 END AS new_sess FROM events "
               "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
               "sess AS (SELECT user_id, ts, CAST(SUM(new_sess) OVER ("
               "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN "
               "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq FROM flagged) "
               "SELECT user_id, sess_seq, CAST(date_trunc('second', min(ts)) AS TIMESTAMP) "
               "AS sess_start, count(*) AS n_events FROM sess GROUP BY user_id, sess_seq"),
    "str_06": ("SELECT user_id, event_type, event_id FROM ("
               "SELECT user_id, event_type, event_id, row_number() OVER ("
               "PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn "
               "FROM events) WHERE rn = 1"),
    "str_07": ("SELECT user_id, count(*) AS n_events, min(ts) AS opened, "
               "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 "
               "AS closed FROM events GROUP BY user_id"),
}

_DOCS = {
    "prj_01": "PRJ-01 column projection", "prj_02": "PRJ-02 computed projection",
    "flt_01": "FLT-01 equality predicate", "flt_02": "FLT-02 numeric range",
    "flt_03": "FLT-03 date range", "flt_04": "FLT-04 prefix LIKE",
    "flt_05": "FLT-05 IN-list", "flt_06": "FLT-06 NULL predicate",
    "flt_07": "FLT-07 boolean combination",
    "jn_01": "JN-01 equi inner join", "jn_02": "JN-02 broadcast hash join",
    "jn_03": "JN-03 multi-way star join", "jn_04": "JN-04 left outer join",
    "jn_05": "JN-05 left semi join", "jn_06": "JN-06 left anti join",
    "jn_07": "JN-07 self join", "jn_08": "JN-08 interval/theta join (bucketized)",
    "jn_09": "JN-09 as-of join", "jn_10": "JN-10 cross join",
    "agg_01": "AGG-01 count group-by", "agg_02": "AGG-02 count distinct",
    "agg_03": "AGG-03 approx distinct (HLL++)", "agg_04": "AGG-04 sum/avg/min/max",
    "agg_05": "AGG-05 conditional agg (EAV pivot shape)",
    "agg_06": "AGG-06 histogram bins", "agg_07": "AGG-07 rollup",
    "agg_08": "AGG-08 having", "agg_09": "AGG-09 sorted collect_list",
    "agg_11": "AGG-07 cube (subtotal lattice)",
    "agg_12": "Approximate percentile sketch (bounded self-check vs "
              "exact median)",
    "agg_10": "AGG-10 exact percentile",
    "win_01": "WIN-01 row_number", "win_02": "WIN-02 lag/lead",
    "win_03": "WIN-03 running frame sum", "win_04": "WIN-04 last-per-group (max_by)",
    "win_05": "WIN-05 ntile",
    "win_06": "WIN-05 percent_rank / cume_dist",
    "win_07": "WIN-07 time-RANGE frame: rolling 24h per-user count/sum "
              "(event-time-bounded frame, the rate-feature shape)",
    "srt_01": "SRT-01 multi-key sort + limit", "srt_02": "SRT-02 top-k",
    "set_01": "SET-01 union all", "set_02": "SET-02 union distinct",
    "set_03": "SET-03 intersect", "set_04": "SET-04 except",
    "set_05": "SET-05 distinct",
    "smp_01": "Deterministic hash sample (reproducible 10%)",
    "smp_03": "Fixed-size stratified sample: exactly k rows per "
              "stratum by md5 rank (deterministic reservoir, "
              "WindowGroupLimit per-group top-k)",
    "smp_02": "Seeded Bernoulli sample (rows-only per §2.10 rule 5)",
    "fn_str": "FN-STR string functions", "fn_dt": "FN-DT date functions",
    "fn_dt2": "FN-DT time-of-day / parse / epoch functions",
    "fn_math": "FN-MATH arithmetic", "fn_cond": "FN-COND case/coalesce",
    "fn_cast": "FN-CAST casts", "fn_arr": "FN-ARR array functions",
    "fn_map": "FN-MAP map functions", "fn_json": "FN-JSON json extraction",
    "fn_hash": "FN-HASH pseudonymization hash",
    "str_02": "STR-02 tumbling window (batch equivalent)",
    "str_03": "STR-03 sliding window (batch equivalent)",
    "str_04": "STR-04 session window (batch equivalent)",
    "str_06": "STR-06 dedup (batch equivalent)",
    "str_07": "STR-07 stateful final state (batch equivalent)",
}


# --------------------------------------------------------- data profiling

#: profiled columns: one of each storage kind (integer, double, string,
#: timestamp) so every min/max rendering path is certified.
_PROF_COLS = (("l_orderkey", "int"), ("l_quantity", "num"),
              ("l_returnflag", "str"), ("l_shipdate", "ts"))


def prof_01(spark, sf):
    """Table profiling (the pre-ingest data-quality verb): per-column
    row/null/distinct counts and min/max, for a representative column
    of each storage kind, in ONE aggregation pass (all stats are
    partial-aggregable, map-side combined; the final single-row reduce
    is control-plane-sized).  Output is long format (one row per
    column) via an in-row struct explode — no second pass, no driver
    loop over columns.  Doubles render through DECIMAL(18,2) and
    timestamps through an explicit format so both engines print
    identical strings."""
    l = T(spark, sf, "lineitem")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, kind in _PROF_COLS:
        col = F.col(c)
        if kind == "num":
            mn = F.min(col).cast("decimal(18,2)").cast("string")
            mx = F.max(col).cast("decimal(18,2)").cast("string")
        elif kind == "ts":
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [F.sum(col.isNull().cast("long")).alias(f"{c}__nul"),
                 F.countDistinct(col).alias(f"{c}__nd"),
                 mn.alias(f"{c}__mn"), mx.alias(f"{c}__mx")]
    wide = l.agg(*aggs)
    entries = F.array(*[
        F.struct(F.lit(c).alias("col"), F.col("_n").alias("n_rows"),
                 F.col(f"{c}__nul").alias("n_null"),
                 F.col(f"{c}__nd").alias("n_distinct"),
                 F.col(f"{c}__mn").alias("min_v"),
                 F.col(f"{c}__mx").alias("max_v"))
        for c, _ in _PROF_COLS])
    return (wide.select(F.explode(entries).alias("e")).select("e.*")
                .orderBy("col"))


def _prof_01_oracle() -> str:
    branches = []
    for c, kind in _PROF_COLS:
        if kind == "num":
            mn = f"CAST(CAST(min({c}) AS DECIMAL(18,2)) AS STRING)"
            mx = f"CAST(CAST(max({c}) AS DECIMAL(18,2)) AS STRING)"
        elif kind == "ts":
            mn = f"substr(CAST(min({c}) AS STRING), 1, 19)"
            mx = f"substr(CAST(max({c}) AS STRING), 1, 19)"
        else:
            mn, mx = f"CAST(min({c}) AS STRING)", f"CAST(max({c}) AS STRING)"
        branches.append(
            f"SELECT '{c}' AS col, count(*) AS n_rows, "
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_v, {mx} AS max_v FROM lineitem")
    return " UNION ALL ".join(branches) + " ORDER BY col"


_DOCS["prof_01"] = ("Table profiling: per-column nulls/distinct/min/max "
                    "in one aggregation pass (long-format output)")


# ------------------------------------------------- time-series gap fill

def ts_01(spark, sf):
    """Hypertable-style gap fill + LOCF: per-user daily value sums
    resampled onto a dense per-user day scaffold, missing days
    forward-filled with the last observation (and flagged).  The
    continuous-aggregate counterpart to rollup_01 — together they are
    the downsample/resample pair a metrics store runs on every series.

    Scale shape: the scaffold GENERATES distributedly (per-user
    sequence + explode — rows ∝ users × days, never a driver loop);
    the LOCF window partitions by user, so state per task is one
    series, not the corpus.  First scaffold day per user is that
    user's first observed day, so the fill never reads before the
    series starts (v_filled is total-function, no leading nulls)."""
    from pyspark.sql.window import Window

    e = T(spark, sf, "events")
    daily = (e.groupBy("user_id", F.to_date("ts").alias("d"))
              .agg(F.round(dsum("value"), 2).cast("double").alias("v")))
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"),
                                        F.max("d").alias("d1"))
    scaffold = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d"))
    j = scaffold.join(daily, ["user_id", "d"], "left")
    w = (Window.partitionBy("user_id").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # DATE→NTZ for the output: the harness canonicalizes Spark DATE as
    # a string but DuckDB DATE as datetime64 — midnight NTZ matches
    return (j.select("user_id",
                     F.col("d").cast("timestamp_ntz").alias("d"),
                     F.col("v").isNotNull().alias("observed"),
                     F.last("v", ignorenulls=True).over(w)
                      .alias("v_filled"))
             .orderBy("user_id", "d"))


_ORACLES["ts_01"] = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         {sql_dsum('value')} AS v
  FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily
         GROUP BY 1),
scaffold AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                       AS DATE) AS d
  FROM span),
j AS (SELECT s.user_id, s.d, dy.v
      FROM scaffold s LEFT JOIN daily dy USING (user_id, d))
SELECT user_id, d, v IS NOT NULL AS observed,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM j ORDER BY user_id, d
"""

_DOCS["ts_01"] = ("Time-series gap fill + LOCF: dense per-user day "
                  "scaffold (distributed generate), forward-filled "
                  "daily sums with observed flags")


# ---------------------------------------------- sequential pattern matching

def seq_01(spark, sf):
    """Funnel step attribution: per user, the FIRST click and the first
    purchase at-or-after it, with the conversion gap in seconds — the
    MATCH_RECOGNIZE-lite every product-analytics stack runs (and the
    clinical analogue: first diagnosis → first treatment latency).

    Shape: two grouped min(struct(ts, event_id)) aggregations (the
    deterministic argmin — ties broken on event_id inside the struct
    comparison) joined per user; both aggregate map-side, the join
    shuffles on user_id only.  Never a window over the raw event
    stream, so no per-user single-task sort at 100 TB.  Gap seconds
    via unix_timestamp differences (TZ-free on NTZ — see the oracle
    portability trap in NOTES)."""
    e = T(spark, sf, "events").select("user_id", "event_id", "ts",
                                      "event_type")
    first_click = (e.filter(F.col("event_type") == "click")
                    .groupBy("user_id")
                    .agg(F.min(F.struct("ts", "event_id")).alias("c")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                  .select("user_id", F.col("ts").alias("p_ts"),
                          F.col("event_id").alias("p_id")))
    conv = (first_click.join(purchases, "user_id")
            .filter(F.col("p_ts") >= F.col("c.ts"))
            .groupBy("user_id", "c")
            .agg(F.min(F.struct("p_ts", "p_id")).alias("p")))
    # whole seconds from the MICROSECOND difference (unix_timestamp /
    # epoch() truncate each operand first — off by one when fractional
    # seconds straddle; session TZ is UTC so NTZ→LTZ is pure
    # reinterpretation)
    gap = F.floor(
        (F.unix_micros(F.col("p.p_ts").cast("timestamp"))
         - F.unix_micros(F.col("c.ts").cast("timestamp"))) / 1_000_000
    ).cast("long")
    return (conv.select("user_id",
                        F.col("c.event_id").alias("click_id"),
                        F.col("p.p_id").alias("purchase_id"),
                        gap.alias("gap_sec"))
                .orderBy("user_id"))


_ORACLES["seq_01"] = """
WITH c AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events WHERE event_type = 'click'),
fc AS (SELECT user_id, ts AS c_ts, event_id AS click_id FROM c
       WHERE rn = 1),
p AS (
  SELECT fc.user_id, fc.click_id, fc.c_ts, e.ts AS p_ts,
         e.event_id AS p_id,
         row_number() OVER (PARTITION BY fc.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM fc JOIN events e
    ON e.user_id = fc.user_id AND e.event_type = 'purchase'
   AND e.ts >= fc.c_ts)
SELECT user_id, click_id, p_id AS purchase_id,
       CAST((epoch_us(p_ts) - epoch_us(c_ts)) // 1000000 AS BIGINT)
         AS gap_sec
FROM p WHERE rn = 1 ORDER BY user_id
"""

_DOCS["seq_01"] = ("Funnel attribution: first click -> first purchase "
                   "per user with conversion gap (argmin-join, no "
                   "raw-stream window)")


def seq_02(spark, sf):
    """Event-sequence pattern counting: each user's chronologically
    ordered event-type initials become a path string, and the funnel
    pattern `c[^p]*p` (a click leading to a purchase without an
    intervening purchase) is counted per user by non-overlapping regex
    match — the batch form of CEP/MATCH_RECOGNIZE.

    The path string is built by sort_array(collect_list(struct(...)))
    INSIDE the aggregate — deterministic order without a window over
    the raw stream; per-user paths are the frame the regex runs on,
    which is bounded by per-user activity, not corpus size."""
    e = T(spark, sf, "events")
    ini = F.substring("event_type", 1, 1)
    path = F.concat_ws(
        "", F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id",
                                                 ini.alias("i")))),
            lambda s: s["i"]))
    return (e.groupBy("user_id")
             .agg(path.alias("path"))
             .select("user_id", "path",
                     F.size(F.regexp_extract_all("path",
                                                 F.lit("c[^p]*p"), 0))
                      .cast("int").alias("n_funnels"))
             .orderBy("user_id"))


_ORACLES["seq_02"] = """
WITH p AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS path
  FROM events GROUP BY user_id)
SELECT user_id, path,
       CAST(len(regexp_extract_all(path, 'c[^p]*p')) AS INT) AS n_funnels
FROM p ORDER BY user_id
"""

_DOCS["seq_02"] = ("Event-path pattern counting: per-user ordered "
                   "type-initial path + non-overlapping funnel regex "
                   "(CEP batch form)")


# ------------------------------------------------- retention + transitions

def ret_01(spark, sf):
    """Cohort retention matrix: users grouped by FIRST-activity day,
    per day-offset the count and fraction still active — the
    product-analytics retention triangle (and the clinical analogue:
    follow-up compliance by enrollment week).

    Scale shape: first-day per user is one grouped min (map-side
    combinable); the activity frame joins it back on user_id (the
    only corpus-sized shuffle); the matrix aggregates to
    cohorts × offsets — tiny.  Cohort size joins back broadcast.
    Retention fraction is exact integer division rounded at 4."""
    e = T(spark, sf, "events")
    act = (e.select("user_id", F.to_date("ts").alias("d")).distinct())
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort"))
    joined = act.join(first, "user_id")
    mat = (joined.groupBy("cohort",
                          F.datediff("d", "cohort").alias("day_offset"))
                 .agg(F.countDistinct("user_id").alias("n_active")))
    size = (first.groupBy("cohort")
                 .agg(F.countDistinct("user_id").alias("n_cohort")))
    return (mat.join(F.broadcast(size), "cohort")
               .select(F.col("cohort").cast("timestamp_ntz").alias("cohort"),
                       F.col("day_offset").cast("int").alias("day_offset"),
                       "n_active", "n_cohort",
                       F.round(F.col("n_active")
                               / F.col("n_cohort"), 4).alias("retention"))
               .orderBy("cohort", "day_offset"))


_ORACLES["ret_01"] = """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
             FROM events),
first AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY 1),
j AS (SELECT a.user_id, f.cohort, a.d - f.cohort AS day_offset
      FROM act a JOIN first f USING (user_id)),
mat AS (SELECT cohort, day_offset,
               count(DISTINCT user_id) AS n_active
        FROM j GROUP BY 1, 2),
sz AS (SELECT cohort, count(DISTINCT user_id) AS n_cohort
       FROM first GROUP BY 1)
SELECT cohort, CAST(day_offset AS INT) AS day_offset, n_active,
       n_cohort,
       ROUND(n_active / CAST(n_cohort AS DOUBLE), 4) AS retention
FROM mat JOIN sz USING (cohort)
ORDER BY cohort, day_offset
"""

_DOCS["ret_01"] = ("Cohort retention matrix: first-activity cohorts x "
                   "day offsets with active counts and retention "
                   "fractions (one corpus shuffle, tiny matrix)")


def trn_01(spark, sf):
    """Event-type transition matrix: per user the chronologically
    ordered event stream, counting (type → next type) transitions
    corpus-wide with row-normalized probabilities — the first-order
    Markov summary behind path/Sankey analytics.

    Scale shape: the lead() window partitions by user_id (state per
    task = one user's stream, never a global sort); the matrix
    aggregates to |types|² rows; probabilities divide by broadcast
    row totals.  Deterministic order: (ts, event_id) unique."""
    from pyspark.sql.window import Window

    e = T(spark, sf, "events").select("user_id", "ts", "event_id",
                                      "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.withColumn("next_type", F.lead("event_type").over(w))
    mat = (nxt.filter(F.col("next_type").isNotNull())
              .groupBy(F.col("event_type").alias("src"),
                       F.col("next_type").alias("dst"))
              .agg(F.count("*").alias("n")))
    tot = mat.groupBy("src").agg(F.sum("n").alias("tot"))
    return (mat.join(F.broadcast(tot), "src")
               .select("src", "dst", "n",
                       F.round(F.col("n") / F.col("tot"), 4).alias("p"))
               .orderBy("src", "dst"))


_ORACLES["trn_01"] = """
WITH nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events),
mat AS (SELECT src, dst, count(*) AS n FROM nxt
        WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) AS tot FROM mat GROUP BY 1)
SELECT src, dst, n, ROUND(n / CAST(tot AS DOUBLE), 4) AS p
FROM mat JOIN tot USING (src)
ORDER BY src, dst
"""

_DOCS["trn_01"] = ("Event-type transition matrix (first-order Markov "
                   "summary): per-user lead() window, |types|^2 "
                   "matrix, row-normalized probabilities")


FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def funnel_stage_per_user(events: DataFrame,
                          steps: tuple[str, ...] = FUNNEL_STEPS
                          ) -> DataFrame:
    """(user_id, stage) — the furthest funnel step each user reached
    with STRICTLY increasing timestamps (first signup, then the first
    view after it, then the first click after that, ...).

    One corpus shuffle (groupBy user), then the whole sequential scan
    runs as a pure-JVM higher-order ``aggregate`` over the per-user
    time-sorted event array — no Python, no window over a global sort.
    Greedy earliest-valid-event is optimal for chain matching (its
    i-th timestamp is ≤ any other valid assignment's, by induction),
    which is what lets the oracle express the same semantics as
    stepwise ``min(t) WHERE t > prev`` CTEs."""
    per_user = (events.filter(F.col("event_type").isin(*steps))
                .groupBy("user_id")
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                     .alias("t"),
                    F.col("event_type").alias("y")))).alias("evs")))
    init = F.struct(F.lit(0).alias("stage"),
                    F.lit(-1).cast("long").alias("last"))

    def step(acc, e):
        out = acc
        for i, s in enumerate(steps):
            hit = ((acc["stage"] == i) & (e["y"] == s)
                   & (e["t"] > acc["last"]))
            out = F.when(hit, F.struct(
                F.lit(i + 1).alias("stage"),
                e["t"].alias("last"))).otherwise(out)
        return out

    return per_user.select(
        "user_id", F.aggregate("evs", init, step)["stage"].alias("stage"))


def fun_01(spark, sf):
    """Funnel conversion analysis over the event stream: per funnel
    step the number of users whose events contain the ordered chain up
    to it, plus the step-over-step conversion rate — the product-
    analytics funnel (clinical analogue: admission → triage →
    treatment → discharge compliance).

    Scale shape: one groupBy(user) shuffle; the ordered-chain scan is
    a JVM fold over each user's sorted array (state per row = one
    struct); the final funnel is a single 1-row aggregate unpivoted to
    |steps| rows — nothing downstream of the groupBy is corpus-sized.

    The fixture's dense random streams would complete every funnel
    (conversion ≡ 1.0 — a vacuous certification), so the declared
    query runs on a deterministic 30% event slice (event_id mod 10 <
    3): drop-off becomes real and the ordered-chain semantics are
    load-bearing in the hash."""
    e = T(spark, sf, "events").filter(F.pmod("event_id", F.lit(10)) < 3)
    stages = funnel_stage_per_user(e)
    counts = stages.agg(
        F.count("*").alias("n0"),
        *[F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"n{i + 1}")
          for i in range(len(FUNNEL_STEPS))])
    rows = ", ".join(
        f"{i + 1}, '{s}', n{i + 1}, round(n{i + 1} / cast(n{i} as double), 4)"
        for i, s in enumerate(FUNNEL_STEPS))
    return (counts.select(F.expr(
        f"stack({len(FUNNEL_STEPS)}, {rows}) "
        "as (step_idx, step, n_users, conversion)"))
        .orderBy("step_idx"))


_FUNNEL_ORACLE_STEPS = """
e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
      WHERE event_type IN ('signup', 'view', 'click', 'purchase')
        AND event_id % 10 < 3),
s1 AS (SELECT user_id, min(t) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'view' AND t > t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'click' AND t > t2 GROUP BY 1),
s4 AS (SELECT e.user_id, min(t) AS t4 FROM e JOIN s3 USING (user_id)
       WHERE event_type = 'purchase' AND t > t3 GROUP BY 1),
n AS (SELECT (SELECT count(DISTINCT user_id) FROM e) AS n0,
             (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3,
             (SELECT count(*) FROM s4) AS n4)
"""

_ORACLES["fun_01"] = f"""
WITH {_FUNNEL_ORACLE_STEPS}
SELECT step_idx, step, n_users, conversion FROM (
  SELECT 1 AS step_idx, 'signup' AS step, n1 AS n_users,
         ROUND(n1 / CAST(n0 AS DOUBLE), 4) AS conversion FROM n
  UNION ALL SELECT 2, 'view', n2, ROUND(n2 / CAST(n1 AS DOUBLE), 4) FROM n
  UNION ALL SELECT 3, 'click', n3, ROUND(n3 / CAST(n2 AS DOUBLE), 4) FROM n
  UNION ALL SELECT 4, 'purchase', n4,
         ROUND(n4 / CAST(n3 AS DOUBLE), 4) FROM n
) ORDER BY step_idx
"""

_DOCS["fun_01"] = ("Funnel conversion over the event stream: ordered "
                   "signup->view->click->purchase chain matched by a "
                   "pure-JVM fold over per-user sorted events; "
                   "step counts + step-over-step conversion rates")


def surv_01(spark, sf):
    """Kaplan–Meier survival curves — THE clinical time-to-event verb
    (reference domain: ED encounter outcomes): per arm (user_id mod
    2), time from signup to first purchase in whole days, censored at
    last observed activity; S(t) = Π_{u ≤ t} (1 − d_u / n_u) over
    event times, with censored users leaving the risk set between
    event times.

    Determinism design (the reason this is certifiable at all): the
    product is folded over the ORDERED factor sequence on BOTH
    engines — Spark via a window-ordered collect_list + JVM
    ``aggregate`` fold, DuckDB via a windowed cumulative ``list()`` +
    ``list_reduce`` — so both multiply the identical doubles in the
    identical order and the result matches bit-for-bit (no exp/ln
    trick, whose libm rounding differs across engines).  Factors are
    1 − d/n from exact integers: one division each, deterministic.

    Scale shape: one groupBy(user) pass builds durations; everything
    after lives on the per-(arm, day) AGGREGATE frame (window over
    arm-partitioned event days — bounded by the time horizon, not the
    corpus)."""
    from ..functions.barrier import materialize

    # r15: multiple consumers re-ran the events scan + timestamp
    # decode — one barrier, one scan (surv_01 measured 1.45 -> 1.06 s
    # warm at sf0.1, identical rows).  ADVICE r15, stated knowingly:
    # this pins a CORPUS-ROW-SIZED frame in executor storage and
    # localCheckpoint is not fault-tolerant — the ont_02-style
    # fixture-scale tradeoff.  The cluster-scale form is the DISK_ONLY
    # persist + eager count documented in functions/barrier.py (a lazy
    # persist alone would race: the three consumers sit in one job);
    # the bench must not carry that pessimization for a scale argument
    # the scale lanes already make.
    ev = materialize(T(spark, sf, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")))
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("us").alias("s_us")))
    p = (ev.join(s, "user_id")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("us") > F.col("s_us")))
         .groupBy("user_id").agg(F.min("us").alias("e_us")))
    last = ev.groupBy("user_id").agg(F.max("us").alias("l_us"))
    day = 86_400_000_000
    per = (s.join(p, "user_id", "left").join(last, "user_id")
           .select((F.col("user_id") % 2).alias("arm"),
                   F.expr(f"coalesce(e_us, l_us) - s_us").alias("dus"),
                   F.col("e_us").isNotNull().cast("long").alias("ev"))
           .select("arm", F.expr(f"dus div {day}").alias("t"), "ev"))
    agg = (per.groupBy("arm", "t")
           .agg(F.count("*").alias("leave"), F.sum("ev").alias("d")))
    w_tot = Window.partitionBy("arm")
    w_prev = (Window.partitionBy("arm").orderBy("t")
              .rowsBetween(Window.unboundedPreceding, -1))
    risk = (agg.withColumn(
        "n_risk",
        F.sum("leave").over(w_tot)
        - F.coalesce(F.sum("leave").over(w_prev), F.lit(0))))
    km = (risk.filter(F.col("d") > 0)
          .withColumn("factor",
                      F.lit(1.0) - F.col("d").cast("double")
                      / F.col("n_risk").cast("double")))
    w_cum = (Window.partitionBy("arm").orderBy("t")
             .rowsBetween(Window.unboundedPreceding, 0))
    surv = F.aggregate(F.collect_list("factor").over(w_cum),
                       F.lit(1.0), lambda acc, x: acc * x)
    return (km.select("arm", F.col("t").alias("t_days"), "n_risk", "d",
                      F.round(surv * 1_000_000).cast("long")
                       .alias("surv_s"))
            .orderBy("arm", "t_days"))


_ORACLES["surv_01"] = """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s AS (SELECT user_id, min(us) AS s_us FROM ev
      WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT ev.user_id, min(us) AS e_us FROM ev JOIN s USING (user_id)
      WHERE event_type = 'purchase' AND us > s_us GROUP BY 1),
lst AS (SELECT user_id, max(us) AS l_us FROM ev GROUP BY 1),
per AS (
  SELECT s.user_id % 2 AS arm,
         (COALESCE(e_us, l_us) - s_us) // 86400000000 AS t,
         CASE WHEN e_us IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON s.user_id = p.user_id
  JOIN lst ON s.user_id = lst.user_id),
agg AS (SELECT arm, t, count(*) AS leave_n, SUM(ev) AS d
        FROM per GROUP BY 1, 2),
risk AS (
  SELECT arm, t, d,
         SUM(leave_n) OVER (PARTITION BY arm)
         - COALESCE(SUM(leave_n) OVER (PARTITION BY arm ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
  FROM agg),
km AS (
  SELECT arm, t, n_risk, d,
         1.0::DOUBLE - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
             AS factor
  FROM risk WHERE d > 0)
SELECT arm, t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d,
       CAST(ROUND(list_reduce(
           list(factor) OVER (PARTITION BY arm ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           (a, b) -> a * b) * 1000000) AS BIGINT) AS surv_s
FROM km ORDER BY arm, t
"""
_DOCS["surv_01"] = ("Kaplan-Meier survival curves per arm (signup -> "
                    "first purchase, censored at last activity): "
                    "bit-identical ordered product fold on both "
                    "engines (windowed collect_list + fold vs "
                    "cumulative list + list_reduce) — no exp/ln libm "
                    "exposure")


def ab_01(spark, sf):
    """Two-proportion z-test on 1-day conversion (did a user purchase
    within 24 h of signup?) between arms (user_id mod 2) — the
    experimentation verb.  The 24 h window keeps both proportions
    strictly inside (0, 1) on the dense fixture streams (ever-convert
    saturates to 1.0, where z is undefined — division by zero under
    ANSI mode, caught at sf0.001).  The statistic is CROSS-ENGINE EXACT without any decimal
    scaling trick: every input is an exact integer count, and the
    closed form uses only +, −, ×, ÷ and sqrt — all IEEE
    correctly-rounded operations — through an identical expression
    tree, so the unrounded double matches bit-for-bit (contrast
    exp/ln/pow, whose libm rounding differs across engines; cor_01's
    NOTES discipline).  Emits per-arm counts, rates, the pooled rate,
    and the 1e6-scaled z.  One groupBy(user) pass then a 2-row
    aggregate frame — nothing downstream is corpus-sized."""
    from ..functions.barrier import materialize

    # r15: multiple consumers re-ran the events scan + timestamp
    # decode — one barrier, one scan (surv_01 measured 1.45 -> 1.06 s
    # warm at sf0.1, identical rows).  ADVICE r15, stated knowingly:
    # this pins a CORPUS-ROW-SIZED frame in executor storage and
    # localCheckpoint is not fault-tolerant — the ont_02-style
    # fixture-scale tradeoff.  The cluster-scale form is the DISK_ONLY
    # persist + eager count documented in functions/barrier.py (a lazy
    # persist alone would race: the three consumers sit in one job);
    # the bench must not carry that pessimization for a scale argument
    # the scale lanes already make.
    ev = materialize(T(spark, sf, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")))
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("us").alias("s_us")))
    conv = (ev.join(s, "user_id")
            .filter((F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("s_us"))
                    & (F.col("us") <= F.col("s_us") + 86_400_000_000))
            .select("user_id").distinct()
            .withColumn("c", F.lit(1)))
    per = (s.join(conv, "user_id", "left")
           .select((F.col("user_id") % 2).alias("arm"),
                   F.coalesce("c", F.lit(0)).alias("c")))
    g = (per.groupBy("arm")
         .agg(F.count("*").alias("n"), F.sum("c").alias("x"))
         .orderBy("arm"))
    w = (g.agg(F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
               F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
               F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
               F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1")))
    n0, x0, n1, x1 = [F.col(c).cast("double")
                      for c in ("n0", "x0", "n1", "x1")]
    p0, p1 = x0 / n0, x1 / n1
    pp = (x0 + x1) / (n0 + n1)
    z = (p0 - p1) / F.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    return w.select(
        F.col("n0"), F.col("x0"), F.col("n1"), F.col("x1"),
        F.round(p0 * 1_000_000).cast("long").alias("rate0_s"),
        F.round(p1 * 1_000_000).cast("long").alias("rate1_s"),
        F.round(z * 1_000_000).cast("long").alias("z_s"))


_ORACLES["ab_01"] = """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s AS (SELECT user_id, min(us) AS s_us FROM ev
      WHERE event_type = 'signup' GROUP BY 1),
conv AS (SELECT DISTINCT ev.user_id FROM ev JOIN s USING (user_id)
         WHERE event_type = 'purchase' AND us > s_us
           AND us <= s_us + 86400000000),
per AS (SELECT s.user_id % 2 AS arm,
               CASE WHEN conv.user_id IS NULL THEN 0 ELSE 1 END AS c
        FROM s LEFT JOIN conv ON s.user_id = conv.user_id),
g AS (SELECT arm, count(*) AS n, SUM(c) AS x FROM per GROUP BY 1),
w AS (SELECT
        max(CASE WHEN arm = 0 THEN n END) AS n0,
        max(CASE WHEN arm = 0 THEN x END) AS x0,
        max(CASE WHEN arm = 1 THEN n END) AS n1,
        max(CASE WHEN arm = 1 THEN x END) AS x1
      FROM g)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
       CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
       CAST(ROUND(CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1000000)
            AS BIGINT) AS rate0_s,
       CAST(ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1000000)
            AS BIGINT) AS rate1_s,
       CAST(ROUND(
         (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
          - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                * (1 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                * (1 / CAST(n0 AS DOUBLE) + 1 / CAST(n1 AS DOUBLE)))
         * 1000000) AS BIGINT) AS z_s
FROM w
"""
_DOCS["ab_01"] = ("Two-proportion z-test on conversion between arms: "
                  "exact integer counts through an identical "
                  "+,-,x,/,sqrt expression tree (all IEEE "
                  "correctly-rounded) — bit-identical z on both "
                  "engines; 2-row aggregate frame after one "
                  "groupBy(user) pass")


def cor_01(spark, sf):
    """Pearson correlation of quantity vs extended price per return
    flag — the grouped-statistics verb, made CROSS-ENGINE EXACT: the
    built-in ``corr()`` accumulates FLOATING-POINT partial sums whose
    order the shuffle picks (the PageRank/ivm hash-drift class), so
    this operator instead aggregates the five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) as DECIMALS — exact and associative, any
    partial-agg order yields the same digits — and evaluates the
    closed form once per group row.  The final doubles come from
    identical exact inputs through an identical expression tree on
    both engines, so even the unrounded value matches bit-for-bit;
    the output still ships the 1e6-scaled integer (col_01's
    discipline).  One map-side-combined groupBy over the scan; the
    formula is a per-row projection of the group frame."""
    li = T(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,4)").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("y"))
    m = (li.groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum("x").cast("decimal(38,4)").alias("sx"),
              F.sum("y").cast("decimal(38,4)").alias("sy"),
              F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)"))
               .cast("decimal(38,8)").alias("sxy"),
              F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
               .cast("decimal(38,8)").alias("sxx"),
              F.sum((F.col("y") * F.col("y")).cast("decimal(38,8)"))
               .cast("decimal(38,8)").alias("syy")))
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sxx, syy = [F.col(c).cast("double")
                     for c in ("sxy", "sxx", "syy")]
    r = ((n * sxy - sx * sy)
         / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return (m.select("l_returnflag", "n",
                     F.round(r * 1_000_000).cast("long").alias("corr_s"))
            .orderBy("l_returnflag"))


_ORACLES["cor_01"] = """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4))
             AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
              AS DECIMAL(38,4)) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_extendedprice AS DECIMAL(19,4))
                       AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_quantity AS DECIMAL(19,4))
                       AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))
                       * CAST(l_extendedprice AS DECIMAL(19,4))
                       AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS syy
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, n,
       CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000) AS BIGINT) AS corr_s
FROM m ORDER BY 1
"""
_DOCS["cor_01"] = ("Grouped Pearson correlation with EXACT decimal "
                   "moment sums (order-independent partial aggs; the "
                   "float-sum corr() is shuffle-order nondeterministic) "
                   "— closed form evaluated once per group")


def _ntile_from_rank(rank_col, n_col, k: int):
    """SQL-standard NTILE(k) from a 1-based total-order rank and the
    row count, in closed form (integer arithmetic only): with
    sz = n div k and ex = n mod k, the first ``ex`` buckets hold
    sz+1 rows — exactly Spark's and DuckDB's ntile assignment, but
    computable from a DISTRIBUTED rank (functions/ranking.global_rank)
    instead of a single-partition window.  Assumes n ≥ k (quartiles of
    a customer base)."""
    r, n = F.col(rank_col), F.col(n_col)
    sz = (n / k).cast("long")
    ex = n % k
    head = (sz + 1) * ex
    return (F.when(r <= head, ((r + sz) / (sz + 1)).cast("long"))
            .otherwise(ex + ((r - head + sz - 1) / sz).cast("long"))
            .cast("int"))


def rfm_01(spark, sf):
    """RFM customer segmentation: quartile scores on Recency (days
    since last order), Frequency (order count), Monetary (total
    spend), rolled up to segment counts + per-segment revenue — the
    classic CRM/cohort value matrix (clinical analogue: patients
    scored by visit recency/frequency/cost burden).

    Scale shape: the per-customer frame is ONE groupBy; each quartile
    score is the closed-form NTILE over functions/ranking.global_rank
    (range exchange + parallel per-partition windows + broadcast
    offsets) — NO single-partition ntile window anywhere, which is
    the only way quartile scoring survives 100 TB.  Ties are broken
    by custkey, so every rank is a unique total order and the scores
    are deterministic on both engines (the oracle uses native
    NTILE(4) over the identical order — a hash match certifies the
    closed form ≡ the SQL-standard assignment)."""
    from ..functions.ranking import global_rank

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice")
    per = (o.groupBy("o_custkey")
           .agg(F.max(F.to_date("o_orderdate")).alias("last_o"),
                F.count("*").alias("freq"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                 .cast("decimal(28,4)").alias("mon")))
    gmax = o.agg(F.max(F.to_date("o_orderdate")).alias("gmax"))
    per = (per.crossJoin(F.broadcast(gmax))
           .withColumn("rec_days", F.datediff("gmax", "last_o"))
           .withColumn("neg_f", -F.col("freq"))
           .withColumn("neg_m", -F.col("mon")))
    n1 = per.agg(F.count("*").alias("n_cust"))
    # r15: ONE distributed rank instead of three sequential
    # global_rank calls (each was a range exchange + localCheckpoint +
    # offsets collect — 6 driver-sequenced jobs).  The three metrics
    # stack long-form as (mid, v, custkey) with v embedded in
    # DECIMAL(38,4) — an ORDER-EXACT supertype of rec_days (int),
    # neg_f (long) and neg_m (decimal(28,4)), so within each mid block
    # the total order is identical to the old per-metric order (a
    # double embedding would round decimals and could reorder ties).
    # With mid leading the order, metric m's rows occupy global ranks
    # (m·n_cust, (m+1)·n_cust], so the per-metric rank is
    # g_rnk − mid·n_cust — the exact input _ntile_from_rank saw
    # before; scores and the final segment rollup are unchanged
    # (oracle hash certifies).
    dec = "decimal(38,4)"
    lf = per.select(
        "o_custkey", "mon",
        F.explode(F.array(
            F.struct(F.lit(0).alias("mid"),
                     F.col("rec_days").cast(dec).alias("v")),
            F.struct(F.lit(1).alias("mid"),
                     F.col("neg_f").cast(dec).alias("v")),
            F.struct(F.lit(2).alias("mid"),
                     F.col("neg_m").cast(dec).alias("v")))).alias("s")
    ).select("o_custkey", "mon", "s.mid", "s.v")
    ranked = global_rank(lf, ["mid", "v", "o_custkey"], "g_rnk")
    sc = (ranked.crossJoin(F.broadcast(n1))
          .withColumn("rnk", F.col("g_rnk")
                      - F.col("mid") * F.col("n_cust"))
          .withColumn("score", _ntile_from_rank("rnk", "n_cust", 4)))
    scored = (sc.groupBy("o_custkey")
              .agg(F.min("mon").alias("mon"),
                   F.max(F.when(F.col("mid") == 0, F.col("score")))
                    .alias("r_score"),
                   F.max(F.when(F.col("mid") == 1, F.col("score")))
                    .alias("f_score"),
                   F.max(F.when(F.col("mid") == 2, F.col("score")))
                    .alias("m_score"))
              .select("mon", "r_score", "f_score", "m_score"))
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("mon"), 2).cast("double")
                  .alias("segment_revenue"))
            .orderBy("r_score", "f_score", "m_score"))


_ORACLES["rfm_01"] = """
WITH per AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_o,
         count(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
  FROM orders GROUP BY 1),
g AS (SELECT max(CAST(o_orderdate AS DATE)) AS gmax FROM orders),
scored AS (
  SELECT mon,
         NTILE(4) OVER (ORDER BY date_diff('day', last_o, gmax),
                        o_custkey) AS r_score,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
         NTILE(4) OVER (ORDER BY mon DESC, o_custkey) AS m_score
  FROM per CROSS JOIN g)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(ROUND(SUM(mon), 2) AS DOUBLE) AS segment_revenue
FROM scored GROUP BY 1, 2, 3
"""
_DOCS["rfm_01"] = ("RFM quartile segmentation (recency/frequency/"
                   "monetary) via closed-form NTILE over the "
                   "DISTRIBUTED global rank — no single-partition "
                   "window; segment counts + decimal-routed revenue")


MBA_MIN_SUP = 3
MBA_TOPK = 20


def mba_01(spark, sf):
    """Market-basket association mining: top part pairs co-ordered in
    the same order, ranked by lift = sup·N / (m₁·m₂) with a minimum
    support — the classic association-rule query (clinical analogue:
    diagnoses coded together beyond chance).

    Scale shape: per-order baskets are SMALL (TPC-H ≤ 7 distinct
    parts/order, fixture max 13), so the pair explosion is a bounded
    per-row JVM transform (≤ C(k,2) pairs per basket, done with
    slice/transform/flatten — no self-join over the corpus and no
    skew: one groupBy(order) shuffle builds baskets, one
    groupBy(pair) shuffle counts support with map-side combine).
    Margins and the scalar order count attach to the AGGREGATED
    support frame.  Lift is scored as INTEGER division
    (sup·N·10⁶ div m₁·m₂ — monotone in lift, col_01's discipline, no
    float cross-engine exposure); the top-k order is total
    (lift desc, sup desc, p1, p2), so LIMIT is deterministic.  The
    sup·N·10⁶ product routes through DECIMAL(38,0) (VERDICT r9
    item 2, closed alongside col_01): exact to 10³⁸, DuckDB oracle
    widened through HUGEINT, DIV's BIGINT quotient unchanged at
    fixture magnitudes (hash-certified)."""
    from ..functions.barrier import materialize

    # r15 (guide §2.4 "remove shuffles outright", measured 2.6 → 1.5 s
    # warm at sf0.1): the old shape ran the lineitem scan + a distinct
    # shuffle THREE times (baskets, margins, order count are three
    # consumers of one logical frame Spark does not dedupe).  Now ONE
    # corpus pass: collect_set dedups per order (distinct was
    # redundant), the basket frame is checkpointed, and margins/order
    # count derive from it — m(part) = #orders containing the part =
    # explode of the per-order distinct sets; n_orders = basket rows.
    # Identical values by construction; oracle hash unchanged.
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    baskets = materialize(
        li.groupBy("l_orderkey")
          .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pairs = (baskets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "y -> struct(x AS p1, y AS p2))))")).alias("pr"))
        .select("pr.p1", "pr.p2"))
    sup = (pairs.groupBy("p1", "p2").agg(F.count("*").alias("sup"))
           .filter(F.col("sup") >= MBA_MIN_SUP))
    marg = (baskets.select(F.explode("ps").alias("l_partkey"))
            .groupBy("l_partkey").agg(F.count("*").alias("m")))
    n = baskets.select(F.count("*").alias("n_orders"))
    scored = (sup
              .join(marg.select(F.col("l_partkey").alias("p1"),
                                F.col("m").alias("m1")), "p1")
              .join(marg.select(F.col("l_partkey").alias("p2"),
                                F.col("m").alias("m2")), "p2")
              .crossJoin(F.broadcast(n))
              .withColumn("lift_s", F.expr(
                  "CAST(sup AS DECIMAL(38,0)) * n_orders * 1000000 "
                  "div (CAST(m1 AS DECIMAL(38,0)) * m2)")))
    return (scored.orderBy(F.desc("lift_s"), F.desc("sup"), "p1", "p2")
            .limit(MBA_TOPK)
            .select("p1", "p2", "sup", "m1", "m2", "lift_s"))


_ORACLES["mba_01"] = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
m AS (SELECT l_partkey, count(*) AS m FROM op GROUP BY 1),
sup AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS sup
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MBA_MIN_SUP})
SELECT p1, p2, sup, m1.m AS m1, m2.m AS m2,
       CAST(CAST(sup AS HUGEINT) * n_orders * 1000000
            // (CAST(m1.m AS HUGEINT) * m2.m) AS BIGINT) AS lift_s
FROM sup JOIN m m1 ON m1.l_partkey = p1
         JOIN m m2 ON m2.l_partkey = p2
CROSS JOIN n
ORDER BY lift_s DESC, sup DESC, p1, p2 LIMIT {MBA_TOPK}
"""
_DOCS["mba_01"] = ("Market-basket association: top co-ordered part "
                   "pairs by integer-scored lift with min support; "
                   "bounded per-basket JVM pair explosion (no corpus "
                   "self-join), margins joined on the aggregated "
                   "support frame")


def sky_01(spark, sf):
    """Per-brand Pareto skyline (minimize retail price, maximize size):
    the rows no other same-brand part dominates — the multi-criteria
    shortlist query (clinical analogue: treatments not dominated on
    cost vs coverage).

    Scale shape — NO self-join, ever: a 2-D skyline is a monotone
    frontier, so membership reduces to (a) being the max-size row at
    your (brand, price) point and (b) beating the running max size
    over all STRICTLY cheaper prices.  Both are computed on the
    per-(brand, price) AGGREGATE frame (one groupBy shuffle, then a
    window over distinct-price cardinality — vocab-sized, not
    corpus-sized); the qualifying (brand, price, size) frontier set is
    tiny and broadcast back against the scan.  The NOT EXISTS oracle
    is the O(n²) semantic definition — a hash match certifies the
    frontier algebra replaces it exactly, ties included (equal
    (price, size) points never dominate each other, so duplicate
    frontier parts all survive on both engines)."""
    p = T(spark, sf, "part").select(
        "p_brand", "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"))
    m = p.groupBy("p_brand", "price").agg(F.max("size").alias("m"))
    w = (Window.partitionBy("p_brand").orderBy("price")
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (m.withColumn("cm", F.max("m").over(w))
                 .filter(F.col("cm").isNull() | (F.col("cm") < F.col("m")))
                 .select("p_brand", "price", F.col("m").alias("size")))
    sky = p.join(F.broadcast(frontier), ["p_brand", "price", "size"])
    return (sky.select("p_brand", "p_partkey",
                       F.col("price").cast("double").alias("price"),
                       "size")
            .orderBy("p_brand", "price", "p_partkey"))


_ORACLES["sky_01"] = """
SELECT y.p_brand, y.p_partkey,
       CAST(y.p_retailprice AS DOUBLE) AS price, y.p_size AS size
FROM part y
WHERE NOT EXISTS (
    SELECT 1 FROM part x
    WHERE x.p_brand = y.p_brand
      AND x.p_retailprice <= y.p_retailprice
      AND x.p_size >= y.p_size
      AND (x.p_retailprice < y.p_retailprice OR x.p_size > y.p_size))
"""
_DOCS["sky_01"] = ("Per-brand Pareto skyline (min price, max size) as "
                   "a monotone frontier: groupBy to the (brand, price) "
                   "aggregate, running-max window, broadcast frontier "
                   "join back — no self-join; oracle is the NOT EXISTS "
                   "dominance definition")


def pvt_01(spark, sf):
    """PIVOT → UNPIVOT roundtrip (the report-matrix verb): monthly
    revenue pivoted to one column per order status, then unpivoted
    back to long form with ``stack`` — the oracle is the direct
    GROUP BY, so the hash certifies pivot∘unpivot ≡ identity on the
    aggregate.  The pivot VALUES are declared explicitly ('F','O','P')
    rather than discovered: Spark's value-less ``pivot`` runs a
    driver-side distinct collect to find the columns — an anti-pattern
    at 100 TB and a nondeterministic column order besides.  The pivot
    itself is one groupBy(m) with conditional aggregates (map-side
    combinable); unpivot is a per-row ``stack`` projection, no
    shuffle."""
    o = T(spark, sf, "orders")
    m = F.date_format("o_orderdate", "yyyy-MM").alias("m")
    wide = (o.select(m, "o_orderstatus",
                     F.col("o_totalprice").cast("decimal(18,4)")
                      .alias("p"))
             .groupBy("m").pivot("o_orderstatus", ["F", "O", "P"])
             .agg(F.sum("p")))
    lng = wide.select(
        "m", F.expr("stack(3, 'F', F, 'O', O, 'P', P) "
                    "AS (o_orderstatus, rev)"))
    return (lng.filter(F.col("rev").isNotNull())
               .select("m", "o_orderstatus",
                       F.round(F.col("rev"), 2).cast("double")
                        .alias("rev"))
               .orderBy("m", "o_orderstatus"))


_ORACLES["pvt_01"] = """
SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS m, o_orderstatus,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS rev
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""
_DOCS["pvt_01"] = ("PIVOT/UNPIVOT roundtrip: explicit-values pivot "
                   "(no driver-side distinct collect) to a status "
                   "matrix, stack back to long form; oracle = direct "
                   "GROUP BY, certifying the roundtrip is identity")


def gsets_01(spark, sf):
    """GROUPING SETS with grouping_id — the explicit subtotal-lattice
    verb (agg_olap's CUBE is the full lattice; real reports want
    chosen sets): revenue by (status), (month), (status, month) and
    the grand total in ONE pass over the scan (Spark expands the sets
    with a single Expand node feeding one hash aggregate — not four
    scans), each row tagged with the SQL-standard grouping_id bit
    vector.  Subtotal NULLs are projected to 'ALL' labels so the
    result carries no NULL-vs-NaN cross-engine ambiguity into the
    hash."""
    o = T(spark, sf, "orders")
    base = o.select(F.col("o_orderstatus").alias("s"),
                    F.date_format("o_orderdate", "yyyy-MM").alias("m"),
                    F.col("o_totalprice").cast("decimal(18,4)").alias("p"))
    g = (base.groupingSets([["s"], ["m"], ["s", "m"], []], "s", "m")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("p"), 2).cast("double").alias("rev"),
                  F.grouping_id().alias("gid")))
    return (g.select(F.coalesce("s", F.lit("ALL")).alias("s"),
                     F.coalesce("m", F.lit("ALL")).alias("m"),
                     F.col("gid").cast("int").alias("gid"), "n", "rev")
             .orderBy("gid", "s", "m"))


_ORACLES["gsets_01"] = """
SELECT COALESCE(s, 'ALL') AS s, COALESCE(m, 'ALL') AS m,
       CAST(GROUPING(s, m) AS INT) AS gid, count(*) AS n,
       CAST(ROUND(SUM(p), 2) AS DOUBLE) AS rev
FROM (SELECT o_orderstatus AS s,
             substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS m,
             CAST(o_totalprice AS DECIMAL(18,4)) AS p
      FROM orders)
GROUP BY GROUPING SETS ((s), (m), (s, m), ())
ORDER BY gid, s, m
"""
_DOCS["gsets_01"] = ("GROUPING SETS subtotal lattice with grouping_id "
                     "bit vector: four chosen sets in one Expand+agg "
                     "pass, NULL subtotals projected to 'ALL' labels")


#: sample size for the deterministic bottom-k hash sample
SMP4_K = 64


def smp_04(spark, sf):
    """Deterministic MERGEABLE bottom-k hash sample — the distributed
    sampling primitive a 100 TB pipeline actually wants: every row
    gets the priority ``md5(key)`` (a cross-engine-stable uniform
    hash) and the sample is the K smallest priorities.  Properties the
    other smp_* keys lack: (a) mergeable — bottom-k of a union is the
    bottom-k of the per-shard bottom-k's, so shards/streams/partitions
    sample independently and merge exactly (the KMV construction; the
    property test replays it); (b) deterministic — same corpus, same
    sample, any partitioning, no seed plumbing; (c) uniform without a
    global sort — Spark executes ORDER BY+LIMIT as TakeOrdered:
    per-partition top-K heaps then a K·P driver merge, never a full
    sort (plan-asserted in test_plans)."""
    o = T(spark, sf, "orders").select("o_orderkey")
    return (o.select("o_orderkey",
                     F.md5(F.col("o_orderkey").cast("string"))
                      .alias("pr"))
             .orderBy("pr").limit(SMP4_K)
             .orderBy("o_orderkey"))


_ORACLES["smp_04"] = f"""
SELECT o_orderkey, pr FROM (
  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS pr
  FROM orders ORDER BY pr LIMIT {SMP4_K})
ORDER BY o_orderkey
"""
_DOCS["smp_04"] = ("Deterministic mergeable bottom-k hash sample "
                   "(KMV construction): md5 priority, TakeOrdered "
                   "per-partition heaps, no seed and no global sort; "
                   "merge-exactness property-tested")


def jn_11(spark, sf):
    """As-of join, FORWARD direction with a tolerance window (the
    pandas/polars ``merge_asof(direction='forward', tolerance=...)``
    verb; jn_09 is the backward form): for each click, the value of
    that user's NEXT purchase, but only if it lands within 2 hours —
    the time-to-conversion attach.  temporal.asof_join_forward runs it
    as ONE shuffle (union + descending key-partitioned window carrying
    a (ts, value) struct; the tolerance is a post-window projection,
    never a range join).  Purchases pre-aggregate to min(value) per
    (user, ts) so equal-timestamp ties are deterministic on both
    engines."""
    from . import temporal

    e = T(spark, sf, "events")
    clicks = e.filter(e.event_type == "click") \
              .select("event_id", "user_id", "ts")
    buys = (e.filter(e.event_type == "purchase")
             .groupBy(e.user_id.alias("b_user"), e.ts.alias("b_ts"))
             .agg(F.min("value").alias("b_val")))
    res = temporal.asof_join_forward(
        clicks, buys, left_key="user_id", right_key="b_user",
        left_ts="ts", right_ts="b_ts", value_col="b_val",
        out_col="nxt_val", tolerance_seconds=7200)
    return (res.select("event_id",
                       F.round("nxt_val", 2).alias("nxt_val"))
               .orderBy("event_id"))


_ORACLES["jn_11"] = """
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts, min(value) AS v FROM events
      WHERE event_type = 'purchase' GROUP BY 1, 2),
nxt AS (SELECT c.event_id, min(p.ts) AS pts
        FROM c JOIN p ON p.user_id = c.user_id
          AND (epoch_ns(p.ts) // 1000) >= (epoch_ns(c.ts) // 1000)
          AND (epoch_ns(p.ts) // 1000)
              <= (epoch_ns(c.ts) // 1000) + 7200000000
        GROUP BY 1)
SELECT c.event_id, ROUND(p.v, 2) AS nxt_val
FROM c LEFT JOIN nxt USING (event_id)
LEFT JOIN p ON p.user_id = c.user_id AND p.ts = nxt.pts
ORDER BY c.event_id
"""
_DOCS["jn_11"] = ("As-of join FORWARD with tolerance (merge_asof "
                  "direction=forward): next purchase value within 2h "
                  "per click — one shuffle, descending-window carry, "
                  "tolerance as a projection (no range join)")


def reg_01(spark, sf):
    """Grouped simple linear regression (OLS y = a + b·x): slope and
    intercept of extended price on quantity per return flag — cor_01's
    exact-decimal-moment discipline extended to the modeling verb.
    The five moment sums aggregate as DECIMALS (exact, associative —
    partial-agg order cannot move them), the closed forms evaluate
    once per group row through an identical IEEE expression tree on
    both engines, so even unrounded doubles match bit-for-bit; the
    output ships 1e6-scaled integers.  One map-side-combined groupBy
    over the scan."""
    li = T(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,4)").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("y"))
    m = (li.groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum("x").cast("decimal(38,4)").alias("sx"),
              F.sum("y").cast("decimal(38,4)").alias("sy"),
              F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)"))
               .cast("decimal(38,8)").alias("sxy"),
              F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
               .cast("decimal(38,8)").alias("sxx")))
    n, sx, sy, sxy, sxx = [F.col(c).cast("double")
                           for c in ("n", "sx", "sy", "sxy", "sxx")]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    return (m.select("l_returnflag", "n",
                     F.round(slope * 1_000_000).cast("long")
                      .alias("slope_s"),
                     F.round(icept * 1_000_000).cast("long")
                      .alias("icept_s"))
            .orderBy("l_returnflag"))


_ORACLES["reg_01"] = """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4))
             AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
              AS DECIMAL(38,4)) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_extendedprice AS DECIMAL(19,4))
                       AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_quantity AS DECIMAL(19,4))
                       AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS sxx
  FROM lineitem GROUP BY 1),
s AS (
  SELECT l_returnflag, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m)
SELECT l_returnflag, n,
       CAST(ROUND(slope * 1000000) AS BIGINT) AS slope_s,
       CAST(ROUND((syd - slope * sxd) / CAST(n AS DOUBLE) * 1000000)
            AS BIGINT) AS icept_s
FROM s ORDER BY 1
"""
_DOCS["reg_01"] = ("Grouped OLS regression (slope + intercept) from "
                   "EXACT decimal moment sums — order-independent "
                   "partial aggs, bit-identical closed form on both "
                   "engines (cor_01's discipline, modeling verb)")


def cpd_01(spark, sf):
    """CUSUM changepoint detection on the daily event-count series —
    the level-shift monitor (clinical analogue: a jump in daily ED
    visit volume).  The classic CUSUM statistic C_t = Σ_{i≤t}(x_i−x̄)
    involves an inexact mean; multiplying by n makes it EXACT INTEGER:
    c_t = n·P_t − t·T (P_t prefix sum, T total, n days) — identical
    BIGINTs on both engines, no division anywhere, and argmax|c| is
    the estimated changepoint.  Peaks (possibly tied) are flagged in
    the output so the hash certifies the whole series AND the
    detection.

    Scale shape: one corpus groupBy(day) reduces to the DAY-cardinality
    frame; the ordered windows run on that frame — bounded by the time
    horizon, not the corpus (the surv_01/skyline discipline for
    unpartitioned windows).  n·P_t ≤ days·events needs BIGINT headroom
    ~10¹⁶ at 100 TB-scale counts; DECIMAL(38,0) routing is the escape
    hatch above that."""
    e = T(spark, sf, "events")
    daily = (e.groupBy(F.to_date("ts").alias("d"))
              .agg(F.count("*").alias("x")))
    w_ord = Window.orderBy("d")
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(F.sum("x").alias("tt"),
                    F.count("*").alias("n"))
    c = (daily.withColumn("t", F.row_number().over(w_ord))
              .withColumn("p", F.sum("x").over(w_pre))
              .crossJoin(F.broadcast(tot))
              .select("d", "x",
                      (F.col("n") * F.col("p")
                       - F.col("t") * F.col("tt")).alias("c_s")))
    # peak as a whole-frame window max instead of an agg + crossJoin:
    # the frame is already single-partitioned by w_ord, so this adds
    # no exchange AND avoids recomputing the c subtree for a scalar
    w_all = (Window.partitionBy()
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    return (c.withColumn("m", F.max(F.abs("c_s")).over(w_all))
             .select(F.col("d").cast("timestamp_ntz").alias("d"), "x",
                     "c_s", (F.abs("c_s") == F.col("m")).alias("peak"))
             .orderBy("d"))


_ORACLES["cpd_01"] = """
WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS x
               FROM events GROUP BY 1),
tot AS (SELECT sum(x) AS tt, count(*) AS n FROM daily),
c AS (SELECT d, x,
             CAST(n * sum(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  - row_number() OVER (ORDER BY d) * tt AS BIGINT)
               AS c_s
      FROM daily CROSS JOIN tot),
m AS (SELECT max(abs(c_s)) AS m FROM c)
SELECT CAST(d AS TIMESTAMP) AS d, x, c_s, abs(c_s) = m AS peak
FROM c CROSS JOIN m ORDER BY d
"""
_DOCS["cpd_01"] = ("CUSUM changepoint detection on the daily series: "
                   "n-scaled statistic c_t = n*P_t - t*T is exact "
                   "integer (no mean division), peak(s) flagged; "
                   "windows on the day-cardinality frame only")


def jn_12(spark, sf):
    """Correlated scalar subquery, decorrelated (the TPC-H Q17 shape):
    revenue of lineitems whose quantity is below 20% of THEIR part's
    average quantity.  Declared as the decorrelated form Catalyst
    itself rewrites to — the per-part aggregate joined back (one
    groupBy + one equi-join, both shuffle-partitioned on partkey; the
    naive correlated form would be one subquery execution per outer
    row).  The 0.2·avg threshold routes through DECIMAL so the
    comparison is exact on both engines (avg is sum/count over
    decimals at fixed scale — deterministic digits, unlike a double
    avg whose partial order floats)."""
    li = T(spark, sf, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,4)").alias("q"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("p"))
    avg_q = (li.groupBy("l_partkey")
               .agg((F.sum("q") / F.count("*")).cast("decimal(18,4)")
                    .alias("aq")))
    return (li.join(avg_q, "l_partkey")
              .filter(F.col("q")
                      < (F.lit("0.2").cast("decimal(2,1)")
                         * F.col("aq")).cast("decimal(18,4)"))
              .agg(F.count("*").alias("n_items"),
                   F.round(F.sum("p"), 2).cast("double").alias("rev")))


_ORACLES["jn_12"] = """
WITH li AS (SELECT l_partkey,
                   CAST(l_quantity AS DECIMAL(18,4)) AS q,
                   CAST(l_extendedprice AS DECIMAL(18,4)) AS p
            FROM lineitem),
a AS (SELECT l_partkey,
             CAST(SUM(q) / count(*) AS DECIMAL(18,4)) AS aq
      FROM li GROUP BY 1)
SELECT count(*) AS n_items,
       CAST(ROUND(SUM(p), 2) AS DOUBLE) AS rev
FROM li JOIN a USING (l_partkey)
WHERE q < CAST(CAST(0.2 AS DECIMAL(2,1)) * aq AS DECIMAL(18,4))
"""
_DOCS["jn_12"] = ("Correlated scalar subquery decorrelated (TPC-H Q17 "
                  "shape): per-part avg aggregate joined back — one "
                  "groupBy + one equi-join instead of per-row subquery "
                  "execution; decimal-exact threshold")


def agg_13(spark, sf):
    """Multiple COUNT(DISTINCT) over different columns in ONE query —
    the shape Spark executes with a single Expand node (each row
    replicated once per distinct-aggregate with a grouping id) feeding
    one aggregate, instead of three self-joined scans.  Distinct
    customers, statuses and order dates per priority, plus the plain
    row count riding the same pass."""
    o = T(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(F.count("*").alias("n"),
                  F.countDistinct("o_custkey").alias("n_cust"),
                  F.countDistinct("o_orderstatus").alias("n_status"),
                  F.countDistinct("o_orderdate").alias("n_dates"))
             .orderBy("o_orderpriority"))


_ORACLES["agg_13"] = """
SELECT o_orderpriority, count(*) AS n,
       count(DISTINCT o_custkey) AS n_cust,
       count(DISTINCT o_orderstatus) AS n_status,
       count(DISTINCT o_orderdate) AS n_dates
FROM orders GROUP BY 1 ORDER BY 1
"""
_DOCS["agg_13"] = ("Multi-column COUNT DISTINCT in one pass (single "
                   "Expand + aggregate, not three scans)")


def win_08(spark, sf):
    """Rolling 7-day distinct active users per day (the WAU metric) —
    the one rolling aggregate a window frame CANNOT express
    (``countDistinct`` is not frame-able): each (user, day) activity
    contributes to the 7 day-buckets it is visible from (a bounded
    per-row sequence explode — ×7 amplification on the per-user-day
    DISTINCT frame, not the raw corpus), then one groupBy(day)
    countDistinct.  Days past the observed horizon are trimmed so
    every reported day is fully defined.  At 100 TB the explode factor
    is the WINDOW LENGTH — constant — and both shuffles key on
    user-day/day; the naive per-day self-join would be 7 scans."""
    e = T(spark, sf, "events")
    ud = (e.select("user_id", F.to_date("ts").alias("d")).distinct())
    horizon = ud.agg(F.max("d").alias("dmax"))
    buckets = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"),
                             F.date_add(F.col("d"), 6))).alias("day"))
    return (buckets.crossJoin(F.broadcast(horizon))
            .filter(F.col("day") <= F.col("dmax"))
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias("wau"))
            .select(F.col("day").cast("timestamp_ntz").alias("day"),
                    "wau")
            .orderBy("day"))


_ORACLES["win_08"] = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
h AS (SELECT max(d) AS dmax FROM ud),
b AS (SELECT user_id, d + CAST(x AS INTEGER) AS day
      FROM ud, UNNEST(range(0, 7)) AS u(x))
SELECT CAST(day AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS wau
FROM b CROSS JOIN h WHERE day <= dmax
GROUP BY 1 ORDER BY 1
"""
_DOCS["win_08"] = ("Rolling 7-day distinct active users (WAU): "
                   "bounded day-bucket explode + one groupBy "
                   "countDistinct — the scalable form of the rolling "
                   "distinct a window frame cannot express")


def specs() -> list[QuerySpec]:
    _ORACLES["prof_01"] = _prof_01_oracle()
    out = []
    g = globals()
    for key, doc in _DOCS.items():
        out.append(QuerySpec(key=key, fn=g[key], oracle=_ORACLES.get(key),
                             doc=doc, tags=("relational",)))
    return out
