"""Skew-mitigation properties: salted forms are result-identical to
their unsalted forms, and salting actually spreads a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog
from docker_aktin_dwh_spark.operators import skew


def _skewed(spark):
    """orders with one synthetic hot key: every second row remapped to
    custkey -1."""
    o = catalog.load(spark, SF_SMOKE, "orders")
    return o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(-1))
         .otherwise(F.col("o_custkey")))


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    salted = skew.salted_agg(
        df, ["o_custkey"],
        {"n": ("count", "o_orderkey"),
         "total": ("sum", "o_totalprice"),
         "first_date": ("min", "o_orderdate"),
         "last_date": ("max", "o_orderdate")})
    plain = df.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("n"),
        F.sum("o_totalprice").alias("total"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"))
    s = {(r.o_custkey, r.n, round(r.total, 2), r.first_date, r.last_date)
         for r in salted.collect()}
    p = {(r.o_custkey, r.n, round(r.total, 2), r.first_date, r.last_date)
         for r in plain.collect()}
    assert s == p


def test_salt_spreads_hot_key(spark):
    df = skew.with_salt(_skewed(spark), n_salts=8)
    hot = df.filter(F.col("o_custkey") == -1) \
            .select(skew.SALT_COL).distinct().count()
    assert hot >= 6, "hot key should land in most salt buckets"


def test_replicated_broadcast_join_equals_plain(spark):
    df = skew.with_salt(_skewed(spark), n_salts=8)
    c = catalog.load(spark, SF_SMOKE, "customer") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    salted = skew.replicated_broadcast_join(df, c, ["o_custkey"], n_salts=8)
    plain = _skewed(spark).join(c, "o_custkey")
    assert salted.count() == plain.count()
    s = (salted.groupBy("c_nationkey").count().orderBy("c_nationkey")
         .collect())
    p = (plain.groupBy("c_nationkey").count().orderBy("c_nationkey")
         .collect())
    assert s == p
