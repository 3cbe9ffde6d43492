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


# --------------------------------------------------------------------
# At-scale skew probes (VERDICT r5 item 7): the same generator that
# feeds bench.py's 10x slopes plants a hot key at the shared 3x test
# fixture, and the guards / salted paths must behave exactly as
# documented there — not just at base sf.

import pytest

from docker_aktin_dwh_spark.functions.barrier import materialize
from docker_aktin_dwh_spark.operators import dedup
from docker_aktin_dwh_spark.scalegen import plant_hot_phrase


def test_hot_shingle_guard_raises_at_scale(spark, scale_dir):
    """One planted boilerplate phrase pushes a single shingle's df to
    n_docs; the exact-ngram guard must RAISE (never run the df**2 join)
    and point at the LSH path.  The cap is scaled proportionally to the
    fixture (default 20k df is the sf0.1-x10 regime)."""
    docs = catalog.load(spark, scale_dir, "documents")
    n = docs.count()
    cap = int(n * 0.6)
    with pytest.raises(ValueError, match="minhash"):
        dedup.ngram_jaccard_pairs(plant_hot_phrase(docs), 0.8,
                                  max_df=cap, on_guard="raise").count()
    # identical cap, no planted key: the guard stays quiet and the
    # exact baseline still answers
    dedup.ngram_jaccard_pairs(docs, 0.8, max_df=cap).count()


def test_lsh_stays_linear_under_hot_shingle(spark, scale_dir):
    """A hot *shingle* must not become a hot *band*: all 4 perms of a
    band would have to pick the planted shingle as their min for a
    collision, a (k/|doc|)**4 event — so LSH candidate volume stays
    within one candidate-per-doc of the unplanted corpus, and the
    full MinHash pipeline completes and recovers the dup structure."""
    docs = catalog.load(spark, scale_dir, "documents")
    hot = plant_hot_phrase(docs)
    n = docs.count()

    c_base = dedup.lsh_candidates(
        materialize(dedup.doc_minhash_frame(docs))).count()
    c_hot = dedup.lsh_candidates(
        materialize(dedup.doc_minhash_frame(hot))).count()
    assert c_hot <= c_base + n, (
        f"hot shingle inflated LSH candidates {c_base} -> {c_hot}")

    p_base = dedup.minhash_dedup_pairs(
        docs, dedup.JACCARD_THRESHOLD).count()
    p_hot = dedup.minhash_dedup_pairs(
        hot, dedup.JACCARD_THRESHOLD).count()
    # the phrase shifts each pair's Jaccard by O(3/|doc|) — structure
    # preserved within a tolerance band, no quadratic blow-up
    assert p_hot >= int(0.8 * p_base)
    assert p_hot <= p_base + n


def test_salted_agg_equals_plain_at_scale(spark, scale_dir):
    """The salted two-phase agg stays result-identical on the replica
    fixture with the planted hot key (3x the base row count, same hot
    fraction)."""
    o = catalog.load(spark, scale_dir, "orders")
    df = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(-1))
         .otherwise(F.col("o_custkey")))
    salted = skew.salted_agg(
        df, ["o_custkey"],
        {"n": ("count", "o_orderkey"),
         "total": ("sum", "o_totalprice")})
    plain = df.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("n"),
        F.sum("o_totalprice").alias("total"))
    s = {(r.o_custkey, r.n, round(r.total, 2)) for r in salted.collect()}
    p = {(r.o_custkey, r.n, round(r.total, 2)) for r in plain.collect()}
    assert s == p


# --------------------------------------------------------------------
# Hot-KEY fixture (VERDICT r6 item 3): one user holds ~20% of
# interactions, one customer ~20% of orders — the bench skew lane's
# generator, certified for both plant shape and result correctness.

@pytest.fixture(scope="session")
def hot_dir(spark, tmp_path_factory):
    from conftest import SCALE_REPLICAS
    from docker_aktin_dwh_spark.scalegen import ensure_scale_fixture

    out = str(tmp_path_factory.mktemp("skewfix") / "r3hot")
    return ensure_scale_fixture(spark, SF_SMOKE, out, SCALE_REPLICAS,
                                hot=True)


def test_hot_fixture_plants_hot_keys(spark, hot_dir):
    """The planted fractions are what the generator promises: one user
    carries ~20% of interactions, one customer ~20% of orders; volumes
    match the uniform fixture (only the key distribution changed)."""
    ev = catalog.load(spark, hot_dir, "events")
    inter = ev.filter(F.col("event_type").isin("click", "view"))
    top = (inter.groupBy("user_id").count()
           .orderBy(F.desc("count")).first())
    frac = top["count"] / inter.count()
    assert 0.15 <= frac <= 0.30, frac

    o = catalog.load(spark, hot_dir, "orders")
    topc = o.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    cfrac = topc["count"] / o.count()
    assert 0.15 <= cfrac <= 0.30, cfrac
    base_ev = catalog.load(spark, SF_SMOKE, "events")
    from conftest import SCALE_REPLICAS
    assert ev.count() == base_ev.count() * SCALE_REPLICAS


def test_str11_correct_under_hot_user(spark, hot_dir):
    """Correctness under skew: the streaming stream–stream join at the
    hot fixture must still equal the batch interval join exactly — a
    hot state partition may be slow, it must never be wrong (premature
    eviction / dropped matches under memory pressure)."""
    from docker_aktin_dwh_spark.operators import streamnative as SN

    got = {(r.a_id, r.b_id) for r in
           SN.str_11(spark, hot_dir).collect()}
    ev = catalog.load(spark, hot_dir, "events")
    a = ev.filter(F.col("event_type").isin("click", "view")) \
          .select(F.col("event_id").alias("a_id"), "user_id",
                  F.col("ts").alias("a_ts"))
    b = ev.filter(F.col("event_type").isin("purchase", "signup")) \
          .select(F.col("event_id").alias("b_id"),
                  F.col("user_id").alias("b_user"),
                  F.col("ts").alias("b_ts"))
    want = {(r.a_id, r.b_id) for r in
            a.join(b, (F.col("user_id") == F.col("b_user"))
                   & (F.col("b_ts") >= F.col("a_ts"))
                   & (F.col("b_ts") <= F.col("a_ts")
                      + F.expr("INTERVAL 2 HOURS"))).collect()}
    assert got == want and got


def test_salted_agg_plan_is_two_stage(spark, hot_dir):
    """Plan pin for the mitigated path: salted_agg must execute as two
    aggregation stages — a partial keyed on (user_id, __salt) that
    spreads the hot key over salt buckets, then the merge keyed on
    user_id alone — with the salt column absent from the output."""
    ev = catalog.load(spark, hot_dir, "events")
    df = skew.salted_agg(ev, ["user_id"],
                         {"n": ("count", "event_id"),
                          "sv": ("sum", "value")})
    from docker_aktin_dwh_spark import plans
    plan = plans.formatted_plan(df)
    assert skew.SALT_COL in plan, "salt never reached the plan"
    assert plan.count("HashAggregate") >= 4, plan.count("HashAggregate")
    assert skew.SALT_COL not in df.columns
