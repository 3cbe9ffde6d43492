"""Scale-fixture generator invariants (bench's scaling-slope evidence
is only as good as these): replica-0 identity, cross-replica token
disjointness, and exact linear scaling of aggregate results."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_SMOKE, SCALE_REPLICAS as REPLICAS

from docker_aktin_dwh_spark import catalog
from docker_aktin_dwh_spark.operators.relational import jn_03


def test_replica_counts_and_distinct_keys(spark, scale_dir):
    base = catalog.load(spark, SF_SMOKE, "documents")
    scaled = catalog.load(spark, scale_dir, "documents")
    n = base.count()
    assert scaled.count() == REPLICAS * n
    assert scaled.select("doc_id").distinct().count() == REPLICAS * n


def test_replica0_text_verbatim(spark, scale_dir):
    base = catalog.load(spark, SF_SMOKE, "documents").alias("b")
    scaled = catalog.load(spark, scale_dir, "documents").alias("s")
    mx = base.agg(F.max("doc_id")).first()[0]
    j = (scaled.filter(F.col("doc_id") <= mx).join(base, "doc_id"))
    assert j.count() == base.count()      # replica 0 fully present
    assert j.filter(F.col("s.text") != F.col("b.text")).count() == 0


def test_cross_replica_tokens_disjoint(spark, scale_dir):
    scaled = catalog.load(spark, scale_dir, "documents")
    mx = catalog.load(spark, SF_SMOKE, "documents") \
        .agg(F.max("doc_id")).first()[0]
    stride = int(mx) + 1
    from docker_aktin_dwh_spark.functions.textfns import tokens
    toks = scaled.select(
        (F.col("doc_id") / stride).cast("int").alias("r"),
        F.explode(tokens("text")).alias("t"))
    assert toks.count() > 0
    # a token text appearing in two replicas would break the
    # no-cross-replica-near-dup guarantee the dedup slopes rely on
    assert (toks.groupBy("t")
                .agg(F.countDistinct("r").alias("nr"))
                .filter(F.col("nr") > 1).count()) == 0


def test_jn03_scales_exactly_linearly(spark, scale_dir):
    base = {r["r_name"]: float(r["rev"])
            for r in jn_03(spark, SF_SMOKE).collect()}
    scaled = {r["r_name"]: float(r["rev"])
              for r in jn_03(spark, scale_dir).collect()}
    assert set(base) == set(scaled)
    for k, v in base.items():
        assert math.isclose(scaled[k], REPLICAS * v, rel_tol=1e-9), k


def test_events_replicate_preserving_per_user_activity(spark, scale_dir):
    """Events replicate on (event_id, user_id) with time unchanged:
    user count ×R, per-user event-type histograms identical — so the
    event-analytics slopes (seq_01/ts_01) measure more users, not
    distorted sessions."""
    base = catalog.load(spark, SF_SMOKE, "events")
    scaled = catalog.load(spark, scale_dir, "events")
    assert scaled.count() == REPLICAS * base.count()
    stride = int(base.agg(F.max("user_id")).first()[0]) + 1
    per_user = (scaled.groupBy("user_id", "event_type").count()
                .groupBy((F.col("user_id") % stride).alias("u"),
                         "event_type")
                .agg(F.countDistinct("count").alias("variants"),
                     F.count("*").alias("replicas")))
    bad = per_user.filter((F.col("variants") != 1)
                          | (F.col("replicas") != REPLICAS)).count()
    assert bad == 0


def test_seq01_scales_by_user_replication(spark, scale_dir):
    """Funnel attribution on the replica fixture: every base user's
    (click, purchase, gap) triple recurs verbatim in each replica at
    the offset ids — R× rows, identical per-user semantics."""
    from docker_aktin_dwh_spark.operators.relational import seq_01

    base = seq_01(spark, SF_SMOKE).collect()
    scaled = seq_01(spark, scale_dir).collect()
    assert len(scaled) == REPLICAS * len(base)
    ev = catalog.load(spark, SF_SMOKE, "events")
    ustride = int(ev.agg(F.max("user_id")).first()[0]) + 1
    estride = int(ev.agg(F.max("event_id")).first()[0]) + 1
    want = {(r.user_id + rep * ustride, r.click_id + rep * estride,
             r.purchase_id + rep * estride, r.gap_sec)
            for r in base for rep in range(REPLICAS)}
    got = {(r.user_id, r.click_id, r.purchase_id, r.gap_sec)
           for r in scaled}
    assert got == want
