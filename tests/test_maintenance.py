"""Table-maintenance invariants: SCD2 history consistency across
multiple batches (cdc_01 / lay_01 invariants live in test_llmops /
test_plans; the oracle sweeps hash-check all declared keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog
from docker_aktin_dwh_spark.operators.maintenance import scd2_apply


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, price double, status string, valid_from string")


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, price double, status string")


def test_scd2_two_batches_full_lifecycle(spark):
    """insert → update → delete across two applied batches: the history
    carries one closed row per superseded version, open rows equal the
    latest snapshot, and unchanged rows keep their original
    valid_from."""
    h0 = _hist(spark, [(1, 10.0, "A", "t0"), (2, 20.0, "B", "t0"),
                       (3, 30.0, "C", "t0")])
    s1 = _snap(spark, [(1, 10.0, "A"),      # unchanged
                       (2, 21.0, "B"),      # updated
                       (4, 40.0, "D")])     # inserted; 3 deleted
    h1 = scd2_apply(h0, s1, ["k"], ["price", "status"], "t1")
    rows1 = {(r.k, r.price, r.valid_from, r.valid_to)
             for r in h1.collect()}
    assert rows1 == {
        (2, 20.0, "t0", "t1"), (3, 30.0, "t0", "t1"),   # closed
        (1, 10.0, "t0", None),                          # kept open
        (2, 21.0, "t1", None), (4, 40.0, "t1", None),   # new open
    }

    # fold a second batch into the OPEN slice only
    open1 = h1.filter(F.col("valid_to").isNull()).drop("valid_to")
    s2 = _snap(spark, [(1, 11.0, "A"),      # now updated
                       (2, 21.0, "B"),      # unchanged this time
                       (3, 30.0, "C")])     # re-inserted; 4 deleted
    h2 = scd2_apply(open1, s2, ["k"], ["price", "status"], "t2")
    rows2 = {(r.k, r.price, r.valid_from, r.valid_to)
             for r in h2.collect()}
    assert rows2 == {
        (1, 10.0, "t0", "t2"), (4, 40.0, "t1", "t2"),
        (1, 11.0, "t2", None),
        (2, 21.0, "t1", None),          # unchanged keeps its valid_from
        (3, 30.0, "t2", None),          # re-insert opens a NEW interval
    }
    # open slice == latest snapshot, always
    open2 = {(r.k, r.price) for r in
             h2.filter(F.col("valid_to").isNull()).collect()}
    assert open2 == {(1, 11.0), (2, 21.0), (3, 30.0)}


def test_scd2_null_attribute_transitions(spark):
    """NULL→value and value→NULL are real changes (eqNullSafe), while
    NULL→NULL is not."""
    h0 = _hist(spark, [(1, None, "A", "t0"), (2, None, "B", "t0"),
                       (3, 30.0, "C", "t0")])
    s1 = _snap(spark, [(1, 5.0, "A"), (2, None, "B"), (3, None, "C")])
    h1 = scd2_apply(h0, s1, ["k"], ["price", "status"], "t1")
    got = {(r.k, r.price, r.valid_from, r.valid_to) for r in h1.collect()}
    assert got == {
        (1, None, "t0", "t1"), (1, 5.0, "t1", None),
        (2, None, "t0", None),
        (3, 30.0, "t0", "t1"), (3, None, "t1", None),
    }


def test_dq_checks_catch_planted_violations(spark):
    """Every audit check must report a NONZERO violation count on the
    planted-defect frame (an audit that can't fail certifies nothing)
    — except range_totalprice, the intentionally-clean control row."""
    from conftest import SF_ORACLE
    from docker_aktin_dwh_spark.operators.maintenance import dq_01

    rows = {r.check_name: (r.violations, r.passed)
            for r in dq_01(spark, SF_ORACLE).collect()}
    assert set(rows) == {"pk_unique", "fk_customer", "null_orderdate",
                         "range_totalprice"}
    for name in ("pk_unique", "fk_customer", "null_orderdate"):
        v, passed = rows[name]
        assert v > 0 and not passed, (name, v)
    v, passed = rows["range_totalprice"]
    assert v == 0 and passed


def test_rollup_merge_equals_direct_aggregate(spark):
    """The rollup+tail merge must equal a direct aggregation — incl.
    the month that straddles the cutoff, whose partials come from both
    branches."""
    from conftest import SF_SMOKE
    from docker_aktin_dwh_spark.operators.maintenance import rollup_01
    from docker_aktin_dwh_spark import catalog
    from docker_aktin_dwh_spark.functions.determinism import dsum

    got = {(r.m, r.n, r.rev) for r in rollup_01(spark, SF_SMOKE).collect()}
    o = catalog.load(spark, SF_SMOKE, "orders")
    direct = {(r.m, r.n, r.rev) for r in
              o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
               .agg(F.count("*").alias("n"),
                    F.round(dsum("o_totalprice"), 2).cast("double")
                     .alias("rev"))
               .collect()}
    assert got == direct and got


def test_dq_fk_gate_broadcasts_at_fixture_scale(spark):
    """The FK anti-join's size gate (VERDICT r6 item 4): at fixture
    scale the dim is far below FK_BROADCAST_MAX_ROWS, so the executed
    plan must broadcast it."""
    from docker_aktin_dwh_spark import plans
    from docker_aktin_dwh_spark.operators import maintenance as M

    plan = plans.formatted_plan(M.dq_01(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dq_fk_gate_large_dim_path(spark):
    """Force the large-dim arm (broadcast_max=0): the join must NOT
    broadcast — and the violation count must equal the broadcast
    path's (the gate changes strategy, never results)."""
    from docker_aktin_dwh_spark import plans
    from docker_aktin_dwh_spark.operators import maintenance as M

    o = catalog.load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey")
    bad = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(-1))
         .otherwise(F.col("o_custkey")))
    cust = catalog.load(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"))

    small = M.fk_violations(bad, cust, "o_custkey")
    large = M.fk_violations(bad, cust, "o_custkey", broadcast_max=0)
    plan_small = plans.formatted_plan(small)
    plan_large = plans.formatted_plan(large)
    assert "BroadcastHashJoin" in plan_small
    assert "BroadcastHashJoin" not in plan_large, plan_large
    assert "ShuffledHashJoin" in plan_large, plan_large
    assert small.count() == large.count() > 0


def test_ivm_delta_fold_is_split_invariant(spark):
    """The ivm_02 convergence claim made explicit: folding the CDC
    change feed's signed deltas into the old view yields the SAME
    final view whether the feed is applied as ONE batch or as five
    hash-split batches in sequence (addition commutes, decimal
    routing makes the sums order-exact) — the batch-side replay of
    the foreachBatch algebra, so 'converges for any split' is tested,
    not just the mod-3 split the streaming key happens to use."""
    from docker_aktin_dwh_spark.operators import maintenance as M

    feed, view_old = M._cdc_feed_and_view(spark, SF_SMOKE)
    feed = feed.localCheckpoint()
    one = M.merge_view_delta(view_old, M.cdc_signed_delta(feed))
    many = view_old
    for b in range(5):
        part = feed.filter(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(5)) == b)
        many = M.merge_view_delta(many, M.cdc_signed_delta(part))
        many = many.localCheckpoint()
    a = {(r.c_nationkey, r.n, str(r.rev)) for r in one.collect()}
    b = {(r.c_nationkey, r.n, str(r.rev)) for r in many.collect()}
    assert a == b and a


def test_ivm_delta_fold_invariant_for_random_batchings(spark):
    """VERDICT r8 headroom item made a property: the fold converges to
    the one-batch result for ANY batching, not just the mod-5 split
    above — hypothesis draws the salt and batch count, so every run
    replays a few genuinely different partitions of the change set
    through the same algebra (the salted xxhash split can realize any
    assignment of rows to batches)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docker_aktin_dwh_spark.operators import maintenance as M

    feed, view_old = M._cdc_feed_and_view(spark, SF_SMOKE)
    feed = feed.localCheckpoint()
    one = M.merge_view_delta(view_old, M.cdc_signed_delta(feed))
    want = {(r.c_nationkey, r.n, str(r.rev)) for r in one.collect()}
    assert want

    @settings(max_examples=4, deadline=None)
    @given(salt=st.integers(0, 2**31 - 1), k=st.integers(2, 5))
    def prop(salt, k):
        many = view_old
        for b in range(k):
            part = feed.filter(F.pmod(F.xxhash64(
                F.col("o_orderkey"), F.lit(salt)), F.lit(k)) == b)
            many = M.merge_view_delta(
                many, M.cdc_signed_delta(part)).localCheckpoint()
        got = {(r.c_nationkey, r.n, str(r.rev)) for r in many.collect()}
        assert got == want

    prop()


def test_ivm_applier_skips_retried_batch(spark, tmp_path):
    """Spark's foreachBatch is AT-LEAST-ONCE: a micro-batch may be
    retried after its effects committed.  The applier must therefore
    be idempotent per batch_id (ADVICE r8) — applying the SAME batch
    id twice leaves the view identical to applying it once, and a
    NEW batch id still applies."""
    from docker_aktin_dwh_spark.operators import maintenance as M

    feed, view_old = M._cdc_feed_and_view(spark, SF_SMOKE)
    feed = feed.localCheckpoint()
    view_path = str(tmp_path / "view")
    view_old.write.mode("overwrite").parquet(view_path)

    apply_delta = M.make_idempotent_applier(view_path)
    half = feed.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(2)) == 0)
    rest = feed.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(2)) == 1)

    def snap():
        return {(r.c_nationkey, str(r.n), str(r.rev))
                for r in spark.read.parquet(view_path).collect()}

    apply_delta(half, 0)
    once = snap()
    apply_delta(half, 0)            # retried batch: must be a no-op
    assert snap() == once
    apply_delta(rest, 1)            # new batch id still applies
    final = snap()
    assert final != once
    # and the final view equals the one-shot fold of the whole feed
    expect = M.merge_view_delta(view_old, M.cdc_signed_delta(feed))
    assert final == {(r.c_nationkey, str(r.n), str(r.rev))
                     for r in expect.collect()}


def test_txn_applier_exactly_once_and_atomic(spark, tmp_path):
    """make_txn_applier's exactly-once contract: a retried batch id is
    a NO-OP (the txn action records it atomically with the view), a
    new id applies, the final view equals the one-shot fold, AND — the
    property the plain applier cannot have — a writer that dies after
    staging but before commit leaves the view exactly at its last
    committed state (no half-applied batch to re-fold on restart)."""
    from docker_aktin_dwh_spark.operators import maintenance as M
    from docker_aktin_dwh_spark.sources import txnlog

    feed, view_old = M._cdc_feed_and_view(spark, SF_SMOKE)
    feed = feed.localCheckpoint()
    tbl = str(tmp_path / "view_tbl")
    txnlog.create_table(spark, view_old, tbl, key="c_nationkey")

    apply_delta = M.make_txn_applier(tbl)
    half = feed.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(2)) == 0)
    rest = feed.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(2)) == 1)

    def snap():
        return {(r.c_nationkey, str(r.n), str(r.rev))
                for r in txnlog.read_table(spark, tbl).collect()}

    apply_delta(half, 0)
    once = snap()
    v_once = txnlog.snapshot(tbl).version
    apply_delta(half, 0)            # retried batch: no-op, NO new commit
    assert snap() == once and txnlog.snapshot(tbl).version == v_once
    # simulated crash between staging and commit: orphan files appear,
    # the committed state does not move
    M.cdc_signed_delta(rest)        # (the work a dying writer did)
    txnlog._stage_data_files(
        spark, M.merge_view_delta(txnlog.read_table(spark, tbl),
                                  M.cdc_signed_delta(rest)),
        tbl, "c_nationkey", 99)
    assert snap() == once
    apply_delta(rest, 1)            # restart applies batch 1 cleanly
    final = snap()
    expect = M.merge_view_delta(view_old, M.cdc_signed_delta(feed))
    assert final == {(r.c_nationkey, str(r.n), str(r.rev))
                     for r in expect.collect()}


def test_dq2_outlier_audit_counts_planted(spark):
    """dq_02 non-vacuity: every planted 100x price is flagged — the
    per-group outlier counts sum to at least the planted-row count."""
    from docker_aktin_dwh_spark.operators import maintenance as M

    l = catalog.load(spark, SF_SMOKE, "lineitem")
    planted = l.filter(F.col("l_orderkey") % M.DQ2_STRIDE == 0).count()
    rows = M.dq_02(spark, SF_SMOKE).collect()
    assert planted > 0 and rows
    assert sum(r.n_outliers for r in rows) >= planted


def test_zorder_layout_tightens_both_dimension_envelopes(spark, tmp_path):
    """The data-skipping claim behind lay_02, measured on real files:
    write orders twice into 8 range-partitioned sorted files — once
    linear (sorted by o_custkey), once Z-ordered (sorted by the Morton
    key) — and compare per-file min/max envelopes.  Linear sort is
    perfect on the leading column but its price envelope per file
    spans ~the full range (a price predicate prunes nothing);
    Z-order keeps BOTH normalized extents partial.  The honest metric
    is per-dimension (an area product just rewards the leading
    column): under linear sort a PRICE predicate hits every file
    (mean price extent ≈ 1 — unprunable), while Z-order holds the
    mean extent of BOTH dimensions materially below 1, i.e. single-
    column predicates on either dimension prune files."""
    from docker_aktin_dwh_spark.operators import maintenance as M

    o = catalog.load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    lo_c, hi_c, lo_p, hi_p = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice")).first()
    z = o.withColumn("zkey", M.zorder_key(
        F.col("o_custkey").cast("double"), F.col("o_totalprice"),
        float(lo_c), float(hi_c), float(lo_p), float(hi_p)))

    def extents(df, key):
        path = str(tmp_path / key)
        (df.repartitionByRange(8, F.col(key))
           .sortWithinPartitions(key)
           .write.mode("overwrite").parquet(path))
        per_file = (spark.read.parquet(path)
                    .groupBy(F.input_file_name().alias("f"))
                    .agg(F.min("o_custkey").alias("lc"),
                         F.max("o_custkey").alias("hc"),
                         F.min("o_totalprice").alias("lp"),
                         F.max("o_totalprice").alias("hp"))
                    .collect())
        assert len(per_file) >= 6
        ec = [(r.hc - r.lc) / (hi_c - lo_c) for r in per_file]
        ep = [(r.hp - r.lp) / (hi_p - lo_p) for r in per_file]
        return sum(ec) / len(ec), sum(ep) / len(ep)

    lin_c, lin_p = extents(z, "o_custkey")
    zo_c, zo_p = extents(z, "zkey")
    assert lin_c < 0.2, lin_c                 # leading column: perfect
    assert lin_p > 0.9, lin_p                 # trailing: unprunable
    # Z-order: both dimensions partial — either predicate prunes
    assert max(zo_c, zo_p) < 0.75, (zo_c, zo_p)
    assert zo_p < 0.8 * lin_p, (zo_p, lin_p)


def test_dq2_percentile_gate_both_arms(spark):
    """dq_02's quartile size gate (VERDICT r7 item 2, the
    fk_violations discipline): below the gate the plan carries the
    EXACT percentile, above it (forced with exact_max_rows=0) the
    percentile_approx sketch — and the audit verdict is IDENTICAL in
    both arms, because the planted ×100 outliers sit far outside
    either arm's fences (the gate changes strategy, never results)."""
    from docker_aktin_dwh_spark import plans
    from docker_aktin_dwh_spark.operators import maintenance as M

    exact = M.dq_02(spark, SF_SMOKE)
    sketch = M.dq_02(spark, SF_SMOKE, exact_max_rows=0)
    p_exact = plans.formatted_plan(exact)
    p_sketch = plans.formatted_plan(sketch)
    assert "percentile(" in p_exact and "approx" not in p_exact, p_exact
    assert "percentile_approx" in p_sketch, p_sketch
    assert sorted(exact.collect()) == sorted(sketch.collect())


def test_table_row_count_reads_footers_not_data(spark, tmp_path):
    """catalog.table_row_count (ADVICE r8): the footer statistic equals
    the real row count for single-file fixtures AND Spark-written
    multi-part directories, and footerless sources (JDBC spec, missing
    table) return None so callers fall back to their exact arm."""
    from docker_aktin_dwh_spark import catalog as C

    for t in ("lineitem", "orders", "nation"):
        n = C.load(spark, SF_SMOKE, t).count()
        assert C.table_row_count(SF_SMOKE, t) == n

    out = tmp_path / "multi.parquet"
    C.load(spark, SF_SMOKE, "nation").repartition(4) \
        .write.mode("overwrite").parquet(str(out))
    assert C.table_row_count(str(tmp_path), "multi") == 25

    assert C.table_row_count("jdbc:postgresql://x/db", "orders") is None
    assert C.table_row_count(str(tmp_path), "nope") is None


def test_make_applier_dispatches_on_view_layout(spark, tmp_path):
    """r10 default-storage seam: make_applier hands a txnlog view the
    exactly-once txn applier and a plain parquet view the legacy
    marker applier — the ACID path is the default for new views."""
    from docker_aktin_dwh_spark.operators import maintenance as M
    from docker_aktin_dwh_spark.sources import txnlog

    _, view_old = M._cdc_feed_and_view(spark, SF_SMOKE)
    tbl = str(tmp_path / "txn_view")
    txnlog.create_table(spark, view_old, tbl, key="c_nationkey")
    plain = str(tmp_path / "plain_view")
    view_old.write.mode("overwrite").parquet(plain)

    assert (M.make_applier(tbl).__qualname__
            == M.make_txn_applier(tbl).__qualname__)
    assert (M.make_applier(plain).__qualname__
            == M.make_idempotent_applier(plain).__qualname__)
