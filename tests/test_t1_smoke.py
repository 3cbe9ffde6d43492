"""t1 smoke: every declared query runs on sf0.001 with a stable,
non-degenerate schema (SURVEY.md §5.2), and the driver entry contract
holds."""

from __future__ import annotations

import pytest

from conftest import BUILDER_CACHE, SF_SMOKE, pooled_key_results

from docker_aktin_dwh_spark.registry import build_registry

REGISTRY = build_registry()

#: constructed-empty at tiny scale is fine for these (dup/near-dup sets)
MAY_BE_EMPTY = {"ded_ngram", "ded_ngram2", "ded_minhash", "ded_simhash_raw",
                "ded_embed",
                "ded_incr", "jn_06", "set_04", "ann_lsh_raw", "ann_ivf_raw",
                "dupcc_01", "pr_01"}

#: heavy consolidated tagged unions whose EVERY branch is itself a
#: fine-grained key in this sweep — smoking them again at sf0.001
#: re-runs the same builders a second time for no new signal (they stay
#: fully hash-checked at sf0.01 in test_t2_oracle); suite-time guard,
#: VERDICT r6 item 7.
SKIP_SMOKE = {"llm_all", "maint_all", "ext_all", "fin_all", "str_out",
              "r7_all", "r8_all", "r9_all", "r9b_all", "ann_bx"}
SMOKE_KEYS = sorted(k for k in REGISTRY if k not in SKIP_SMOKE)


@pytest.fixture(scope="module")
def smoke_results(spark, request):
    """Selected keys executed concurrently (thread pool over the shared
    session) — per-key assertions below are unchanged."""

    def run(key):
        cached = BUILDER_CACHE.get(key)
        if cached is not None:
            # builder already executed (and value-compared) this
            # session by test_sql_surface — counts carry over
            return len(cached.columns), len(cached), None
        try:
            df = REGISTRY[key].fn(spark, SF_SMOKE)
            return len(df.schema.fields), df.count(), None
        except Exception as e:
            return 0, -1, e

    return pooled_key_results(request, SMOKE_KEYS, run)


@pytest.mark.parametrize("key", SMOKE_KEYS)
def test_smoke(smoke_results, key):
    n_fields, n, err = smoke_results[key]
    if err is not None:
        raise AssertionError(f"{key} failed: {err!r}") from err
    assert n_fields > 0
    if key not in MAY_BE_EMPTY:
        assert n > 0, f"{key} returned no rows at smoke scale"


def test_entry_contract(spark):
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 75


def test_range_join_same_ts_name_autoaliases(spark):
    """Self-join / colliding ts names: range_join renames the right
    timestamp to `{ts}_r` instead of tripping Spark's ambiguous
    self-join check (NOTES.md headroom item)."""
    from docker_aktin_dwh_spark import catalog
    from docker_aktin_dwh_spark.operators import temporal
    from pyspark.sql import functions as F

    e = catalog.load(spark, SF_SMOKE, "events")
    a = e.select("event_id", "ts")
    b = e.select(F.col("event_id").alias("eid2"), "ts")
    out = temporal.range_join(a, b, left_ts="ts", right_ts="ts",
                              window_seconds=3600)
    assert "ts_r" in out.columns
    assert out.count() > 0


def test_json_missing_path_is_null(spark):
    """FN-JSON: extraction of an absent path yields NULL (the
    CDA-attribute-absent case), for both string and typed access."""
    from docker_aktin_dwh_spark import catalog
    from pyspark.sql import functions as F

    e = catalog.load(spark, SF_SMOKE, "events").filter(F.col("props").isNotNull())
    row = e.select(
        F.get_json_object("props", "$.missing").alias("mv"),
        F.from_json("props", "struct<missing:int>").getField("missing").alias("tv"),
    ).first()
    assert row["mv"] is None and row["tv"] is None
