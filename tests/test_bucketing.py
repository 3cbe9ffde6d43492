"""Bucketed-table tests: same-bucketed joins plan without a shuffle
exchange on the bucket key (the B-tree-index replacement, SURVEY.md §4)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog, plans
from docker_aktin_dwh_spark.sources import bucketed


#: plan shape (no exchange) and join parity don't depend on table size —
#: a patient slice keeps the bucketed write cheap
def _slice(df):
    return df.filter(F.col("patient_num") < 500)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static config — tables land in the session
    # default (spark-warehouse/, gitignored) and are dropped on teardown
    fact = _slice(catalog.observation_fact(spark, SF_SMOKE))
    pat = _slice(catalog.patient_dimension(spark, SF_SMOKE))
    bucketed.write_bucketed(fact, "fact_b", bucket_col="patient_num",
                            n_buckets=8, sort_col="patient_num")
    bucketed.write_bucketed(pat, "pat_b", bucket_col="patient_num",
                            n_buckets=8, sort_col="patient_num")
    yield "fact_b", "pat_b"
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS pat_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed.bucketed_join(spark, left, right, "patient_num")
    plan = plans.formatted_plan(j)
    assert not re.search(r"Exchange hashpartitioning\([^)]*patient_num",
                         plan), plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed.bucketed_join(spark, left, right, "patient_num")
    fact = _slice(catalog.observation_fact(spark, SF_SMOKE))
    pat = _slice(catalog.patient_dimension(spark, SF_SMOKE))
    expect = fact.join(pat, "patient_num")
    n = j.count()
    assert n == expect.count() and n > 0


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = (spark.table(left).groupBy("patient_num")
           .agg(F.count("*").alias("n")))
    plan = plans.formatted_plan(agg)
    assert not re.search(r"Exchange hashpartitioning\([^)]*patient_num",
                         plan), plan
