"""t2 correctness: every declared query hash-matches the DuckDB oracle
at sf0.01 (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from docker_aktin_dwh_spark.registry import build_registry

from conftest import SF_ORACLE
from oracle_harness import compare, duck_connection

REGISTRY = build_registry()
WITH_ORACLE = sorted(k for k, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(k for k, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("key", WITH_ORACLE)
def test_oracle_match(spark, duck, key):
    spec = REGISTRY[key]
    sdf = spec.fn(spark, SF_ORACLE)
    ddf = duck.execute(spec.oracle).df()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_runs(spark, key):
    spec = REGISTRY[key]
    sdf = spec.fn(spark, SF_ORACLE)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
