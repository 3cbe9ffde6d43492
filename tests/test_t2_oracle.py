"""t2 correctness: every declared query hash-matches the DuckDB oracle
at sf0.01 (SURVEY.md §5.2).

The per-key checks are independent latency-bound jobs (small Spark
query + small DuckDB query), so a module fixture submits them all
through a thread pool against the shared session — Spark schedules
concurrent jobs fine, DuckDB gets one cursor per worker — and the
parametrized tests assert the precomputed per-key outcome.  Assertion
set and failure granularity are unchanged; wall time is pool time.
"""

from __future__ import annotations

import pytest

from docker_aktin_dwh_spark.registry import build_registry

from conftest import SF_ORACLE, pooled_key_results
from oracle_harness import compare, duck_connection

REGISTRY = build_registry()
WITH_ORACLE = sorted(k for k, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(k for k, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def results(spark, duck, request):
    def run(key):
        spec = REGISTRY[key]
        try:
            sdf = spec.fn(spark, SF_ORACLE)
            if spec.oracle is None:
                n = sdf.count()
                ok = n >= 0 and len(sdf.schema.fields) > 0
                return ok, f"rows_only: n={n}"
            ddf = duck.cursor().execute(spec.oracle).df()
            return compare(sdf, ddf)
        except Exception as e:        # surfaced by the per-key test
            return False, f"exception: {e!r}"

    return pooled_key_results(request, WITH_ORACLE + ROWS_ONLY, run)


@pytest.mark.parametrize("key", WITH_ORACLE)
def test_oracle_match(results, key):
    ok, msg = results[key]
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_runs(results, key):
    ok, msg = results[key]
    assert ok, f"{key}: {msg}"
