"""Healthcheck analogue (SURVEY.md §5.2 item 5): the reference gates
liveness on `pg_isready` + `SELECT 1 FROM information_schema.schemata
WHERE schema_name='aktin'` (reference src/docker/template.yml:28) —
our session self-test mirrors that: the catalog lists every fixture
table, each answers a trivial query, and the clinical derivations
expose their core keys."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog


def test_catalog_lists_all_fixture_tables(spark):
    catalog.register_views(spark, SF_SMOKE)
    names = {t.name for t in spark.catalog.listTables()}
    assert set(catalog.TABLES) <= names


@pytest.mark.parametrize("name", catalog.TABLES)
def test_select_one_per_table(spark, name):
    df = catalog.load(spark, SF_SMOKE, name)
    assert df.limit(1).count() == 1


def test_clinical_derivations_healthy(spark):
    fact = catalog.observation_fact(spark, SF_SMOKE)
    for col in ("encounter_num", "patient_num", "concept_cd",
                "start_date", "valtype_cd", "tval_char", "nval_num"):
        assert col in fact.columns
    assert fact.limit(1).count() == 1
    concepts = catalog.concept_dimension(spark, SF_SMOKE)
    assert {"concept_path", "concept_cd", "name_char"} <= set(concepts.columns)
