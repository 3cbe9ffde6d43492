"""Report-runner tests (SURVEY.md §3.3 / M5): artifacts materialize,
re-running overwrites idempotently, exports are pseudonymized."""

from __future__ import annotations

from conftest import SF_SMOKE

from docker_aktin_dwh_spark import catalog, report


def test_run_report_materializes_all_frames(spark, tmp_path):
    counts = report.run_report(spark, SF_SMOKE, str(tmp_path))
    assert set(counts) == {"monthly_visits", "top_concepts",
                           "patients_by_sex"}
    assert counts["monthly_visits"] == 24        # 12 months × 2 classes
    assert counts["top_concepts"] == 10
    assert all(n > 0 for n in counts.values())
    # idempotent re-run (overwrite, not append)
    again = report.run_report(spark, SF_SMOKE, str(tmp_path))
    assert again == counts


def test_pseudonymize_hashes_ids(spark):
    pat = catalog.patient_dimension(spark, SF_SMOKE).limit(20)
    out = report.pseudonymize(pat, ("patient_num",)).collect()
    assert all(len(r.patient_num) == 64 for r in out)
    plain = {str(r.patient_num) for r in pat.collect()}
    assert plain.isdisjoint({r.patient_num for r in out})
