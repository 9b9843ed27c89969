"""Quality-suite tests mirroring reference data_quality.py semantics."""

import datetime as dt

from cloud_native_medical_data_etl_pipeline_spark.operators.quality import (
    run_quality_checks,
)


def _df(spark, n_fda=6, n_ct=6, **overrides):
    rows = []
    for i in range(n_fda):
        rows.append(
            {
                "data_source": "FDA_OpenFDA",
                "safetyreportid": f"r{i}",
                "receivedate": dt.date(2024, 1, 1),
                "drug_name": "ASPIRIN",
                "nct_id": None,
                "brief_title": None,
                "overall_status": None,
                "severity_score": 7.0,
                "patient_age": 40.0,
                "enrollment_count": None,
                "start_date": None,
                "completion_date": None,
            }
        )
    for i in range(n_ct):
        rows.append(
            {
                "data_source": "ClinicalTrials_gov",
                "safetyreportid": None,
                "receivedate": None,
                "drug_name": None,
                "nct_id": f"NCT{i}",
                "brief_title": "T",
                "overall_status": "COMPLETED",
                "severity_score": None,
                "patient_age": None,
                "enrollment_count": 100.0,
                "start_date": dt.date(2023, 1, 1),
                "completion_date": dt.date(2024, 1, 1),
            }
        )
    for k, v in overrides.items():
        rows[0][k] = v
    schema = (
        "data_source string, safetyreportid string, receivedate date, "
        "drug_name string, nct_id string, brief_title string, "
        "overall_status string, severity_score double, patient_age double, "
        "enrollment_count double, start_date date, completion_date date"
    )
    return spark.createDataFrame(rows, schema)


def _check(result, name):
    return next(c for c in result["checks"] if c["check"] == name)


def test_all_pass(spark):
    r = run_quality_checks(_df(spark))
    assert r["overall_passed"], r


def test_value_range_violation(spark):
    r = run_quality_checks(_df(spark, severity_score=500.0))
    assert not _check(r, "value_ranges")["passed"]
    assert not r["overall_passed"]


def test_age_range_violation(spark):
    r = run_quality_checks(_df(spark, patient_age=150.0))
    assert not _check(r, "value_ranges")["passed"]


def test_duplicate_detection_counts_all_rows(spark):
    df = _df(spark)
    dup = df.union(df.where(df.safetyreportid == "r0"))
    r = run_quality_checks(dup)
    c = _check(r, "duplicates")
    assert not c["passed"]
    assert "2 duplicate FDA safety reports" in c["failures"][0]


def test_record_count_minimum(spark):
    r = run_quality_checks(_df(spark, n_fda=3, n_ct=3))
    c = _check(r, "record_count")
    assert not c["passed"]  # 6 < 10 total and 3 < 5 per source


def test_date_consistency(spark):
    r = run_quality_checks(
        _df(spark, start_date=dt.date(2025, 1, 1), completion_date=dt.date(2024, 1, 1))
    )
    c = _check(r, "date_consistency")
    assert not c["passed"]


def test_future_date(spark):
    r = run_quality_checks(_df(spark, receivedate=dt.date(2999, 1, 1)))
    assert not _check(r, "date_consistency")["passed"]


def test_null_rate_gate(spark):
    # 2 of 6 FDA rows (33%) null drug_name -> completeness fails
    df = _df(spark)
    from pyspark.sql import functions as F

    broken = df.withColumn(
        "drug_name",
        F.when(F.col("safetyreportid").isin("r0", "r1"), None).otherwise(
            F.col("drug_name")
        ),
    )
    r = run_quality_checks(broken)
    assert not _check(r, "completeness")["passed"]
