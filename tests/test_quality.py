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


def test_config_overrides_thresholds(spark):
    # defaults pass at 12 rows; a raised min_total_records must fail
    # the record_count check through the same end-to-end path
    df = _df(spark)
    assert run_quality_checks(df)["overall_passed"]
    r = run_quality_checks(df, config={"min_total_records": 100})
    c = _check(r, "record_count")
    assert not c["passed"]
    assert "below minimum threshold (100)" in c["failures"][0]

    # tightened severity range flips value_ranges; loosened one passes
    # a score the default range rejects
    r = run_quality_checks(df, config={"severity_range": [0, 5]})
    assert not _check(r, "value_ranges")["passed"]
    hot = _df(spark, severity_score=500.0)
    r = run_quality_checks(hot, config={"severity_range": [0, 1000]})
    assert _check(r, "value_ranges")["passed"]

    # required_fields override: demand a column that is 100% null
    r = run_quality_checks(
        df, config={"required_fields": {"fda": ["safetyreportid", "nct_id"]}}
    )
    c = _check(r, "completeness")
    assert not c["passed"]
    assert any("nct_id" in f for f in c["failures"])


def test_quality_cli_config_exit_code(spark, tmp_path):
    # reference-shaped YAML config (pipeline_config.yaml:42-63) driven
    # through the CLI: default thresholds exit 0, raised minimum exits 1
    from cloud_native_medical_data_etl_pipeline_spark import cli
    from cloud_native_medical_data_etl_pipeline_spark.sources import lake

    date = "2024-01-15"
    base = str(tmp_path / "lake")
    lake.write_partitioned(_df(spark), f"{base}/processed", date)

    cfg = tmp_path / "pipeline_config.yaml"
    cfg.write_text("quality:\n  min_total_records: 100\n")

    common = ["quality", "--date", date, "--base", base]
    assert cli.main(common) == 0
    assert cli.main(common + ["--config", str(cfg)]) == 1


def test_load_quality_config_shapes(tmp_path):
    from cloud_native_medical_data_etl_pipeline_spark.operators.quality import (
        load_quality_config,
    )

    full = tmp_path / "full.yaml"
    full.write_text("quality:\n  max_missing_percentage: 25\nstorage:\n  raw_prefix: raw\n")
    assert load_quality_config(str(full)) == {"max_missing_percentage": 25}

    bare = tmp_path / "bare.yaml"
    bare.write_text("min_records_per_source: 2\n")
    assert load_quality_config(str(bare)) == {"min_records_per_source": 2}


def test_backfill_runs_days_isolated(spark, tmp_path):
    from cloud_native_medical_data_etl_pipeline_spark.plans import pipeline
    from cloud_native_medical_data_etl_pipeline_spark import schemas

    base = str(tmp_path / "lake")
    raw = spark.createDataFrame(
        [
            {
                "safetyreportid": "r1",
                "receivedate": dt.date(2024, 1, 15),
                "serious": 1,
                "seriousnessdeath": 0,
                "seriousnesshospitalization": 0,
                "reaction": "HEADACHE",
                "patient_age": 40.0,
                "patient_sex": "1",
                "drug_name": "ASPIRIN",
                "drug_indication": "PAIN",
            }
        ],
        schema=schemas.FDA_EVENTS,
    )

    def load(spark_, date):
        if date == "2024-01-16":
            raise RuntimeError("upstream fetch failed")
        return raw, None

    # the 1-row fixture needs relaxed minimums — which also exercises
    # the config threading through run()
    cfg = {"min_total_records": 1, "min_records_per_source": 1}
    res = pipeline.backfill(
        spark,
        ["2024-01-15", "2024-01-16", "2024-01-17"],
        load,
        base,
        quality_config=cfg,
    )
    assert [r.date for r in res] == ["2024-01-15", "2024-01-16", "2024-01-17"]
    assert res[1].status.startswith("error:")
    # the failed middle day does not poison its neighbors
    ok = [r for r in res if r.status == "success"]
    assert len(ok) == 2 and all(r.enriched_records >= 1 for r in ok)
    # each good day wrote exactly its own partition
    from cloud_native_medical_data_etl_pipeline_spark.sources import lake

    assert lake.list_partition_dates(spark, f"{base}/processed") == [
        "2024-01-15",
        "2024-01-17",
    ]
    # stop_on_failure halts at the bad day
    res2 = pipeline.backfill(
        spark,
        ["2024-01-15", "2024-01-16", "2024-01-17"],
        load,
        str(tmp_path / "lake2"),
        stop_on_failure=True,
        quality_config=cfg,
    )
    assert len(res2) == 2 and res2[-1].status.startswith("error")


def test_load_quality_config_error_paths(tmp_path):
    import pytest as _pytest

    from cloud_native_medical_data_etl_pipeline_spark.operators.quality import (
        load_quality_config,
    )

    bad = tmp_path / "bad.yaml"
    bad.write_text("quality: [unclosed\n  - ]broken: {{\n")
    with _pytest.raises(ValueError, match="bad.yaml"):
        load_quality_config(str(bad))

    scalar = tmp_path / "scalar.yaml"
    scalar.write_text("42\n")
    with _pytest.raises(ValueError, match="not a mapping"):
        load_quality_config(str(scalar))
