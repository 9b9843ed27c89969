"""Golden tests ported from the reference's behavioral spec
(reference tests/test_transformers.py — severity golden scalar, phase
truth table, binning edges, completeness flag)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark import schemas
from cloud_native_medical_data_etl_pipeline_spark.operators import transforms


def _fda_fixture(spark):
    # Mirrors reference tests/test_transformers.py:17-42 (2 rows).
    rows = [
        Row(
            safetyreportid="123",
            receivedate=dt.date(2024, 1, 1),
            serious=1,
            seriousnessdeath=0,
            seriousnesshospitalization=1,
            drug_name="ASPIRIN",
            drug_indication="Headache",
            reaction="HEADACHE",
            patient_age=45.0,
            patient_sex="1",
        ),
        Row(
            safetyreportid="124",
            receivedate=dt.date(2024, 1, 2),
            serious=0,
            seriousnessdeath=0,
            seriousnesshospitalization=0,
            drug_name="ibuprofen ",
            drug_indication="Pain",
            reaction="NAUSEA",
            patient_age=17.0,
            patient_sex="2",
        ),
    ]
    return spark.createDataFrame(rows, schema=schemas.FDA_EVENTS)


def test_severity_golden(spark):
    # severity(serious=1, death=0, hosp=1) == 7; all-zeros == 0
    # (reference tests/test_transformers.py:94-104)
    df = transforms.transform_fda_events(_fda_fixture(spark))
    got = {r["safetyreportid"]: r["severity_score"] for r in df.collect()}
    assert got["123"] == 7.0
    assert got["124"] == 0.0


def test_fda_transform_columns(spark):
    df = transforms.transform_fda_events(_fda_fixture(spark))
    rows = {r["safetyreportid"]: r for r in df.collect()}
    assert rows["123"]["data_source"] == "FDA_OpenFDA"
    assert rows["124"]["drug_name_clean"] == "IBUPROFEN"  # upper+trim
    assert rows["123"]["age_group"] == "Adult"
    assert rows["124"]["age_group"] == "Pediatric"  # right-closed (0,18]
    assert rows["123"]["is_complete"] is True


def test_completeness_flips_on_null(spark):
    base = _fda_fixture(spark)
    df = transforms.transform_fda_events(
        base.withColumn(
            "drug_name",
            F.when(F.col("safetyreportid") == "124", F.lit(None)).otherwise(
                F.col("drug_name")
            ),
        )
    )
    rows = {r["safetyreportid"]: r for r in df.collect()}
    assert rows["123"]["is_complete"] is True
    assert rows["124"]["is_complete"] is False


@pytest.mark.parametrize(
    "phase,expected",
    [
        ("PHASE 1", 1.0),
        ("PHASE 2", 2.0),
        ("PHASE 3", 3.0),
        ("PHASE 4", 4.0),
        ("PHASE III", 3.0),
        ("PHASE IV", 4.0),
        ("EARLY_PHASE1", 0.5),
        ("NA", 0.0),
        ("", 0.0),
        (None, 0.0),
    ],
)
def test_phase_truth_table(spark, phase, expected):
    # reference tests/test_transformers.py:141-151 + _parse_phase order
    from cloud_native_medical_data_etl_pipeline_spark.functions.medical import (
        phase_numeric,
    )

    df = spark.createDataFrame([Row(phase=phase)], "phase string")
    assert df.select(phase_numeric("phase").alias("p")).collect()[0]["p"] == expected


@pytest.mark.parametrize(
    "age,expected",
    [
        (0.0, None),  # pd.cut excludes the left edge of the first bin
        (1.0, "Pediatric"),
        (18.0, "Pediatric"),
        (18.5, "Young Adult"),
        (30.0, "Young Adult"),
        (50.0, "Adult"),
        (65.0, "Senior"),
        (100.0, "Elderly"),
        (101.0, None),
        (None, None),
    ],
)
def test_age_bins_right_closed(spark, age, expected):
    from cloud_native_medical_data_etl_pipeline_spark.functions.medical import age_group

    df = spark.createDataFrame([Row(patient_age=age)], "patient_age double")
    assert df.select(age_group().alias("g")).collect()[0]["g"] == expected


@pytest.mark.parametrize(
    "n,expected",
    [(0.0, None), (50.0, "Small"), (51.0, "Medium"), (200.0, "Medium"),
     (1000.0, "Large"), (1001.0, "Very Large"), (None, None)],
)
def test_study_size_bins(spark, n, expected):
    from cloud_native_medical_data_etl_pipeline_spark.functions.medical import (
        study_size_category,
    )

    df = spark.createDataFrame([Row(enrollment_count=n)], "enrollment_count double")
    assert df.select(study_size_category().alias("g")).collect()[0]["g"] == expected


def test_ct_transform(spark):
    rows = [
        Row(
            nct_id="NCT12345678",
            brief_title="Test Study",
            overall_status="RECRUITING",
            phase="PHASE 3",
            enrollment_count=150.0,
            conditions="diabetes",
            start_date=dt.date(2023, 1, 1),
            completion_date=dt.date(2024, 12, 31),
        )
    ]
    df = transforms.transform_clinical_trials(
        spark.createDataFrame(rows, schema=schemas.CLINICAL_TRIALS)
    )
    r = df.collect()[0]
    assert r["data_source"] == "ClinicalTrials_gov"
    assert r["phase_numeric"] == 3.0
    assert r["study_size_category"] == "Medium"
    assert r["is_active"] is True
    assert r["is_completed"] is False
    assert r["conditions_clean"] == "DIABETES"
    assert r["study_duration_days"] == (dt.date(2024, 12, 31) - dt.date(2023, 1, 1)).days


def test_dedup_keeps_one_per_key(spark):
    base = _fda_fixture(spark)
    dup = base.union(base)
    df = transforms.transform_fda_events(dup)
    assert df.count() == 2
