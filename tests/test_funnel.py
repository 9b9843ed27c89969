"""Tests for ordered funnel conversion and cohort retention."""

import datetime as dt

import pytest

from cloud_native_medical_data_etl_pipeline_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full chain in order -> reaches all 3
        (1, _t(1), 1, "view"), (2, _t(2), 1, "click"), (3, _t(3), 1, "purchase"),
        # user 2: purchase BEFORE click -> stops after click
        (4, _t(1), 2, "view"), (5, _t(3), 2, "click"), (6, _t(2), 2, "purchase"),
        # user 3: no view -> reaches nothing (click/purchase don't count)
        (7, _t(1), 3, "click"), (8, _t(2), 3, "purchase"),
        # user 4: view only
        (9, _t(5), 4, "view"),
        # user 5: same-timestamp click as view -> strict > excludes it
        (10, _t(1), 5, "view"), (11, _t(1), 5, "click"),
    ]
    out = {
        r["step"]: (r["step_idx"], r["users"])
        for r in funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (1, 4)      # users 1,2,4,5
    assert out["click"] == (2, 2)     # users 1,2 (5's click is not strictly after)
    assert out["purchase"] == (3, 1)  # user 1 only


def test_funnel_greedy_uses_earliest_qualifying(spark):
    # view@1, click@2, click@4, purchase@3: greedy picks click@2 so
    # purchase@3 qualifies — a latest-click rule would miss it
    rows = [
        (1, _t(1), 1, "view"), (2, _t(2), 1, "click"),
        (3, _t(4), 1, "click"), (4, _t(3), 1, "purchase"),
    ]
    out = {r["step"]: r["users"] for r in
           funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        funnel_counts(_ev(spark, []), [])


def test_cohort_retention_offsets(spark):
    # weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    rows = [
        # user 1: first week 01-01, active again 01-15 -> offsets 0, 2
        (1, dt.datetime(2024, 1, 2, 10), 1, "view"),
        (2, dt.datetime(2024, 1, 16, 9), 1, "click"),
        # user 2: joins week 01-08, active 01-08 only -> offset 0
        (3, dt.datetime(2024, 1, 10, 8), 2, "view"),
        # user 3: same cohort as user 1, active weeks 0 and 1
        (4, dt.datetime(2024, 1, 1, 0), 3, "view"),
        (5, dt.datetime(2024, 1, 8, 0), 3, "view"),
    ]
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["active_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,  # users 1 and 3
        ("2024-01-01", 1): 1,  # user 3
        ("2024-01-01", 2): 1,  # user 1
        ("2024-01-08", 0): 1,  # user 2
    }


def test_cohort_retention_max_weeks(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view"),
        (2, dt.datetime(2024, 3, 4), 1, "view"),  # offset 9
    ]
    out = cohort_retention(_ev(spark, rows), max_weeks=4).collect()
    assert {r["week_offset"] for r in out} == {0}
