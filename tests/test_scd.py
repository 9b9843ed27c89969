"""scd2_intervals / transition_counts: run collapsing, null-safe
change detection, tiebreak determinism, and transition math on
planted timelines."""

import datetime

from cloud_native_medical_data_etl_pipeline_spark.operators.scd import (
    scd2_intervals,
    transition_counts,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def _us(m):
    return int(_ts(m).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def _log(spark):
    rows = [
        # user 1: a a b b a  -> runs a[0,2) b[2,4) a[4,None)
        (1, _ts(0), "a", 100),
        (1, _ts(1), "a", 101),
        (1, _ts(2), "b", 102),
        (1, _ts(3), "b", 103),
        (1, _ts(4), "a", 104),
        # user 2: null null c -> runs NULL[0,5) c[5,None)
        (2, _ts(0), None, 200),
        (2, _ts(3), None, 201),
        (2, _ts(5), "c", 202),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )


def test_scd2_collapses_runs(spark):
    out = {
        (r["user_id"], r["valid_from_us"]): (r["event_type"], r["valid_to_us"])
        for r in scd2_intervals(
            _log(spark), "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert out == {
        (1, _us(0)): ("a", _us(2)),
        (1, _us(2)): ("b", _us(4)),
        (1, _us(4)): ("a", None),
        (2, _us(0)): (None, _us(5)),  # NULL -> NULL is NOT a change
        (2, _us(5)): ("c", None),
    }


def test_scd2_tiebreak_on_equal_ts(spark):
    # two updates at the SAME ts: event_id order decides run order
    rows = [(1, _ts(0), "x", 2), (1, _ts(0), "y", 1)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        r["event_type"]: (r["valid_from_us"], r["valid_to_us"])
        for r in scd2_intervals(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    # y (id 1) comes first: a zero-length run closed at the same
    # instant by x (id 2), whose run stays open
    assert out["y"] == (_us(0), _us(0))
    assert out["x"] == (_us(0), None)


def test_transition_counts(spark):
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(
            _log(spark), "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    # user 1: a->a, a->b, b->b, b->a; user 2: null->null, null->c
    assert got == {
        ("a", "a"): 1,
        ("a", "b"): 1,
        ("b", "b"): 1,
        ("b", "a"): 1,
        (None, None): 1,
        (None, "c"): 1,
    }


def test_transitions_single_event_user_emits_nothing(spark):
    df = spark.createDataFrame(
        [(9, _ts(0), "solo", 1)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    assert (
        transition_counts(df, "user_id", "ts", "event_type", "event_id").count()
        == 0
    )


# ---------------------------------------------------------------- cdc
def test_apply_cdc_last_writer_wins(spark):
    import pytest as _pytest

    from cloud_native_medical_data_etl_pipeline_spark.operators.cdc import (
        apply_cdc,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U", 10),  # update
            (2, None, 1, "D", 11),  # delete
            (3, "c2", 1, "U", 12),  # update then delete later -> gone
            (3, None, 2, "D", 13),
            (5, "e", 1, "I", 14),   # insert new key
            (6, "f1", 1, "I", 15),  # same ts: higher change_id wins
            (6, "f2", 1, "I", 16),
        ],
        "k long, v string, ts int, op string, change_id long",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_cdc(base, changes, "k", "ts", "op", "change_id")
        .select("k", "v")
        .collect()
    }
    assert got == {1: "a2", 4: "d", 5: "e", 6: "f2"}

    # unknown op fails loud, not silently — even when the malformed
    # row LOSES the latest-per-key race (the check runs pre-window)
    bad = spark.createDataFrame(
        [(9, "x", 1, "u", 1), (9, "y", 2, "U", 2)],
        "k long, v string, ts int, op string, change_id long",
    )
    with _pytest.raises(Exception, match="unknown op"):
        apply_cdc(base, bad, "k", "ts", "op", "change_id").collect()

    # NULL key fails loud too (r16): the latest-per-key window GROUPS
    # nulls while the anti-join's SQL equality never matches them, so
    # admitting a null-key change would mix semantics
    nullkey = spark.createDataFrame(
        [(None, "x", 1, "U", 1)],
        "k long, v string, ts int, op string, change_id long",
    )
    with _pytest.raises(Exception, match="NULL key"):
        apply_cdc(base, nullkey, "k", "ts", "op", "change_id").collect()


# ---------------------------------------------------------------- paths
def test_top_paths_trigram_counts(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.scd import (
        top_paths,
    )

    # user 1: a b a b -> paths a>b>a, b>a>b; user 2: a b a -> a>b>a
    rows = [
        (1, _ts(0), "a", 1), (1, _ts(1), "b", 2),
        (1, _ts(2), "a", 3), (1, _ts(3), "b", 4),
        (2, _ts(0), "a", 5), (2, _ts(1), "b", 6),
        (2, _ts(2), "a", 7),
        (3, _ts(0), "z", 8),  # too short: no path
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = [
        (r["path"], r["n"])
        for r in top_paths(
            df, "user_id", "ts", "event_type", "event_id", steps=3
        ).collect()
    ]
    assert got == [("a>b>a", 2), ("b>a>b", 1)]


def test_top_paths_null_state_rendered_not_dropped(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.scd import (
        top_paths,
    )

    rows = [
        (1, _ts(0), "a", 1), (1, _ts(1), None, 2), (1, _ts(2), "b", 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = [(r["path"], r["n"]) for r in top_paths(
        df, "user_id", "ts", "event_type", "event_id", steps=3
    ).collect()]
    assert got == [("a>^>b", 1)]
