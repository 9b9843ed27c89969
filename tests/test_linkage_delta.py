"""blocked_fuzzy_join, snapshot_diff, and rolling_zscore_flags:
semantics on planted fixtures plus the plan/scale properties each
operator's docstring claims (no cross join for linkage; map-side
hash reduction for the diff; single-window no-self-join z-scores)."""

import datetime

import pytest
from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.operators.delta import (
    snapshot_diff,
)
from cloud_native_medical_data_etl_pipeline_spark.operators.linkage import (
    blocked_fuzzy_join,
)
from cloud_native_medical_data_etl_pipeline_spark.operators.stats import (
    rolling_zscore_flags,
)


# ---------------------------------------------------------------- linkage
@pytest.fixture(scope="module")
def rosters(spark):
    clean = spark.createDataFrame(
        [
            (1, "alpha-0001"),
            (2, "alpha-0002"),
            (3, "bravo-0003"),
            (4, "bravo-9999"),
        ],
        "id long, name string",
    )
    dirty = spark.createDataFrame(
        [
            (11, "alpha-001"),   # 0001 with one char dropped -> dist 1
            (12, "alpha-x002"),  # 0002 with one char replaced -> dist 1
            (13, "zulu-0003"),   # same suffix block, dist 4 from bravo-0003
            (14, "romeo-7777"),  # block with no clean member
        ],
        "id long, name string",
    )
    return clean, dirty


def test_fuzzy_join_matches_within_block(spark, rosters):
    clean, dirty = rosters
    out = blocked_fuzzy_join(
        dirty,
        clean,
        left_key="id",
        right_key="id",
        left_col="name",
        right_col="name",
        block=lambda c: F.substring(c, -3, 3),
        max_dist=1,
    ).collect()
    got = {(r["left_key"], r["right_key"]): r["distance"] for r in out}
    # 11 matches 1 (same '001' block, dist 1); 12 matches 2; 13 shares
    # block '003' with 3 but dist 4 fails verify; 14 has no block peer
    assert got == {(11, 1): 1, (12, 2): 1}


def test_fuzzy_join_hot_block_cap_drops_block(spark, rosters):
    clean, dirty = rosters
    # cap 0 prunes every block -> no candidates at all
    out = blocked_fuzzy_join(
        dirty,
        clean,
        left_key="id",
        right_key="id",
        left_col="name",
        right_col="name",
        block=lambda c: F.substring(c, -3, 3),
        max_dist=1,
        max_block_size=0,
    )
    assert out.count() == 0


def test_fuzzy_join_plan_is_equi_join(spark, rosters):
    clean, dirty = rosters
    plan = blocked_fuzzy_join(
        dirty,
        clean,
        left_key="id",
        right_key="id",
        left_col="name",
        right_col="name",
        block=lambda c: F.substring(c, -3, 3),
        max_dist=1,
    )._jdf.queryExecution().executedPlan().toString()
    # candidates must come from the block-key equi-join, never a
    # cartesian / broadcast nested loop over the rosters
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------------ delta
def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d"), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new).collect()
    }
    # 1 unchanged (excluded), 5 NULL->NULL unchanged (excluded)
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    rows = snapshot_diff(old, new, include_unchanged=True).collect()
    assert [(r["doc_id"], r["status"]) for r in rows] == [(1, "unchanged")]


def test_snapshot_diff_hashes_before_join(spark):
    """The full-outer join must ship md5 fingerprints, not documents:
    the text column may not survive past the pre-join projections."""
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "b")], "doc_id long, text string")
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the md5 projections are CHILDREN of the join (printed below it):
    # each side reduces to (__k, md5) before anything shuffles
    below_join = plan[plan.find("Join FullOuter") :]
    assert below_join.count("md5(") == 2
    # and the join condition itself touches only the key
    cond = below_join.splitlines()[0]
    assert "text" not in cond and "__ho" not in cond and "__hn" not in cond


# ---------------------------------------------------------------- zscore
def _ts(hour, minute):
    return datetime.datetime(2024, 1, 1, hour, minute)


def test_rolling_zscore_flags_planted_spike(spark):
    # 30 calm points fill hour 0; the spike lands in hour 1, judged
    # against hour 0's trailing stats (current bucket excluded)
    rows = [(i, _ts(0, i), "g", 10.0 + (i % 2)) for i in range(30)]
    rows.append((99, _ts(1, 5), "g", 500.0))
    rows.append((100, _ts(1, 10), "g", 10.0))  # calm row, same bucket
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_flags(
        df, bucket_seconds=3600, trailing_buckets=24,
        z_thresh=3.0, min_points=10,
    ).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z"] > 3.0


def test_rolling_zscore_current_bucket_excluded(spark):
    """The spike must not inflate the baseline it is judged against:
    a burst of identical spikes in one bucket is still flagged
    (a per-row frame INCLUDING the bucket would absorb them)."""
    rows = [(i, _ts(0, i), "g", 10.0 + (i % 2)) for i in range(30)]
    rows += [(100 + j, _ts(1, j), "g", 500.0) for j in range(5)]
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_flags(
        df, bucket_seconds=3600, trailing_buckets=24,
        z_thresh=3.0, min_points=10,
    )
    assert sorted(r["event_id"] for r in out.collect()) == [100, 101, 102, 103, 104]


def test_rolling_zscore_warmup_guard(spark):
    # a wild point whose trailing buckets hold too few peers is NOT
    # flagged — and hour 0 has NO trailing bucket at all
    rows = [(0, _ts(1, 0), "g", 500.0)] + [
        (i, _ts(0, i), "g", 10.0) for i in range(1, 5)
    ]
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_flags(
        df, bucket_seconds=3600, trailing_buckets=24,
        z_thresh=3.0, min_points=10,
    )
    assert out.count() == 0


def test_rolling_zscore_trailing_window_ages_out(spark):
    """The RANGE frame is keyed on the bucket INDEX: buckets older
    than trailing_buckets fall out even across empty-bucket gaps."""
    rows = [(i, _ts(0, i), "g", 10.0) for i in range(12)]
    # spike 30 bucket-hours later: hour 0 has aged out of a 24-bucket
    # trailing window, so there is no baseline and no flag
    late = datetime.datetime(2024, 1, 2, 6, 0)
    rows.append((99, late, "g", 500.0))
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, value double"
    )
    out = rolling_zscore_flags(
        df, bucket_seconds=3600, trailing_buckets=24,
        z_thresh=3.0, min_points=10,
    )
    assert out.count() == 0


def test_rolling_zscore_plan_shape(spark):
    """Bucket partials feed one tiny window; stats rejoin rows via a
    broadcast hash join — never a cartesian, never a per-row frame
    over the raw events."""
    rows = [(i, _ts(0, i), "g", float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, value double"
    )
    plan = (
        rolling_zscore_flags(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
