"""cooccurrence_pairs and rrf_fuse: planted-fixture semantics plus
the guards each operator's docstring declares (multiplicity-proof
distinct, hot-basket cap, rank-sum math, per-query grouping)."""

import pytest
from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.operators.assoc import (
    cooccurrence_pairs,
)
from cloud_native_medical_data_etl_pipeline_spark.operators.ranking import (
    rrf_fuse,
)


# ------------------------------------------------------- cooccurrence
def _baskets(spark):
    # basket 1: {a,b,c}; basket 2: {a,b}; basket 3: {c}; basket 4: {a}
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # duplicate a: ignored
        (2, "a"), (2, "b"),
        (3, "c"),
        (4, "a"),
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_cooccurrence_counts_and_lift(spark):
    out = cooccurrence_pairs(_baskets(spark), ["basket"], "item")
    got = {(r["item_a"], r["item_b"]): (r["pair_n"], r["lift"]) for r in out.collect()}
    # N=4; n_a=3, n_b=2, n_c=2
    # (a,b): 2 baskets -> lift = 2*4/(3*2) = 1.333333
    # (a,c): 1 -> 4/(3*2) = 0.666667 ; (b,c): 1 -> 4/(2*2) = 1.0
    assert got[("a", "b")] == (2, pytest.approx(1.333333))
    assert got[("a", "c")] == (1, pytest.approx(0.666667))
    assert got[("b", "c")] == (1, pytest.approx(1.0))
    assert len(got) == 3


def test_cooccurrence_hot_basket_cap(spark):
    """A degenerate basket above the cap contributes NOTHING — not to
    pairs, not to item counts, not to N."""
    out = cooccurrence_pairs(
        _baskets(spark), ["basket"], "item", max_basket_items=2
    )
    got = {(r["item_a"], r["item_b"]): (r["pair_n"], r["lift"]) for r in out.collect()}
    # basket 1 (3 items) dropped: N=3, n_a=2, n_b=1, n_c=1; the only
    # surviving pair is basket 2's (a,b): lift = 1*3/(2*1) = 1.5
    assert got == {("a", "b"): (1, pytest.approx(1.5))}


def test_cooccurrence_min_pair_count(spark):
    out = cooccurrence_pairs(
        _baskets(spark), ["basket"], "item", min_pair_count=2
    )
    assert [
        (r["item_a"], r["item_b"]) for r in out.collect()
    ] == [("a", "b")]


# ---------------------------------------------------------------- rrf
def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_fuse_math_and_order(spark):
    lex = _ranked(spark, [(10, 1), (20, 2), (30, 3)])
    vec = _ranked(spark, [(20, 1), (10, 2), (40, 3)])
    out = rrf_fuse([lex, vec], rrf_k=60, top=4).collect()
    got = {r["doc_id"]: r["rrf"] for r in out}
    assert got[10] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert got[20] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert got[30] == pytest.approx(1 / 63, abs=1e-6)
    # 10 and 20 tie on the ROUNDED score -> key ascending breaks it
    assert [r["doc_id"] for r in out] == [10, 20, 30, 40]


def test_rrf_fuse_per_query_grouping(spark):
    r1 = spark.createDataFrame(
        [("q1", 10, 1), ("q2", 20, 1)], "qid string, doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [("q1", 10, 1), ("q2", 30, 1)], "qid string, doc_id long, rank int"
    )
    out = rrf_fuse([r1, r2], query_cols=("qid",), rrf_k=60, top=1).collect()
    got = {r["qid"]: (r["doc_id"], r["rrf"]) for r in out}
    # q1: doc 10 in both lists wins; q2: 20 and 30 tie, key breaks
    assert got["q1"][0] == 10 and got["q1"][1] == pytest.approx(2 / 61, abs=1e-6)
    assert got["q2"][0] == 20


# ------------------------------------------------------ weighted sample
def test_weighted_sample_deterministic_and_layout_proof(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "doc_id long, w double"
    )
    a = {r["doc_id"] for r in weighted_sample(df, "w", 25).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "w", 25).collect()
    }
    assert a == b and len(a) == 25


def test_weighted_sample_favors_heavy_rows(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        weighted_sample,
    )

    # 100 light (w=1) and 100 heavy (w=50) rows: the top-40 sample
    # must be dominated by heavy rows (A-Res: heavier -> priority
    # closer to 1)
    rows = [(i, 1.0) for i in range(100)] + [
        (100 + i, 50.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in weighted_sample(df, "w", 40).collect()]
    heavy = sum(1 for d in got if d >= 100)
    assert heavy >= 30, heavy


def test_weighted_sample_excludes_bad_weights(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "doc_id long, w double"
    )
    got = [r["doc_id"] for r in weighted_sample(df, "w", 10).collect()]
    assert got == [4]


def test_quantile_buckets_null_values_bucket_zero(spark):
    """NULLs sort FIRST on both engines by explicit pinning (Spark
    defaults NULLS FIRST asc; DuckDB defaults NULLS LAST — the q92
    oracle pins NULLS FIRST) -> NULL values land in bucket 0."""
    import duckdb

    from cloud_native_medical_data_etl_pipeline_spark.operators.stats import (
        quantile_buckets,
    )

    rows = [(0, "g", None)] + [(i, "g", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {
        r["event_id"]: r["bucket"]
        for r in quantile_buckets(df, "event_type", "value", 10).collect()
    }
    assert got[0] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t(event_id BIGINT, event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = dict(
        con.sql(
            """SELECT event_id, CAST(LEAST(FLOOR(percent_rank() OVER (
                 PARTITION BY event_type ORDER BY value NULLS FIRST) * 10), 9)
                 AS BIGINT) FROM t"""
        ).fetchall()
    )
    assert got == want


def test_weighted_sample_large_weights_not_key_order(spark):
    """Token-count-scale weights (w ~ 1e9): the raw u**(1/w) priority
    collapses onto one 9dp grid value and selection degrades to
    smallest-key order; the log-domain key keeps relative precision at
    every weight scale."""
    from cloud_native_medical_data_etl_pipeline_spark.operators.curate import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 1e9 + (i % 13) * 1e7) for i in range(300)],
        "doc_id long, w double",
    )
    got = sorted(r["doc_id"] for r in weighted_sample(df, "w", 30).collect())
    assert got != list(range(30))  # NOT the 30 smallest keys
    again = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), "w", 30).collect()
    )
    assert got == again  # still layout-deterministic
