"""Approximate profiler: estimates within documented error bounds,
single-scan plan shape."""

from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.operators.profile import (
    approx_profile,
)


def test_profile_estimates_within_bounds(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    prof = {r["column"]: r for r in approx_profile(
        o, ["o_custkey", "o_totalprice", "o_orderpriority"]
    ).collect()}

    n = o.count()
    exact_cust = o.select("o_custkey").distinct().count()
    got = prof["o_custkey"]
    assert got["n_rows"] == n and got["n_nulls"] == 0
    assert abs(got["approx_distinct"] - exact_cust) <= max(3, 0.06 * exact_cust)

    price = prof["o_totalprice"]
    exact_med = o.selectExpr("percentile(o_totalprice, 0.5) AS m").collect()[0]["m"]
    lo, hi = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert price["min"] == lo and price["max"] == hi
    assert abs(price["p50"] - exact_med) <= 0.05 * (hi - lo)
    assert price["p25"] <= price["p50"] <= price["p75"]

    prio = prof["o_orderpriority"]
    assert prio["p50"] is None  # non-numeric: sketch fields null
    assert prio["approx_distinct"] >= 3


def test_profile_single_scan(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = (
        approx_profile(o)._jdf.queryExecution().executedPlan().toString()
    )
    # one scan of the table, partial-agg before the exchange
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_" in plan, plan


def test_profile_tolerates_map_columns(spark):
    df = spark.createDataFrame(
        [(1, {"a": "b"}), (2, None)], "id long, m map<string,string>"
    )
    prof = {r["column"]: r for r in approx_profile(df).collect()}
    assert prof["m"]["approx_distinct"] is None
    assert prof["m"]["n_nulls"] == 1
    assert prof["id"]["approx_distinct"] == 2


def test_profile_hostile_column_names(spark):
    """Quotes, backticks, and dots in column names must not break the
    profile (the old string-built selectExpr version died on any of
    them) — names appear only as literal values in the output."""
    from cloud_native_medical_data_etl_pipeline_spark.operators.profile import (
        approx_profile,
    )

    df = spark.range(10).selectExpr(
        "id AS `weird.name`",
        "CAST(id AS DOUBLE) AS `it's`",
        "CAST(id AS STRING) AS `back``tick`",
    )
    prof = {r["column"]: r for r in approx_profile(df).collect()}
    assert set(prof) == {"weird.name", "it's", "back`tick"}
    assert prof["weird.name"]["n_rows"] == 10
    assert prof["it's"]["p50"] is not None
    assert prof["back`tick"]["p50"] is None  # non-numeric
