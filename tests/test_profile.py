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


# ---------------------------------------------------------------------------
# profile_deterministic — the oracle-checkable profiler (q64's kernel
# since r14): md5-register HLL + hash-sampled exact quantiles.  The
# cross-engine value equality is proven by q64's DuckDB oracle; these
# tests pin the Spark-side semantics.
# ---------------------------------------------------------------------------
def test_deterministic_profile_exact_columns(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.profile import (
        profile_deterministic,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    prof = {
        r["column"]: r
        for r in profile_deterministic(
            o, ["o_custkey", "o_totalprice", "o_orderpriority"],
            sample_key="o_orderkey",
        ).collect()
    }
    n = o.count()
    lo, hi = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    got = prof["o_totalprice"]
    assert got["n_rows"] == n and got["n_nulls"] == 0
    assert got["min"] == lo and got["max"] == hi
    # hll estimate lands within the p=8 error envelope (~6.5% typical;
    # 4 sigma guard)
    exact = o.select("o_custkey").distinct().count()
    assert abs(prof["o_custkey"]["hll_distinct"] - exact) <= 0.3 * exact
    # sampled quantiles are ordered and inside [min, max]
    assert lo <= got["p25"] <= got["p50"] <= got["p75"] <= hi
    # non-numeric: quantile/min/max null, hll present
    prio = prof["o_orderpriority"]
    assert prio["p50"] is None and prio["min"] is None
    assert prio["hll_distinct"] is not None and prio["hll_distinct"] > 0


def test_deterministic_profile_is_deterministic(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.profile import (
        profile_deterministic,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, profile_deterministic(d, sample_key="doc_id").collect()))
    b = sorted(
        map(
            tuple,
            profile_deterministic(
                d.repartition(7), sample_key="doc_id"
            ).collect(),
        )
    )
    assert a == b


def test_deterministic_profile_all_null_column(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.profile import (
        profile_deterministic,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, x string"
    )
    prof = {
        r["column"]: r for r in profile_deterministic(df, sample_key="id").collect()
    }
    assert prof["x"]["n_nulls"] == 2
    assert prof["x"]["hll_distinct"] == 0.0
