"""Bucketed co-located join: same-key same-count buckets join with no
shuffle Exchange on either side."""

from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.sources import lake


def test_bucketed_join_has_no_shuffle(spark):
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lake.write_bucketed(l, "bk_lineitem", "l_orderkey", num_buckets=8)
    lake.write_bucketed(o, "bk_orders", "o_orderkey", num_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl = spark.table("bk_lineitem")
        bo = spark.table("bk_orders")
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).groupBy(
            "o_orderkey"
        ).agg(F.sum("l_quantity").alias("qty"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # cross-check against the unbucketed join
        plain = (
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert joined.exceptAll(plain).count() == 0
        assert plain.exceptAll(joined).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_orders")
