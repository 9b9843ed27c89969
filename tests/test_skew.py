"""salted_join equals the plain join on skewed data."""

from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.operators.skew import salted_join


def _skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 900).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(0, 100).select(
        (F.col("id") + 2).alias("k"), F.col("id").alias("payload")
    )
    return hot.unionByName(tail)


def _dim(spark):
    return spark.range(0, 50).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_salted_inner_matches_plain(spark):
    left, right = _skewed(spark), _dim(spark)
    salted = salted_join(left, right, "k", salt_factor=8)
    plain = left.join(right, "k")
    assert salted.count() == plain.count() == 900 + 50 - 1
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_keeps_unmatched(spark):
    left, right = _skewed(spark), _dim(spark)
    salted = salted_join(left, right, "k", salt_factor=4, how="left")
    plain = left.join(right, "k", "left")
    assert salted.count() == plain.count() == 1000
    assert salted.exceptAll(plain).count() == 0


def test_salt_actually_spreads_hot_key(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators.skew import _salt_expr

    left = _skewed(spark)
    n_salts = (
        left.withColumn("__salt", _salt_expr(left, 8))
        .where(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_salt_spreads_identical_duplicate_rows(spark):
    # a hot key of FULL duplicates (same key, same payload): a
    # content-only hash would put all 800 rows in one salt bucket;
    # the positional mixin must spread them
    from cloud_native_medical_data_etl_pipeline_spark.operators.skew import (
        _salt_expr,
        salted_join,
    )

    left = spark.range(0, 800).select(
        F.lit(1).alias("k"), F.lit("same").alias("payload")
    )
    n_salts = (
        left.withColumn("__salt", _salt_expr(left, 8))
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts >= 2

    # and correctness is unchanged: duplicates join like the plain join
    right = _dim(spark)
    salted = salted_join(left, right, "k", salt_factor=8)
    plain = left.join(right, "k")
    assert salted.count() == plain.count() == 800
    assert salted.exceptAll(plain).count() == 0


def test_skew_report_math_and_nulls(spark):
    from pyspark.sql import functions as F

    from cloud_native_medical_data_etl_pipeline_spark.operators.skew import (
        skew_report,
    )

    # key 'hot' 6 rows, 'warm' 2, None 2, 'cold' 1, 'cool' 1 -> N=12, D=5
    rows = (
        [("hot",)] * 6 + [("warm",)] * 2 + [(None,)] * 2 + [("cold",)] + [("cool",)]
    )
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top=3).collect()
    assert [(r["k"], r["n"]) for r in out] == [("hot", 6), ("warm", 2), (None, 2)]
    hot = out[0]
    assert hot["share"] == 0.5
    assert hot["skew_factor"] == 2.5  # 6 / (12/5)
    # NULL keys are reported, not dropped (the classic skew bug)
    assert any(r["k"] is None for r in out)
