"""Python DataSource (Spark 4 API) tests: partitioned parallel REST
fetch with the deterministic mock transport."""

from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark import schemas
from cloud_native_medical_data_etl_pipeline_spark.operators import ingest
from cloud_native_medical_data_etl_pipeline_spark.sources.fda_datasource import (
    OpenFDADataSource,
)


def _load(spark, **opts):
    spark.dataSource.register(OpenFDADataSource)
    reader = spark.read.format("openfda").option("mock", "true")
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_partitioned_fetch_row_count(spark):
    df = _load(spark, limit=500)
    # one partition per 99-record page window
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 500


def test_pages_per_partition_bounds_tasks(spark):
    df = _load(spark, limit=500, pages_per_partition=3)
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 500


def test_short_page_terminates(spark):
    # source exhausted at 120 records although 300 requested
    df = _load(spark, limit=300, mock_total=120)
    assert df.count() == 120


def test_flatten_roundtrip(spark):
    df = _load(spark, limit=120)
    parsed = df.select(F.from_json("value", schemas.FDA_RAW).alias("r")).select("r.*")
    flat = ingest.flatten_fda(parsed)
    assert flat.count() == 120
    assert len(flat.columns) == 11
    row = flat.where(F.col("application_number") == "NDA000007").first()
    assert row["brand_name"] == "BRAND7"
    assert row["active_ingredients"] == "ing7"
