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


def test_retry_recovers_injected_transient_failures(spark):
    # every even-indexed page raises on its first two attempts and
    # succeeds on the last: the scan is complete only if the retry
    # loop recovers those pages, and the rows must be IDENTICAL to a
    # clean scan (no lost or duplicated records)
    clean = sorted(r["value"] for r in _load(spark, limit=350).collect())
    faulty = sorted(
        r["value"]
        for r in _load(spark, limit=350, mock_fail_every=2).collect()
    )
    assert faulty == clean
    assert len(faulty) == 350


def test_retry_exhaustion_raises():
    # a page that faults on EVERY attempt must surface the terminal
    # error, not silently drop the page (driver-side reader unit; no
    # Spark needed)
    import pytest as _pytest

    from cloud_native_medical_data_etl_pipeline_spark.sources import (
        fda_datasource as FD,
    )

    r = FD._Reader(
        {"mock": "true", "limit": "99", "mock_total": "99",
         "mock_fail_every": "1"}
    )
    # make page 0 fail on all attempts, not just the first two
    orig = r._do_fetch

    def always_fail(skip, limit, attempt):
        raise FD.TransientFetchError("permanent outage")

    r._do_fetch = always_fail
    with _pytest.raises(RuntimeError, match="after 3 attempts"):
        list(r.read(FD._PageRange(0, 99)))
    # and with the real injector (fails twice, succeeds on the last
    # attempt) the same partition recovers in full
    r._do_fetch = orig
    assert len(list(r.read(FD._PageRange(0, 99)))) == 99
