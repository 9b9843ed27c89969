import os

import pytest

from cloud_native_medical_data_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # env-overridable so the suite's core-count/shuffle-width can be
    # tuned per host without editing the fixture (r14 verdict task 6:
    # the suite is latency-bound on many small sequential jobs)
    s = get_spark(
        app_name="tests",
        master=os.environ.get("TEST_SPARK_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("TEST_SHUFFLE_PARTITIONS", "4")),
    )
    yield s
