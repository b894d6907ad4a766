from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from hha_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="hha_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()
