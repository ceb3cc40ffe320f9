from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from exon_spark import get_spark

    spark = get_spark(app_name="exon-spark-tests", shuffle_partitions=4)
    yield spark
    spark.stop()
