from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
# mock:// object-store scheme resolves under this root (see
# exon_spark.sources.fs.MockFsHandler). Must be set BEFORE the session
# launches — Python planning/executor workers inherit the JVM's env, which
# is captured at gateway start. Root "/" makes mock://<abs-path-minus-
# leading-slash> address any fixture file.
os.environ.setdefault("EXON_SPARK_MOCK_FS_ROOT", "/")


@pytest.fixture(scope="session")
def spark():
    from exon_spark import get_spark

    spark = get_spark(app_name="exon-spark-tests", shuffle_partitions=4)
    yield spark
    spark.stop()
