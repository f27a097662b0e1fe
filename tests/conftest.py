from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

# Default 8 (optimization round 11): the suite is orchestration-bound
# Spark jobs whose stages mostly have 8 shuffle partitions — running
# them 4-at-a-time left half of every stage queued.  Overridable so a
# constrained host can turn it back down.
_TEST_CPUS = os.environ.get("SPARK_TEST_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master(f"local[{_TEST_CPUS}]")
        .appName("name-match-ml-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"
