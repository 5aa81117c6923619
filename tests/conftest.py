import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.appName("tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # mirror the engine's broadcast posture (session.py): broadcast
        # from AQE-measured sizes or explicit hints only — tests must
        # exercise the plans the engine actually ships (the r9 100x
        # broadcast OOM hid behind estimate-based static broadcasts)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760b"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def ring_fixture(spark):
    """The reference's 5-row golden fixture
    (duckdb_extension/test/python/test_sum.py:15-16):
    3 continuous (a,b,c) + 3 categorical (d,e,f) + group key gb."""
    rows = [
        (1, 1.0, 2.0, 3.0, 4, 5, 6),
        (1, 5.0, 6.0, 7.0, 8, 9, 10),
        (2, 2.0, 1.0, 3.0, 4, 6, 8),
        (2, 5.0, 7.0, 6.0, 8, 10, 12),
        (2, 2.0, 1.0, 3.0, 4, 6, 8),
    ]
    return spark.createDataFrame(
        rows, "gb int, a double, b double, c double, d int, e int, f int"
    )
