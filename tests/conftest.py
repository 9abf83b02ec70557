import pytest


@pytest.fixture(scope="session")
def spark():
    from reader_spark.spark.session import get_spark

    spark = get_spark(app_name="reader_spark_tests", master="local[4]")
    yield spark
    spark.stop()
