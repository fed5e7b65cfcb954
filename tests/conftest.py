import pytest

from open_ocr_spark.pipeline.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="open-ocr-spark-tests", master="local[4]",
                      shuffle_partitions=8)
    yield spark
    spark.stop()
