import pytest

from nutch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="nutch_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
            "spark.driver.memory": "4g",
        },
    )
    yield s
