import pytest


@pytest.fixture(scope="session")
def spark():
    from tsengine.session import get_spark

    s = get_spark(
        app_name="tsengine-tests",
        master="local[4]",
        shuffle_partitions="4",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    )
    yield s
