import pytest

from fog_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fogspark-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
