import pytest

from jena_geo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("jena-geo-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
