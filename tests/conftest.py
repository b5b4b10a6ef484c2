import pytest


@pytest.fixture(scope="session")
def spark():
    from crrf_det_spark.pipeline import build_session

    s = build_session(app="crrf_det_spark_tests", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
