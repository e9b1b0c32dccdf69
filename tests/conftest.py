import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # fast session for unit tests


@pytest.fixture(scope="session")
def spark():
    from betl_spark.session import build_spark

    s = build_spark("betl_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def dfl(spark, tmp_path):
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    conf = Conf(app_root=str(tmp_path))
    return DataFlow(conf, "test dataflow", spark=spark)


def rows(df, *order_cols):
    """Collect to a sorted list of tuples for exact comparison."""
    out = [tuple(r) for r in df.collect()]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))
