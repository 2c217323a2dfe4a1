from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ophidia_io_server_spark import get_spark

    s = get_spark(app_name="ophidia-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def frag_qty(spark):
    from ophidia_io_server_spark.sources.tables import lineitem_fragment

    return lineitem_fragment(spark, SF_SMALL).cache()


@pytest.fixture()
def server(spark, frag_qty):
    from ophidia_io_server_spark.operators import IOServer

    srv = IOServer(spark)
    srv.catalog.put("frag_qty", frag_qty, cache=False)
    return srv
