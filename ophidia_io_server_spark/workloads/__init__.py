"""Workload registry package: importing this package registers every
workload (the modules self-register via the ``@workload`` decorator at
import time).  Member modules import BEFORE ``suites`` — the suite
composites read member oracles out of ``WORKLOADS`` at import time."""

from ophidia_io_server_spark.workloads.base import (  # noqa: F401
    WORKLOADS,
    Workload,
    workload,
)
from ophidia_io_server_spark.workloads import core  # noqa: F401,E402
from ophidia_io_server_spark.workloads import tpch  # noqa: F401,E402
from ophidia_io_server_spark.workloads import docs  # noqa: F401,E402
from ophidia_io_server_spark.workloads import streaming  # noqa: F401,E402
from ophidia_io_server_spark.workloads import primitives  # noqa: F401,E402
from ophidia_io_server_spark.workloads import analytics  # noqa: F401,E402
from ophidia_io_server_spark.workloads import relational  # noqa: F401,E402
from ophidia_io_server_spark.workloads import envfp  # noqa: F401,E402
from ophidia_io_server_spark.workloads import suites  # noqa: F401,E402
from ophidia_io_server_spark.workloads.suites import (  # noqa: F401
    GATE_ORDER,
    ordered_workloads,
    registry_composition,
)
from ophidia_io_server_spark.workloads.tpch import flagship  # noqa: F401
