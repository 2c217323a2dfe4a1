"""One-shot mechanical splitter: carved workload.py into the
ophidia_io_server_spark/workloads/ package (r8 VERDICT #3).  Pure line-range
extraction — section bodies were copied verbatim; only the per-module import
headers were generated.  HISTORICAL: this ran once in round 9 against the
monolith (now the facade); the package files have since been edited in
place — do NOT re-run."""

from __future__ import annotations

import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "ophidia_io_server_spark" / "workload.py"
PKG = ROOT / "ophidia_io_server_spark" / "workloads"

lines = SRC.read_text().split("\n")  # 0-based; line N is lines[N-1]


def rng(a: int, b: int) -> str:
    """Lines a..b-1 (1-based, half-open) verbatim."""
    return "\n".join(lines[a - 1:b - 1])


COMMON_IMPORTS = """\
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ophidia_io_server_spark.operators.engine import IOServer  # noqa: F401
from ophidia_io_server_spark.session import session_key  # noqa: F401
from ophidia_io_server_spark.sources.random_import import (  # noqa: F401
    random_fragment_oracle_sql,
)
from ophidia_io_server_spark.sources.tables import (  # noqa: F401
    exact_cents_sum,
    fragment_cte,
    lineitem_fragment,
    lineitem_fragment_cached,
    load_table,
)
"""

BASE_IMPORT = """\
from ophidia_io_server_spark.workloads.base import (  # noqa: F401
    WORKLOADS,
    Workload,
    _FRAG_BOTH_CTE,
    _FRAG_QTY_CTE,
    _corpus_tag,
    _ensure_session_defaults,
    _exploded_oracle,
    _explode_arrays,
    _server,
    workload,
)
"""

MODULES: list[tuple[str, str, tuple[int, int], list[str]]] = [
    # (module, docstring, (start, end) 1-based half-open, extra imports)
    ("core",
     "Reference-dialect coverage: §2.1 select / §2.3 predicates + id "
     "builtins / §2.9 reductions, §2.4 join + §2.5 aggregates, §2.2 "
     "sources + §2.7 procedures.",
     (168, 726), []),
    ("tpch",
     "Relational superset part 1: TPC-H-style queries over the star "
     "schema (q1/q5/q6 pricing family, z-order layout, events window "
     "aggregates, sketch stats) + the flagship query.",
     (726, 1010), []),
    ("docs",
     "Training-data pipeline workloads over the documents/embeddings "
     "tables: dedup family, similarity/ANN, text quality, multimodal.",
     (1010, 2028), []),
    ("streaming",
     "Structured Streaming workloads (beyond-reference mandate): staged "
     "event streams, windowed aggregates, sessionization, stream-stream "
     "joins, stateful close-out.",
     (2028, 2402), []),
    ("primitives",
     "Wider §2.9 primitive coverage (gsl stats, shape ops, codecs, "
     "expand) + the r8 classic-OLAP/linkage wave (skylines, PassJoin, "
     "entity resolution, SCD2, gap-fill, audit, attribution, funnels).",
     (2402, 4211),
     ["from ophidia_io_server_spark.workloads.docs import (  # noqa: F401\n"
      "    _EMB_BASE_CTE,\n    _SHINGLE_CTE,\n)"]),
    ("analytics",
     "Temporal joins (as-of, interval), retrieval + language models, "
     "BPE, graphs (PageRank/LPA/triangles), heavy hitters, rollup/cube, "
     "pivots, and the round-5/6 events analytics.",
     (4211, 5903),
     ["from ophidia_io_server_spark.workloads.docs import (  # noqa: F401\n"
      "    _redact_oracle_exprs,\n)"]),
    ("relational",
     "Round-6+ relational/statistics wave: the remaining TPC-H shapes "
     "(q2/q9/q11/q16/q20/q21), sketch family (HLL, quantile rollup, "
     "Count-Min join-size, equi-depth histogram), variable-length dedup, "
     "shard planning, streaming incremental rollups.",
     (5903, 7522),
     ["from ophidia_io_server_spark.workloads.docs import (  # noqa: F401\n"
      "    _JACCARD_ORACLE,\n)",
      "from ophidia_io_server_spark.workloads.streaming import (  # noqa: F401\n"
      "    _staged_events_dir,\n)"]),
    ("suites",
     "Suite composites + driver-gate slot curation, GATE_ORDER, and the "
     "computed registry composition (the 50-row gate window).",
     (7522, 8235),  # one past EOF — rng() is half-open
     ["import sys"]),
]

PKG.mkdir(exist_ok=True)

# --- base.py: original header (docstring + imports + registry machinery)
base_body = rng(1, 168)
(PKG / "base.py").write_text(base_body + "\n")

for mod, doc, (a, b), extra in MODULES:
    body = rng(a, b)
    hdr = f'"""{doc}\n\nCarved verbatim out of the original workload.py (r8 VERDICT #3);\nprovenance citations in the per-workload docstrings are unchanged.\n"""\n\n'
    imports = COMMON_IMPORTS + "\n" + "\n".join(extra) + ("\n" if extra else "") + BASE_IMPORT
    (PKG / f"{mod}.py").write_text(hdr + imports + "\n\n" + body + "\n")

(PKG / "__init__.py").write_text('''\
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
from ophidia_io_server_spark.workloads import suites  # noqa: F401,E402
from ophidia_io_server_spark.workloads.suites import (  # noqa: F401
    GATE_ORDER,
    ordered_workloads,
    registry_composition,
)
from ophidia_io_server_spark.workloads.tpch import flagship  # noqa: F401
''')

print("wrote", sorted(p.name for p in PKG.glob("*.py")))
