#!/usr/bin/env bash
# Full local validation: unit/property tests, DuckDB-oracle gate, benchmark.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== correctness gate (sf0.01, DuckDB oracle) =="
python scripts/check_correctness.py /root/testdata/sf0.01

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" python bench.py
