"""Physical-plan shape guards: the scale-critical plan properties asserted
structurally so a refactor that silently loses pushdown / top-k / broadcast
fails tests, not just the benchmark."""

import pytest

from ophidia_io_server_spark.workload import WORKLOADS

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    df = WORKLOADS[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended"))


def test_select_reduce_pushdown_and_topk(spark):
    p = plan_of(spark, "select_reduce")
    assert "PushedFilters" in p and "l_orderkey" in p.split("PushedFilters")[1][:200]
    assert "TakeOrderedAndProject" in p  # inverted LIMIT compiles to top-k
    assert "CartesianProduct" not in p


def test_joins_never_cartesian(spark):
    for name in ("join_mul_array", "join_three_way", "tpch_q5_local_supplier"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_dedup_pipelines_no_cartesian(spark):
    for name in ("dedup_ngram_jaccard", "dedup_minhash_pairs", "dedup_simhash_pairs"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name


def test_tpch_q1_partial_aggregation(spark):
    p = plan_of(spark, "tpch_q1_pricing")
    assert "partial_" in p  # map-side combine before the exchange
    assert "PushedFilters" in p  # shipdate predicate reaches the scan
