"""End-to-end demo: every major surface in one run.

    python scripts/demo.py

1. random_import + NetCDF-style synthetic import into the fragment store
2. dialect queries (WHERE built-ins, primitives, GROUP BY, join, LIMIT)
3. stored procedures (oph_subset / oph_size / oph_export)
4. catalog persistence snapshot + restore
5. the TCP server façade queried over a real socket
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from ophidia_io_server_spark import get_spark
    from ophidia_io_server_spark.catalog import Catalog
    from ophidia_io_server_spark.operators.engine import IOServer
    from ophidia_io_server_spark.server import QueryClient, QueryServer

    spark = get_spark(app_name="ophidia-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    srv = IOServer(spark)

    print("== 1. imports ==")
    srv.execute("operation=random_import;frag_name=rnd;nrows=1000;array_len=12;"
                "algorithm=temperatures")
    srv.execute("operation=file_import;frag_name=cube;"
                "src_path=synthetic://demo?dims=time:16,lat:12,lon:10;measure=m;"
                "dim=time|lat|lon;dim_type=0|1|1;dim_start=3|1|1;dim_end=14|12|10")
    print("fragments:", srv.catalog.list_fragments())

    print("\n== 2. dialect queries ==")
    srv.execute(
        "operation=select;from=rnd;"
        "field=id_dim|oph_reduce(measure,'avg')|oph_gsl_quantile(measure,0.5);"
        "select_alias=id_dim|mean_t|median_t;"
        "where=oph_is_in_subset(id_dim,1,3,999);order=id_dim;limit=5|5"
    ).show()
    srv.execute(
        "operation=select;from=cube;"
        "field=oph_id(id_dim,12)|oph_reduce(oph_aggregate_operator(measure,'oph_max'),'max');"
        "select_alias=lat_band|max_val;group=oph_id(id_dim,12);order=lat_band;limit=60"
    ).show(5)

    print("== 3. procedures ==")
    srv.execute("operation=function;function=oph_subset;"
                "arg='cube'|'1'|'oph_mul_scalar(measure,0.5)'|'cube_half'"
                "|'oph_is_in_subset(id_dim,1,2,120)'")
    srv.execute("operation=function;function=oph_size;arg='cube_half'").show()

    print("== 4. persistence ==")
    with tempfile.TemporaryDirectory(prefix="ophidia_demo_cat_") as root:
        v = srv.catalog.persist_versioned(root)
        restored = Catalog.restore_versioned(spark, root)
        print(f"snapshot v{v} restored:", restored.list_fragments())

    print("\n== 5. wire protocol ==")
    qs = QueryServer(spark)
    qs.serve_background()
    cli = QueryClient(*qs.address)
    cli.execute("operation=random_import;frag_name=net;nrows=20;array_len=3")
    nfields, rows = cli.execute(
        "operation=select;from=net;field=id_dim|oph_reduce(measure,'sum');"
        "select_alias=id_dim|s;where=id_dim<=?;order=id_dim", params={1: 5})
    print(f"socket result: {nfields} cols, rows={rows}")
    cli.close()
    qs.shutdown()

    print("\n== 6. training-data curation ==")
    from pyspark.sql import functions as F

    from ophidia_io_server_spark.pipeline.recipe import curate_corpus
    from ophidia_io_server_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    res = curate_corpus(docs, eval_pred=F.col("doc_id") % 89 == 0,
                        rule_filters="gopher",
                        gopher_kwargs={"min_stop_hits": 0, "min_words": 30},
                        report=True)
    print("funnel:", res.funnel)
    print("splits:", {r["split"]: r["n"] for r in
                      res.docs.groupBy("split").agg(F.count("*").alias("n"))
                      .collect()})

    print("\n== 7. quantized ANN ==")
    from ophidia_io_server_spark.pipeline.pq import ivfpq_topk, train_ivfpq

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    C, B = train_ivfpq(emb, nlist=8, m=8, ncent=16, sample=1000, iters=5)
    top = ivfpq_topk(emb, F.col("vec_id") < 3, C, B, k=3, nprobe=2)
    for r in top.orderBy("query_id", "rank").collect():
        print(f"  q{r['query_id']} #{r['rank']}: vec {r['neighbor_id']} "
              f"(adc {r['approx_dist']:.3f})")

    print("\n== 8. temporal joins, retrieval, PageRank ==")
    from ophidia_io_server_spark.operators.graph import pagerank
    from ophidia_io_server_spark.operators.temporal import asof_join
    from ophidia_io_server_spark.pipeline.retrieval import bm25_topk

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts"))
    attributed = asof_join(p, c, on="user_id", ts_col="ts",
                           right_ts_col="cts", seq_col="cid")
    n_attr = attributed.where(F.col("r_cts").isNotNull()).count()
    print(f"as-of join: {n_attr}/{attributed.count()} purchases have a prior click")

    hits = bm25_topk(docs, ["hash", "merge"], k=3).collect()
    print("bm25 top-3:", [(r["doc_id"], r["score"]) for r in hits])

    from pyspark.sql import Window
    wdw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(wdw).alias("dst"))
             .where(F.col("dst").isNotNull())
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))
    ranks = pagerank(edges, iters=8, weight_col="w")
    print("event-type pagerank:",
          {r["node"]: round(r["rank"], 4) for r in ranks.collect()})
    print("\ndemo complete")


if __name__ == "__main__":
    main()
