"""Select-pipeline clause semantics (reference quirks included)."""

import pytest

from ophidia_io_server_spark.operators.select import QueryExecError


def ids(df):
    return [r["id_dim"] for r in df.collect()]


def test_where_order(server):
    out = server.execute(
        "operation=select;from=frag_qty;field=id_dim;select_alias=id_dim;"
        "where=oph_is_in_subset(id_dim,1,5,50);order=id_dim"
    )
    assert ids(out) == [1, 6, 11, 16, 21, 26, 31, 36, 41, 46]


def test_limit_is_pre_projection_window(server, frag_qty):
    # limit=offset|n applies to the filtered input in id order
    out = server.execute(
        "operation=select;from=frag_qty;field=id_dim;select_alias=id_dim;"
        "where=id_dim<=20;limit=5|3;order=id_dim"
    )
    all_ids = sorted(
        r["id_dim"] for r in frag_qty.filter("id_dim <= 20").select("id_dim").collect()
    )
    assert ids(out) == all_ids[5:8]


def test_limit_zero(server):
    out = server.execute(
        "operation=select;from=frag_qty;field=id_dim;select_alias=id_dim;limit=0"
    )
    assert out.count() == 0


def test_group_first_of_group_rule(server):
    out = server.execute(
        "operation=select;from=frag_qty;"
        "field=oph_id(id_dim,10)|id_dim;select_alias=grp|first_id;"
        "where=id_dim<=30&id_dim>=1;group=oph_id(id_dim,10);order=grp"
    )
    rows = {r["grp"]: r["first_id"] for r in out.collect()}
    # first row of each group in id order (WHERE keeps ids 1..30)
    assert rows[1] == 1 and rows[2] == 11 and rows[3] == 21


def test_multi_table_requires_where(server, frag_qty):
    server.catalog.put("frag_b", frag_qty, cache=False)
    with pytest.raises(QueryExecError):
        server.execute("operation=select;from=frag_qty|frag_b;field=id_dim")


def test_join_alignment(server, frag_qty):
    server.catalog.put("frag_c", frag_qty, cache=False)
    out = server.execute(
        "operation=select;from=frag_qty|frag_c;from_alias=a|b;"
        "field=id_dim|oph_sub_array(a.measure,b.measure);"
        "select_alias=id_dim|diff;where=id_dim<=10;order=id_dim"
    )
    for r in out.collect():
        assert all(v == 0 for v in r["diff"])


def test_params_in_where(server):
    out = server.execute(
        "operation=select;from=frag_qty;field=id_dim;select_alias=id_dim;"
        "where=id_dim<=?;order=id_dim",
        params={1: 3},
    )
    assert ids(out) == [r for r in ids(out) if r <= 3]


def test_projection_boolean_cast(server):
    out = server.execute(
        "operation=select;from=frag_qty;field=id_dim=1;select_alias=is_one;"
        "where=id_dim<=2;order=is_one"
    )
    vals = sorted(r["is_one"] for r in out.collect())
    assert vals == [0, 0, 1]  # ids 0, 1, 2 → only id 1 matches


def test_validate_dense_rejects_gappy_ids(spark):
    from ophidia_io_server_spark.operators import IOServer
    from ophidia_io_server_spark.operators.select import QueryExecError
    import pytest as _pytest

    srv = IOServer(spark, validate_dense=True)
    dense = spark.createDataFrame([(i, [1.0]) for i in range(1, 6)],
                                  "id_dim long, measure array<double>")
    gappy = spark.createDataFrame([(i, [1.0]) for i in (1, 2, 4, 7)],
                                  "id_dim long, measure array<double>")
    srv.catalog.put("d1", dense, cache=False)
    srv.catalog.put("d2", dense, cache=False)
    srv.catalog.put("g1", gappy, cache=False)
    # dense fragments join fine
    assert srv.execute(
        "operation=select;from=d1|d2;from_alias=a|b;"
        "field=id_dim|oph_sum_array(a.measure,b.measure);"
        "select_alias=id_dim|s;where=id_dim>=1").count() == 5
    # gappy ids rejected (reference blocks.c:859-876)
    with _pytest.raises(QueryExecError, match="not dense"):
        srv.execute(
            "operation=select;from=d1|g1;from_alias=a|b;"
            "field=id_dim|oph_sum_array(a.measure,b.measure);"
            "select_alias=id_dim|s;where=id_dim>=1").count()


def test_everything_query(spark):
    """Join two fragments, WHERE with binds + id built-ins, inverted LIMIT
    window, GROUP BY id-derived key, aggregate + first-of-group, ORDER."""
    from ophidia_io_server_spark.operators import IOServer
    from ophidia_io_server_spark.sources.random_import import random_fragment

    srv = IOServer(spark)
    srv.catalog.put("ea", random_fragment(spark, 200, 4, seed=1), cache=False)
    srv.catalog.put("eb", random_fragment(spark, 200, 4, seed=2), cache=False)
    out = srv.execute(
        "operation=select;from=ea|eb;from_alias=a|b;"
        "field=oph_id(id_dim,?)"
        "|oph_reduce(oph_aggregate_operator(oph_mul_array(a.measure,b.measure),'oph_sum'),'sum')"
        ";select_alias=grp|s;"
        "where=oph_is_in_subset(id_dim,1,2,?)&id_dim>=?;"
        "group=oph_id(id_dim,?);order=grp;limit=5|40",
        params={1: 10, 2: 160, 3: 11, 4: 10},
    ).collect()
    # ids 11..159 odd → limit window rows 6..45 of that ordered set
    assert [r.grp for r in out] == sorted({(i - 1) // 10 + 1 for i in range(21, 100, 2)})
    assert all(r.s > 0 for r in out)


def test_info_pseudo_tables(spark):
    """@info_system / @info_system_table — keywords the reference declares
    but never implements (language.h:110-114); working superset here."""
    from ophidia_io_server_spark.operators import IOServer
    from ophidia_io_server_spark.sources.random_import import random_fragment

    srv = IOServer(spark)
    srv.catalog.put("inv1", random_fragment(spark, 5, 2), cache=False)
    info = srv.execute("operation=select;from=@info_system;"
                       "field=spark_version|parallelism;"
                       "select_alias=v|p").collect()
    assert len(info) == 1 and info[0].p > 0
    inv = srv.execute("operation=select;from=@info_system_table;"
                      "field=db|frag|device;select_alias=db|frag|device").collect()
    assert ("default", "inv1", "MEMORY") in {(r.db, r.frag, r.device) for r in inv}
