from ophidia_io_server_spark.dialect.parser import (
    QueryParseError,
    parse_limit,
    parse_query,
    split_multivalue,
)
import pytest


def test_basic_clauses():
    q = parse_query("operation=select;from=f1;field=id_dim|measure;where=id_dim>5")
    assert q["operation"] == "select"
    assert q["from"] == ["f1"]
    assert q["field"] == ["id_dim", "measure"]
    assert q["where"] == "id_dim>5"


def test_multivalue_respects_parens_and_quotes():
    assert split_multivalue("a|f(x|y)|'p|q'") == ["a", "f(x|y)", "'p|q'"]


def test_anonymous_binds_numbered_across_clauses():
    q = parse_query("operation=insert;frag_name=f;value=?,?;where=x=?")
    assert q["value"] == "?1,?2"
    assert q["where"] == "x=?3"


def test_legacy_where_rejected():
    with pytest.raises(QueryParseError):
        parse_query("operation=select;where_left=a")


def test_missing_operation():
    with pytest.raises(QueryParseError):
        parse_query("from=f;field=x")


def test_limit_forms():
    assert parse_limit("10") == (0, 10)
    assert parse_limit("5|10") == (5, 10)
    assert parse_limit("-3") == (0, 0)
    with pytest.raises(QueryParseError):
        parse_limit("a|b")


def test_parse_limit_negative_clamps():
    from ophidia_io_server_spark.dialect.parser import parse_limit

    # reference blocks.c:699-745: negative values clamp to 0
    assert parse_limit("-5") == (0, 0)
    assert parse_limit("3|-2") == (3, 0)
    assert parse_limit("-1|7") == (0, 7)
    assert parse_limit("2|9") == (2, 9)
