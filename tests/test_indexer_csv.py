"""indexer-csv / indexer-dummy / index-jexl-filter."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.indexer import (
    csv_header,
    csv_render,
    dummy_render,
    jexl_index_filter,
)


def _render(spark, rows, schema, fields, **kw):
    df = spark.createDataFrame(rows, schema)
    return [
        r["csv"] for r in csv_render(df, fields, **kw).select("csv").collect()
    ]


def test_scalar_quoting(spark):
    out = _render(
        spark,
        [("plain", 'with"quote', "with,comma", "with\nnewline", None)],
        "a string, b string, c string, d string, e string",
        ["a", "b", "c", "d", "e"],
    )
    assert out == ['plain,"with""quote","with,comma","with\nnewline",']


def test_multivalue_always_quoted(spark):
    out = _render(
        spark,
        [(["x", 'q"v'], ["single"], [], None)],
        "m array<string>, s array<string>, e array<string>, n array<string>",
        ["m", "s", "e", "n"],
    )
    # multi quoted with escaped inner quote; single-element takes the
    # scalar path (unquoted when clean); empty/null render empty
    assert out == ['"x|q""v",single,,']


def test_clip_and_value_cap(spark):
    out = _render(
        spark,
        [("abcdefgh", ["v1", "v2", "v3"])],
        "long string, vals array<string>",
        ["long", "vals"],
        max_field_length=4,
        max_field_values=2,
    )
    assert out == ['abcd,"v1|v2"']


def test_header_and_dummy(spark):
    assert csv_header(["id", "title"], "\t") == "id\ttitle"
    df = spark.createDataFrame([("u1",), ("u2",)], "url string")
    lines = [r["line"] for r in dummy_render(df).collect()]
    assert lines == ["add\tu1", "add\tu2"]


def test_jexl_gate(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.1), (3, None)], "status int, score double"
    )
    kept = jexl_index_filter(
        df, "score > 0.5 && (status == 'db_unfetched' || status == 'db_gone')"
    ).collect()
    assert [r["status"] for r in kept] == [1]  # null expr drops the row
    with pytest.raises(ValueError):
        jexl_index_filter(df, None)
    # the earlier T14 SQL substitution stays available behind dialect="sql"
    kept = jexl_index_filter(df, "status < 3 AND score > 0.5", dialect="sql")
    assert [r["status"] for r in kept.collect()] == [1]
