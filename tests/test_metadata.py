"""Metadata / SpellCheckedMetadata parity — vectors ported from
``src/test/org/apache/nutch/metadata/TestSpellCheckedMetadata.java``
(and the Metadata surface it exercises), plus JVM-column-twin
equivalence for the at-scale header canonicalization path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutch_spark.data.metadata import (
    Metadata,
    SpellCheckedMetadata,
    get_normalized_name,
    spell_check_metadata_keys,
    spell_checked_header,
)


# --- TestSpellCheckedMetadata.testGetNormalizedName (:41-56) ---------------
@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("Content-Type", "Content-Type"),
        ("ContentType", "Content-Type"),
        ("Content-type", "Content-Type"),
        ("contenttype", "Content-Type"),
        ("contentype", "Content-Type"),
        ("contntype", "Content-Type"),
        # no-match fallthroughs: unchanged
        ("Accept-Ranges", "Accept-Ranges"),
        ("ETag", "ETag"),
        ("X-Custom-Header", "X-Custom-Header"),
        # short names never fuzzy-match (threshold 0)
        ("ae", "ae"),
        # exact vocabulary round-trips
        ("last-modified", "Last-Modified"),
        ("USER-AGENT", "User-Agent"),
        ("Content-MD5", "Content-MD5"),
    ],
)
def test_get_normalized_name(raw, expected):
    assert get_normalized_name(raw) == expected


# --- testAdd (:59-84) ------------------------------------------------------
def test_add():
    meta = SpellCheckedMetadata()
    assert meta.get_values("contentype") == []
    meta.add("contentype", "value1")
    assert meta.get_values("contentype") == ["value1"]
    meta.add("Content-Type", "value2")
    assert meta.get_values("contentype") == ["value1", "value2"]
    meta.add("ContentType", "value1")
    assert meta.get_values("Content-Type") == ["value1", "value2", "value1"]


# --- testSet (:87-110) -----------------------------------------------------
def test_set():
    meta = SpellCheckedMetadata()
    meta.set("contentype", "value1")
    assert meta.get_values("contentype") == ["value1"]
    meta.set("Content-Type", "value2")
    assert meta.get_values("contentype") == ["value2"]
    meta.set("contenttype", "new value 1")
    meta.add("contenttype", "new value 2")
    assert meta.get_values("contentype") == ["new value 1", "new value 2"]


# --- testSetProperties (:113-140) ------------------------------------------
def test_set_all():
    meta = SpellCheckedMetadata()
    meta.set_all({})
    assert meta.size() == 0
    meta.set_all({"name-one": "value1.1"})
    assert meta.size() == 1
    assert meta.get_values("name-one") == ["value1.1"]
    meta.set_all({"name-one": "value1.1", "name-two": "value2.1"})
    assert meta.size() == 2
    assert meta.get_values("name-one") == ["value1.1"]
    assert meta.get_values("name-two") == ["value2.1"]


# --- testGet (:143-153) ----------------------------------------------------
def test_get_first_value():
    meta = SpellCheckedMetadata()
    assert meta.get("a-name") is None
    meta.add("a-name", "value-1")
    assert meta.get("a-name") == "value-1"
    meta.add("a-name", "value-2")
    assert meta.get("a-name") == "value-1"


# --- testIsMultiValued (:156-163) ------------------------------------------
def test_is_multi_valued():
    meta = SpellCheckedMetadata()
    assert not meta.is_multi_valued("key")
    meta.add("key", "value1")
    assert not meta.is_multi_valued("key")
    meta.add("key", "value2")
    assert meta.is_multi_valued("key")


# --- testNames (:166-179) --------------------------------------------------
def test_names():
    meta = SpellCheckedMetadata()
    assert meta.names() == []
    meta.add("name-one", "value")
    assert meta.names() == ["name-one"]
    meta.add("name-two", "value")
    assert len(meta.names()) == 2


# --- testRemove (:182-201) -------------------------------------------------
def test_remove():
    meta = SpellCheckedMetadata()
    meta.remove("name-one")
    assert meta.size() == 0
    meta.add("name-one", "value-1.1")
    meta.add("name-one", "value-1.2")
    meta.add("name-two", "value-2.2")
    assert meta.size() == 2
    meta.remove("name-one")
    assert meta.size() == 1
    assert meta.get("name-one") is None
    assert meta.get("name-two") is not None
    meta.remove("name-two")
    assert meta.size() == 0


# --- testObject (:204-227) -------------------------------------------------
def test_equality():
    meta1, meta2 = SpellCheckedMetadata(), SpellCheckedMetadata()
    assert meta1 != "String"
    assert meta1 == meta2
    meta1.add("name-one", "value-1.1")
    assert meta1 != meta2
    meta2.add("name-one", "value-1.1")
    assert meta1 == meta2
    meta1.add("name-two", "value-2.1")
    meta2.add("name-two", "value-2.x")
    assert meta1 != meta2


# --- spell-checked add lands on the canonical constant (testWritable tail) -
def test_spellchecked_lands_on_constant():
    meta = SpellCheckedMetadata()
    meta.add("Contenttype", "text/html")
    assert meta.get(Metadata.CONTENT_TYPE) == "text/html"


# --- plain Metadata does NOT spell-check -----------------------------------
def test_plain_metadata_is_literal():
    meta = Metadata()
    meta.add("contentype", "text/html")
    assert meta.get("Content-Type") is None
    assert meta.get("contentype") == "text/html"


# --- JVM column twin equivalence -------------------------------------------
HEADER_SAMPLES = [
    "Content-Type", "ContentType", "Content-type", "contenttype",
    "contentype", "contntype", "CoNtEntType", "ConTnTtYpe",
    "Accept-Ranges", "ETag", "Server", "Date", "Connection",
    "last-modified", "Lastmodified", "USER-AGENT", "useragent",
    "Content-MD5", "contentmd5", "Transfer-Encoding", "transferencoding",
    "If-Modified-Since", "ifmodifiedsince", "X-Forwarded-For",
    "content-length", "contentlenght", "Location", "location",
    "Content-Location", "contentlocation", "ae", "",
]


def test_column_twin_matches_driver(spark):
    df = spark.createDataFrame([(h,) for h in HEADER_SAMPLES], ["name"])
    got = {
        r["name"]: r["checked"]
        for r in df.withColumn("checked", spell_checked_header(F.col("name"))).collect()
    }
    for h in HEADER_SAMPLES:
        assert got[h] == get_normalized_name(h), h


def test_column_twin_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "name string")
    [row] = df.select(spell_checked_header(F.col("name")).alias("c")).collect()
    assert row["c"] is None


def test_spell_check_metadata_keys(spark):
    df = spark.createDataFrame(
        [({"contentype": "text/html", "ETag": '"abc"'},)], "meta map<string,string>"
    )
    [row] = df.select(spell_check_metadata_keys(F.col("meta")).alias("m")).collect()
    assert row["m"] == {"Content-Type": "text/html", "ETag": '"abc"'}


def test_spell_check_metadata_keys_first_wins(spark):
    # two raw keys canonicalize to Content-Type; entry order decides
    df = spark.createDataFrame(
        [([("contenttype", "first"), ("Content-Type", "second")],)],
        "entries array<struct<key:string,value:string>>",
    ).select(F.map_from_entries("entries").alias("meta"))
    [row] = df.select(spell_check_metadata_keys(F.col("meta")).alias("m")).collect()
    assert row["m"] == {"Content-Type": "first"}
