"""IndexerMapReduce add/delete action resolution, reference evaluation
order (IndexerMapReduce.java:299-340)."""

from nutch_spark.operators.indexer import index_actions
from nutch_spark.schema import (
    STATUS_DB_DUPLICATE,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_NOTMODIFIED,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_UNFETCHED,
)


def _run(spark, rows, parsed, **kw):
    db = spark.createDataFrame(rows, "url string, status int")
    pt = spark.createDataFrame([(u, "txt") for u in parsed], "url string, text string")
    return {
        r["url"]: (r["action"], r["reason"])
        for r in index_actions(db, pt, **kw).collect()
    }


def test_reference_evaluation_order(spark):
    rows = [
        ("u:gone", STATUS_DB_GONE),
        ("u:redir", STATUS_DB_REDIR_PERM),
        ("u:dup-parsed", STATUS_DB_DUPLICATE),
        ("u:dup-unparsed", STATUS_DB_DUPLICATE),
        ("u:ok", STATUS_DB_FETCHED),
        ("u:ok-unparsed", STATUS_DB_FETCHED),
        ("u:unfetched", STATUS_DB_UNFETCHED),
        ("u:notmod", STATUS_DB_NOTMODIFIED),
    ]
    parsed = ["u:dup-parsed", "u:ok", "u:unfetched", "u:notmod"]
    got = _run(spark, rows, parsed, delete=True, skip_notmodified=True)
    # gone/redirect delete even with no parse output
    assert got["u:gone"] == ("delete", "gone")
    assert got["u:redir"] == ("delete", "redirects")
    # the duplicate delete is only reached when fetch+parse exist
    assert got["u:dup-parsed"] == ("delete", "duplicates")
    assert "u:dup-unparsed" not in got
    assert got["u:ok"] == ("add", "indexed")
    # parse-less and unfetched rows emit nothing; notmodified skipped
    assert "u:ok-unparsed" not in got
    assert "u:unfetched" not in got
    assert "u:notmod" not in got


def test_delete_off_and_notmodified_indexing(spark):
    rows = [
        ("u:gone", STATUS_DB_GONE),
        ("u:dup", STATUS_DB_DUPLICATE),
        ("u:notmod", STATUS_DB_NOTMODIFIED),
    ]
    got = _run(
        spark, rows, ["u:gone", "u:dup", "u:notmod"],
        delete=False, skip_notmodified=False,
    )
    # indexer.delete=false: no deletes at all; notmodified indexes
    assert got == {"u:notmod": ("add", "indexed")}
