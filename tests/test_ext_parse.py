"""parse-ext port — TestExtParser.java semantics plus the failure arms
and the allowlist hardening.

The reference test writes "nutch rocks nutch rocks nutch rocks" to a
temp file and parses it alternately as
application/vnd.nutch.example.cat and .md5sum through the plugin's
dispatch script (parse-ext/command: case $1 in ... cat / md5sum),
asserting the cat text and the md5 prefix over 10 rounds
(TestExtParser.java:100-127). Mirrored here with the same dispatch
script shape executed through mapInPandas.
"""

from __future__ import annotations

import os
import stat

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.ext_parse import (
    ExtParserConfig,
    ext_parse,
)

EXPECTED_TEXT = "nutch rocks nutch rocks nutch rocks"
# echo -n "nutch rocks nutch rocks nutch rocks" | md5sum
EXPECTED_MD5 = "df46711a1a48caafc98b1c3b83aa1526"

CAT_TYPE = "application/vnd.nutch.example.cat"
MD5_TYPE = "application/vnd.nutch.example.md5sum"

DISPATCH = """#!/bin/bash
set -e
if [ $# -ne 1 ]; then
  echo Usage:$0 mimeType >&2
  exit 1
fi
case $1 in
"application/vnd.nutch.example.cat")
  cat
  ;;
"application/vnd.nutch.example.md5sum")
  md5sum
  ;;
*)
  echo "Can't parse mimeType $1" >&2
  exit 1
esac
"""


@pytest.fixture(scope="module")
def dispatch_script(tmp_path_factory):
    p = tmp_path_factory.mktemp("extparse") / "nutch-ext-command"
    p.write_text(DISPATCH)
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    return str(p)


def _config(dispatch_script):
    cfg = ExtParserConfig(allowed={"nutch-ext-command"})
    cfg.register(CAT_TYPE, dispatch_script, timeout=10)
    cfg.register(MD5_TYPE, dispatch_script, timeout=20)
    return cfg


def _segment(spark, rows):
    return spark.createDataFrame(
        rows, "url string, content binary, content_type string"
    )


def test_cat_and_md5sum_alternately(spark, dispatch_script):
    """TestExtParser.testIt: 10 alternating rounds of cat and md5sum —
    also a light stress test of the subprocess runner."""
    cfg = _config(dispatch_script)
    rows = []
    for i in range(10):
        rows.append((f"file:/t/{i}.cat", EXPECTED_TEXT.encode(), CAT_TYPE))
        rows.append((f"file:/t/{i}.md5", EXPECTED_TEXT.encode(), MD5_TYPE))
    out = {
        r["url"]: (r["status"], r["text"])
        for r in ext_parse(_segment(spark, rows), cfg).collect()
    }
    assert len(out) == 20
    for i in range(10):
        st, text = out[f"file:/t/{i}.cat"]
        assert st == "success" and text == EXPECTED_TEXT
        st, text = out[f"file:/t/{i}.md5"]
        assert st == "success" and text.startswith(EXPECTED_MD5)


def test_no_command_for_type(spark, dispatch_script):
    cfg = _config(dispatch_script)
    out = ext_parse(
        _segment(spark, [("u1", b"x", "text/unknown")]), cfg
    ).collect()[0]
    assert out["status"] == "failed"
    assert "No external command defined" in out["message"]
    assert out["text"] == ""


def test_truncated_content(spark, dispatch_script):
    """ExtParser.java:94-101 — Content-Length disagreeing with the byte
    count is FAILED_TRUNCATED before any exec."""
    cfg = _config(dispatch_script)
    df = spark.createDataFrame(
        [("u1", EXPECTED_TEXT.encode(), CAT_TYPE, 9999)],
        "url string, content binary, content_type string, content_length long",
    )
    out = ext_parse(df, cfg, length_col="content_length").collect()[0]
    assert out["status"] == "failed_truncated"
    assert "Content truncated at" in out["message"]


def test_nonzero_exit_carries_stderr(spark, dispatch_script):
    """An unknown type reaching the dispatch script (registered but not
    handled) exits 1 — the FAILED arm carries stderr."""
    cfg = ExtParserConfig(allowed={"nutch-ext-command"})
    cfg.register("text/unhandled", dispatch_script)
    out = ext_parse(
        _segment(spark, [("u1", b"x", "text/unhandled")]), cfg
    ).collect()[0]
    assert out["status"] == "failed"
    assert "Can't parse mimeType" in out["message"]


def test_allowlist_rejects_unlisted_and_metachars():
    cfg = ExtParserConfig()
    with pytest.raises(ValueError, match="allowlist"):
        cfg.register("text/x", "/bin/rm -rf")
    with pytest.raises(ValueError, match="metacharacters"):
        cfg.register("text/x", "cat foo; rm bar")
    with pytest.raises(ValueError, match="empty"):
        cfg.register("text/x", "   ")
    # allowlisted plain filter is fine
    cfg.register("text/x", "cat", append_type=False)
    assert cfg.lookup("text/x").command == "cat"


def test_plain_filter_without_append_type(spark):
    """append_type=False: cat/md5sum as pure stdin filters (no
    dispatch script), the deviation documented in ExtCommand."""
    cfg = ExtParserConfig()
    cfg.register(CAT_TYPE, "cat", append_type=False)
    cfg.register(MD5_TYPE, "md5sum", append_type=False)
    rows = [
        ("u1", EXPECTED_TEXT.encode(), CAT_TYPE),
        ("u2", EXPECTED_TEXT.encode(), MD5_TYPE),
    ]
    out = {r["url"]: r["text"] for r in ext_parse(_segment(spark, rows), cfg).collect()}
    assert out["u1"] == EXPECTED_TEXT
    assert out["u2"].startswith(EXPECTED_MD5)


def test_outlinks_compose(spark):
    """ExtParser's final step: OutlinkExtractor over the parsed text
    (ExtParser.java:131-137) — composes with text_outlinks."""
    from nutch_spark.operators.parse import text_outlinks

    cfg = ExtParserConfig()
    cfg.register("text/plain", "cat", append_type=False)
    body = b"see http://example.com/a and http://example.org/b for more"
    parsed = ext_parse(_segment(spark, [("u1", body, "text/plain")]), cfg)
    links = text_outlinks(parsed.filter(F.col("status") == "success"))
    got = [r["to_url"] for r in links.orderBy("pos").collect()]
    assert got == ["http://example.com/a", "http://example.org/b"]


def test_timeout_kills_runaway(spark, tmp_path):
    slow = tmp_path / "nutch-ext-command"
    slow.write_text("#!/bin/bash\nsleep 30\n")
    slow.chmod(slow.stat().st_mode | stat.S_IXUSR)
    cfg = ExtParserConfig(allowed={"nutch-ext-command"})
    cfg.register("text/slow", str(slow), timeout=1)
    out = ext_parse(_segment(spark, [("u1", b"x", "text/slow")]), cfg).collect()[0]
    assert out["status"] == "failed"
    assert "timed out" in out["message"]
