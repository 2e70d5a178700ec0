"""scoring-depth plugin (DepthScoringFilter) — depth-limited crawl."""

from dataclasses import replace

from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.operators.depth import (
    DEPTH_KEY,
    MAX_DEPTH_KEY,
    depth_gate_outlinks,
    depth_sort_value,
    inject_depth_meta,
    patch_new_url_depth,
)
from nutch_spark.operators.updatedb import updatedb

CFG = NutchConfig(scoring_depth_enabled=True, scoring_depth_max=5)

DATUM_COLS = (
    "url string, status int, fetch_time long, retries int, fetch_interval int,"
    " score float, signature string, modified_time long,"
    " metadata map<string,string>, gen_time long, repr_url string"
)


def _datum(url, status=1, score=1.0, meta=None, **kw):
    return (
        url, status, kw.get("fetch_time", 1000), 0, 2592000, score,
        None, 0, meta or {}, None, None,
    )


def _link(url, from_url, score=0.25, meta=None):
    row = list(_datum(url, status=0x43, score=score, meta=meta))
    return tuple(row) + (None, from_url)


def test_inject_depth_meta_defaults_and_seed_override(spark):
    db = spark.createDataFrame(
        [
            _datum("http://a.com/", meta={}),
            _datum("http://b.com/", meta={MAX_DEPTH_KEY: "2"}),
        ],
        DATUM_COLS,
    )
    out = {r["url"]: r["metadata"] for r in inject_depth_meta(db, CFG).collect()}
    assert out["http://a.com/"][DEPTH_KEY] == "1"
    assert out["http://a.com/"][MAX_DEPTH_KEY] == "5"
    assert out["http://b.com/"][MAX_DEPTH_KEY] == "2"


def test_inject_depth_override_pattern(spark):
    cfg = replace(CFG, scoring_depth_override_pattern=r"\bspecial\b",
                  scoring_depth_max_override=9)
    db = spark.createDataFrame(
        [_datum("http://x.com/special/p"), _datum("http://x.com/plain")],
        DATUM_COLS,
    )
    out = {r["url"]: r["metadata"] for r in inject_depth_meta(db, cfg).collect()}
    assert out["http://x.com/special/p"][MAX_DEPTH_KEY] == "9"
    assert out["http://x.com/plain"][MAX_DEPTH_KEY] == "5"


def test_gate_drops_at_limit_and_stamps_children(spark):
    link_cols = DATUM_COLS + ", anchor string, from_url string"
    parents = spark.createDataFrame(
        [
            _datum("http://p1/", meta={DEPTH_KEY: "2", MAX_DEPTH_KEY: "5"}),
            _datum("http://p2/", meta={DEPTH_KEY: "5", MAX_DEPTH_KEY: "5"}),
        ],
        DATUM_COLS,
    )
    seg = spark.createDataFrame(
        [
            _link("http://c1/", "http://p1/"),
            _link("http://c2/", "http://p2/"),   # parent at limit -> dropped
        ],
        link_cols,
    )
    out = depth_gate_outlinks(seg, parents, CFG).collect()
    urls = {r["url"] for r in out}
    assert urls == {"http://c1/"}
    (c1,) = out
    assert c1["metadata"][DEPTH_KEY] == "3"
    assert c1["metadata"][MAX_DEPTH_KEY] == "5"


def test_patch_new_url_min_depth_and_e2e_updatedb(spark):
    """Two parents at different depths link the same new URL: its depth
    is min(parent)+1; existing URLs keep their depth untouched."""
    link_cols = DATUM_COLS + ", anchor string, from_url string"
    old = spark.createDataFrame(
        [
            _datum("http://p1/", status=2, meta={DEPTH_KEY: "1", MAX_DEPTH_KEY: "5"}),
            _datum("http://p2/", status=2, meta={DEPTH_KEY: "3", MAX_DEPTH_KEY: "5"}),
        ],
        DATUM_COLS,
    )
    seg = spark.createDataFrame(
        [
            _link("http://new/", "http://p1/", score=0.5),
            _link("http://new/", "http://p2/", score=0.25),
        ],
        link_cols,
    )
    gated = depth_gate_outlinks(seg, old, CFG)
    seg_rows = gated.drop("anchor", "from_url")
    merged = updatedb(old, seg_rows, CFG, 9_000)
    patched = {r["url"]: r for r in
               patch_new_url_depth(merged, old, gated, CFG).collect()}
    assert patched["http://new/"]["metadata"][DEPTH_KEY] == "2"  # min(1,3)+1
    assert patched["http://new/"]["metadata"][MAX_DEPTH_KEY] == "5"
    assert abs(patched["http://new/"]["score"] - 0.75) < 1e-6
    assert patched["http://p1/"]["metadata"][DEPTH_KEY] == "1"  # untouched
    assert patched["http://p2/"]["metadata"][DEPTH_KEY] == "3"


def test_depth_sort_value_boost(spark):
    df = spark.createDataFrame(
        [
            _datum("http://shallow/", score=1.0,
                   meta={DEPTH_KEY: "1", MAX_DEPTH_KEY: "5"}),
            _datum("http://deep/", score=1.0,
                   meta={DEPTH_KEY: "5", MAX_DEPTH_KEY: "5"}),
            _datum("http://nometa/", score=1.0, meta={}),
        ],
        DATUM_COLS,
    )
    out = {
        r["url"]: r["boost"]
        for r in df.select(
            "url",
            depth_sort_value(F.col("score"), F.col("metadata"), CFG).alias("boost"),
        ).collect()
    }
    assert out["http://shallow/"] == 5.0  # 1 * (1 + 5-1)
    assert out["http://deep/"] == 1.0     # 1 * (1 + 0)
    assert out["http://nometa/"] == 1.0   # penalized: depth := maxdepth


def test_generate_sort_uses_depth_boost(spark):
    from nutch_spark.operators.generate import select_eligible

    db = spark.createDataFrame(
        [
            _datum("http://shallow/", score=1.0, fetch_time=0,
                   meta={DEPTH_KEY: "1", MAX_DEPTH_KEY: "5"}),
            _datum("http://deep/", score=2.0, fetch_time=0,
                   meta={DEPTH_KEY: "5", MAX_DEPTH_KEY: "5"}),
        ],
        DATUM_COLS,
    )
    out = {r["url"]: r["sort"] for r in
           select_eligible(db, CFG, 10_000).collect()}
    # depth boost outranks raw score: 1*(1+4)=5 > 2*(1+0)=2
    assert out["http://shallow/"] == 5.0 and out["http://deep/"] == 2.0
