"""urlmeta plugin — tag propagation to outlinks and new URLs."""

from nutch_spark.config import NutchConfig
from nutch_spark.operators.updatedb import updatedb
from nutch_spark.operators.urlmeta import patch_new_url_meta, propagate_url_meta

CFG = NutchConfig()

DATUM_COLS = (
    "url string, status int, fetch_time long, retries int, fetch_interval int,"
    " score float, signature string, modified_time long,"
    " metadata map<string,string>, gen_time long, repr_url string"
)
LINK_COLS = DATUM_COLS + ", anchor string, from_url string"


def _datum(url, status=2, score=1.0, meta=None):
    return (url, status, 1000, 0, 2592000, score, None, 0, meta or {}, None, None)


def _link(url, from_url, score=0.25, meta=None):
    return tuple(_datum(url, status=0x43, score=score, meta=meta)) + (None, from_url)


def test_propagate_stamps_configured_keys_only(spark):
    parents = spark.createDataFrame(
        [_datum("http://p/", meta={"campaign": "c1", "other": "x"})], DATUM_COLS
    )
    seg = spark.createDataFrame(
        [_link("http://c/", "http://p/", meta={"campaign": "old", "keep": "y"})],
        LINK_COLS,
    )
    (out,) = propagate_url_meta(seg, parents, ["campaign", "license"]).collect()
    assert out["metadata"]["campaign"] == "c1"  # parent overwrites
    assert out["metadata"]["keep"] == "y"       # untouched
    assert "other" not in out["metadata"]       # not a configured tag
    assert "license" not in out["metadata"]     # absent on parent: not stamped


def test_patch_new_urls_take_min_tag_through_updatedb(spark):
    old = spark.createDataFrame(
        [
            _datum("http://p1/", meta={"campaign": "beta"}),
            _datum("http://p2/", meta={"campaign": "alpha"}),
        ],
        DATUM_COLS,
    )
    seg = spark.createDataFrame(
        [
            _link("http://new/", "http://p1/", score=0.5),
            _link("http://new/", "http://p2/", score=0.25),
        ],
        LINK_COLS,
    )
    stamped = propagate_url_meta(seg, old, ["campaign"])
    merged = updatedb(old, stamped.drop("anchor", "from_url"), CFG, 9_000)
    out = {r["url"]: r for r in
           patch_new_url_meta(merged, old, stamped, ["campaign"]).collect()}
    assert out["http://new/"]["metadata"]["campaign"] == "alpha"  # min value
    assert out["http://p1/"]["metadata"]["campaign"] == "beta"    # untouched


def test_propagate_keeps_link_value_when_parent_lacks_key(spark):
    """A configured key already on the link row survives when the
    parent's metadata map is non-null but has no entry for it (the
    strip-then-restamp must only strip keys the parent provides)."""
    parents = spark.createDataFrame(
        [_datum("http://p/", meta={"campaign": "c1"})], DATUM_COLS
    )
    seg = spark.createDataFrame(
        [_link("http://c/", "http://p/",
               meta={"campaign": "old", "license": "mit"})],
        LINK_COLS,
    )
    (out,) = propagate_url_meta(seg, parents, ["campaign", "license"]).collect()
    assert out["metadata"]["campaign"] == "c1"   # parent wins where present
    assert out["metadata"]["license"] == "mit"   # parent lacks it: left as-is
