"""DmozParser: RDF seed extraction, adult/topic filters, and the
Hadoop md5 quarter-digest subset sampler (tools/DmozParser.java)."""

import hashlib
import struct

from pyspark.sql import functions as F

from nutch_spark.operators.dmoz import md5_quarter_digest, parse_dmoz

RDF = """<RDF>
<Topic r:id="Top/Arts/Music">
<ExternalPage about="http://a.example.com/x">
<d:Title>A &amp; X</d:Title><d:Description>about x</d:Description>
</ExternalPage>
<ExternalPage about="http://b.example.com/y">
<d:Title>B</d:Title><d:Description>about y</d:Description>
</ExternalPage></Topic>
<Topic r:id="Top/Adult/Stuff">
<ExternalPage about="http://nope.example.com/z">
<d:Title>Z</d:Title><d:Description>no</d:Description>
</ExternalPage></Topic>
<Topic r:id="Top/Science/Bio">
<ExternalPage about="http://c.example.com/w">
<d:Title>C</d:Title><d:Description>about w</d:Description>
</ExternalPage></Topic>
</RDF>"""


def _parse(spark, **kw):
    df = spark.createDataFrame([(RDF,)], "content string")
    return {r["url"]: r for r in parse_dmoz(df, **kw).collect()}


def test_sections_pages_and_adult_filter(spark):
    got = _parse(spark)
    assert set(got) == {
        "http://a.example.com/x",
        "http://b.example.com/y",
        "http://c.example.com/w",
    }
    a = got["http://a.example.com/x"]
    assert a["topic"] == "Top/Arts/Music"
    # entities decode like the reference's SAX reader hands them over
    assert a["title"] == "A & X" and a["description"] == "about x"
    assert _parse(spark, include_adult=True).keys() >= {
        "http://nope.example.com/z"
    }


def test_topic_pattern_full_match(spark):
    got = _parse(spark, topic_pattern="Top/Arts/.*")
    assert set(got) == {"http://a.example.com/x", "http://b.example.com/y"}
    # Pattern.matches semantics: a prefix-only pattern matches nothing
    assert _parse(spark, topic_pattern="Top/Arts") == {}


def test_quarter_digest_matches_hadoop(spark):
    urls = ["http://a.example.com/x", "http://b.example.com/y", "u", ""]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["qd"]
        for r in df.select(
            "url", md5_quarter_digest(F.col("url")).alias("qd")
        ).collect()
    }
    for u in urls:
        # Hadoop MD5Hash.hashCode = signed big-endian first 4 digest bytes
        expect = struct.unpack(
            ">i", hashlib.md5(u.encode()).digest()[:4]
        )[0]
        assert got[u] == expect, u


def test_subset_sampler(spark):
    all_pages = _parse(spark)
    kept = _parse(spark, subset_denom=2, skew=7)
    assert set(kept) <= set(all_pages)
    for u in all_pages:
        qd = struct.unpack(">i", hashlib.md5(u.encode()).digest()[:4])[0]
        assert (u in kept) == (abs(qd ^ 7) % 2 == 0)
