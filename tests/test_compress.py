"""GZIPUtils / DeflateUtils parity — the zip/unzip round-trips,
best-effort truncation recovery (prefix property at every truncation
length), and output size limits from ``TestGZIPUtils.java``, plus the
Content-Encoding column dispatch."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from nutch_spark.data.compress import (
    decode_content_cond,
    deflate,
    inflate,
    inflate_best_effort,
    unzip,
    unzip_best_effort,
    zip_bytes,
)

# TestGZIPUtils.java:28-35 — a short highly-compressible string and a
# 12x repeat; the third fixture is a page-sized markup blob (the
# reference uses its own homepage snapshot; any page-shaped text
# exercises the same code paths)
SHORT = b"aaaaaaaaaaaaaaaabbbbbbbbbbbbbbbbbbbbbcccccccccccccccc"
LONGER = SHORT * 12
WEBPAGE = (
    b"<!DOCTYPE html><html><head><title>t</title></head><body>"
    + b"".join(
        b'<p style="text-align: center;"><a href="http://example.org/%d">link %d</a></p>'
        % (i, i)
        for i in range(40)
    )
    + b"</body></html>"
)

CORPUS = [SHORT, LONGER, WEBPAGE]


@pytest.mark.parametrize("data", CORPUS)
def test_zip_unzip(data):
    compressed = zip_bytes(data)
    assert len(compressed) < len(data)
    assert unzip(compressed) == data


@pytest.mark.parametrize("data", CORPUS)
def test_zip_unzip_best_effort(data):
    compressed = zip_bytes(data)
    assert len(compressed) < len(data)
    assert unzip_best_effort(compressed) == data


@pytest.mark.parametrize("data", CORPUS)
def test_gzip_truncation_recovers_prefix(data):
    """testTruncation (:190-218): every truncation of the compressed
    stream yields None (header cut) or a prefix of the original."""
    compressed = zip_bytes(data)
    for i in range(0, len(compressed), 3):
        trunc = unzip_best_effort(compressed[:i])
        if trunc is not None:
            assert data.startswith(trunc), f"truncated to {i}"


@pytest.mark.parametrize("data", CORPUS)
def test_gzip_limit(data):
    """testLimit (:220-235): output capped at exactly size_limit."""
    compressed = zip_bytes(data)
    for limit in (0, 1, len(data) // 2, len(data), len(data) + 10):
        got = unzip_best_effort(compressed, limit)
        assert got == data[:limit] or got == data
        assert len(got) == min(limit, len(data))


def test_gzip_header_cut_is_none():
    compressed = zip_bytes(SHORT)
    for i in range(0, 10):
        assert unzip_best_effort(compressed[:i]) is None
    assert unzip_best_effort(b"not gzip at all") is None


def test_unzip_strict_raises_on_truncation():
    compressed = zip_bytes(LONGER)
    with pytest.raises((ValueError, zlib.error)):
        unzip(compressed[: len(compressed) - 4])


@pytest.mark.parametrize("data", CORPUS)
def test_deflate_roundtrip_and_best_effort(data):
    compressed = deflate(data)
    assert len(compressed) < len(data)
    assert inflate(compressed) == data
    # HTTP raw-deflate bodies: strip the 2-byte zlib header + checksum
    raw = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw_bytes = raw.compress(data) + raw.flush()
    assert inflate_best_effort(raw_bytes) == data
    assert inflate_best_effort(raw_bytes, 7) == data[:7]


def test_deflate_truncation_recovers_prefix():
    raw = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw_bytes = raw.compress(LONGER) + raw.flush()
    for i in range(0, len(raw_bytes), 3):
        trunc = inflate_best_effort(raw_bytes[:i])
        assert trunc is not None and LONGER.startswith(trunc)


def test_decode_content_cond(spark):
    raw = zlib.compressobj(9, zlib.DEFLATED, -15)
    rows = [
        ("gz", zip_bytes(WEBPAGE), "gzip"),
        ("xgz", zip_bytes(SHORT), "x-GZIP"),
        ("df", raw.compress(SHORT) + raw.flush(), "deflate"),
        ("plain", SHORT, None),
        ("identity", SHORT, "identity"),
        ("empty", b"", "gzip"),
        ("corrupt", b"\x00\x01garbage", "gzip"),
    ]
    df = spark.createDataFrame(rows, "id string, body binary, enc string")
    got = {
        r["id"]: (bytes(r["out"]) if r["out"] is not None else None)
        for r in df.select(
            "id", decode_content_cond(F.col("body"), F.col("enc")).alias("out")
        ).collect()
    }
    assert got["gz"] == WEBPAGE
    assert got["xgz"] == SHORT
    assert got["df"] == SHORT
    assert got["plain"] == SHORT
    assert got["identity"] == SHORT
    assert got["empty"] == b""
    assert got["corrupt"] is None  # header-invalid gzip -> failed fetch


# ---------------------------------------------------------------------------
# property tests (pure driver-side, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_prop_gzip_roundtrip(data):
    assert unzip(zip_bytes(data)) == data
    assert unzip_best_effort(zip_bytes(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.integers(0, 3000))
def test_prop_gzip_truncation_is_none_or_prefix(data, cut):
    compressed = zip_bytes(data)
    trunc = unzip_best_effort(compressed[:cut])
    assert trunc is None or data.startswith(trunc)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.integers(0, 4096))
def test_prop_gzip_limit_is_exact_prefix(data, limit):
    got = unzip_best_effort(zip_bytes(data), limit)
    assert got == data[: min(limit, len(data))]


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_prop_deflate_roundtrip(data):
    assert inflate(deflate(data)) == data


# ---------------------------------------------------------------------------
# concatenated members + trailer garbage (GZIPInputStream semantics)
# ---------------------------------------------------------------------------


def test_concatenated_members_best_effort():
    """GZIPInputStream decompresses back-to-back gzip members as one
    stream; best-effort must do the same."""
    blob = zip_bytes(SHORT) + zip_bytes(LONGER) + zip_bytes(WEBPAGE)
    assert unzip_best_effort(blob) == SHORT + LONGER + WEBPAGE


def test_concatenated_members_strict():
    blob = zip_bytes(SHORT) + zip_bytes(LONGER)
    assert unzip(blob) == SHORT + LONGER


def test_trailing_garbage_after_member_is_ignored():
    """Bytes after a complete member that are not a valid gzip header
    are treated as end-of-stream (readTrailer swallows the error), in
    both strict and best-effort modes."""
    blob = zip_bytes(SHORT) + b"\x00\x01not-gzip-garbage"
    assert unzip_best_effort(blob) == SHORT
    assert unzip(blob) == SHORT


def test_concatenated_members_respect_limit():
    blob = zip_bytes(SHORT) + zip_bytes(LONGER)
    limit = len(SHORT) + 5
    assert unzip_best_effort(blob, limit) == (SHORT + LONGER)[:limit]


def test_truncated_second_member_recovers_first():
    second = zip_bytes(LONGER)
    blob = zip_bytes(SHORT) + second[: len(second) // 2]
    got = unzip_best_effort(blob)
    assert got is not None
    assert got.startswith(SHORT)
    assert (SHORT + LONGER).startswith(got)


def test_negative_max_content_means_unlimited(spark):
    """http.content.limit = -1 is the reference's unlimited sentinel;
    decode_content_cond must not truncate to empty on it."""
    df = spark.createDataFrame(
        [("g", zip_bytes(LONGER), "gzip"), ("d", deflate(LONGER)[2:-4], "deflate")],
        "k string, body binary, enc string",
    )
    out = {
        r["k"]: bytes(r["dec"])
        for r in df.select(
            "k", decode_content_cond(F.col("body"), F.col("enc"), -1).alias("dec")
        ).collect()
    }
    assert out["g"] == LONGER
    assert out["d"] == LONGER
