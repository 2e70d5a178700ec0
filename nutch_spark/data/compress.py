"""Best-effort content decompression — parity with
``util/GZIPUtils.java`` and ``util/DeflateUtils.java`` plus the
``Content-Encoding`` dispatch from
``lib-http/.../HttpBase.java:662-720`` (processGzipEncoded /
processDeflateEncoded).

The reference's contract, ported exactly:

- ``unzip_best_effort(data, size_limit)``: decode a gzip body; a
  corrupt or truncated STREAM yields the bytes decoded so far (a
  possibly-empty prefix of the original), while a corrupt or truncated
  HEADER yields ``None`` (GZIPUtils.java:45-79 — the GZIPInputStream
  constructor consumes the header, so header failures surface as the
  ``IOException -> return null`` arm; mid-stream failures hit the
  swallow-and-break read loop). ``size_limit`` caps the OUTPUT size,
  cutting mid-buffer exactly like the reference's
  ``outStream.write(buf, 0, sizeLimit - written)``.
- ``inflate_best_effort``: same loop over a RAW deflate stream — the
  reference passes ``new Inflater(true)`` ("HTTP does not provide
  zlib headers", DeflateUtils.java:42-44) so there is no header to
  fail on and the result is never ``None``.
- strict ``unzip`` / ``inflate`` raise on any corruption
  (GZIPUtils.java:86-100).

At-scale path: ``decode_content_cond`` is an Arrow-batched pandas UDF
(binary -> binary) dispatching on the encoding column per row — the
only sane place for this work, since per-row zlib calls cannot be
expressed as JVM columns; the UDF is a pure map (no shuffle, no state)
and the decode failure arm returns NULL content, mirroring HttpBase's
``throw new IOException`` turning the fetch into a failure.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_FEED_CHUNK = 4096  # BUF_SIZE — granularity of the partial-recovery loop

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def _gzip_header_end(data: bytes) -> int | None:
    """Length of the gzip member header, or ``None`` when the header is
    truncated or invalid — the cases where GZIPInputStream's
    constructor throws and the reference returns null."""
    if len(data) < 10 or data[0] != 0x1F or data[1] != 0x8B or data[2] != 8:
        return None
    flg = data[3]
    pos = 10
    if flg & _FEXTRA:
        if len(data) < pos + 2:
            return None
        xlen = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2 + xlen
    if flg & _FNAME:
        end = data.find(b"\0", pos)
        if end < 0:
            return None
        pos = end + 1
    if flg & _FCOMMENT:
        end = data.find(b"\0", pos)
        if end < 0:
            return None
        pos = end + 1
    if flg & _FHCRC:
        pos += 2
    return pos if pos <= len(data) else None


def _best_effort(data: bytes, wbits: int, size_limit: int | None) -> bytes:
    """The reference's read loop: accumulate until EOF, error (keep
    what we have), or the output limit (cut exactly at the limit).

    Concatenated gzip members: GZIPInputStream keeps reading across
    back-to-back members (JDK readTrailer restarts the inflater when
    the trailing bytes start a valid member header), so the gzip arm
    (wbits=31) does the same; raw deflate has no member framing and
    stops at stream end like InflaterInputStream."""
    if size_limit is not None and size_limit <= 0:
        return b""  # Java: (written + size) > 0 on the first read -> cut to 0
    out = bytearray()
    buf = data
    while True:
        d = zlib.decompressobj(wbits=wbits)
        member_end = None  # feed offset past the chunk where d.eof hit
        for i in range(0, len(buf), _FEED_CHUNK):
            chunk = buf[i : i + _FEED_CHUNK]
            try:
                if size_limit is not None:
                    # zlib treats max_length=0 as unlimited; the remaining
                    # budget is >=1 here (the cut-and-return keeps it so)
                    out += d.decompress(chunk, size_limit - len(out))
                    if len(out) >= size_limit:
                        return bytes(out)
                else:
                    out += d.decompress(chunk)
            except zlib.error:
                return bytes(out)
            if d.eof:
                member_end = i + _FEED_CHUNK
                break
        if member_end is None:
            return bytes(out)  # input exhausted mid-stream (truncated)
        rest = d.unused_data + buf[member_end:]
        if wbits != 31 or not rest or _gzip_header_end(rest) is None:
            # trailing garbage after a complete member is silently
            # ignored, as GZIPInputStream's readTrailer does
            return bytes(out)
        buf = rest


def unzip_best_effort(data: bytes | None, size_limit: int | None = None) -> bytes | None:
    """``GZIPUtils.unzipBestEffort`` (:39-79)."""
    if data is None:
        return None
    if _gzip_header_end(data) is None:
        return None
    return _best_effort(data, 31, size_limit)


def inflate_best_effort(data: bytes | None, size_limit: int | None = None) -> bytes | None:
    """``DeflateUtils.inflateBestEffort`` (:36-74) — raw deflate, no
    header arm, never ``None`` for non-null input."""
    if data is None:
        return None
    return _best_effort(data, -15, size_limit)


def unzip(data: bytes) -> bytes:
    """Strict ``GZIPUtils.unzip`` (:86-100): raises ``zlib.error`` /
    ``ValueError`` on corruption of the (first) stream. Handles
    concatenated members the way GZIPInputStream does, including its
    readTrailer behavior of treating trailing bytes that are NOT a
    valid member header as end-of-stream rather than an error."""
    out = bytearray()
    buf = data
    first = True
    while buf:
        if not first and _gzip_header_end(buf) is None:
            break  # invalid trailer -> silent EOF (GZIPInputStream)
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(buf)
        if not d.eof:
            raise ValueError("truncated gzip stream")
        buf = d.unused_data
        first = False
    return bytes(out)


def inflate(data: bytes) -> bytes:
    """Strict ``DeflateUtils.inflate`` (:81-95) — zlib-wrapped, as the
    reference's default ``InflaterInputStream``."""
    d = zlib.decompressobj(wbits=15)
    out = d.decompress(data)
    if not d.eof:
        raise ValueError("truncated deflate stream")
    return out


def zip_bytes(data: bytes) -> bytes:
    """``GZIPUtils.zip`` (:107-131) — deterministic (mtime pinned to 0)
    and round-trip-exact, but NOT byte-identical to reference-produced
    archives: we compress at level 9 where GZIPOutputStream defaults to
    6, and zlib's OS header byte differs from the JDK's. Only
    round-trip equality and run-to-run determinism are guaranteed."""
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def deflate(data: bytes) -> bytes:
    """``DeflateUtils.deflate`` (:102-115) — zlib-wrapped. Same caveat
    as ``zip_bytes``: round-trip + determinism guaranteed, byte-parity
    with Deflater(level 6) output not."""
    c = zlib.compressobj(9, zlib.DEFLATED, 15)
    return c.compress(data) + c.flush()


def decode_content_cond(
    content: Column, encoding: Column, max_content: int | None = None
) -> Column:
    """HttpBase's Content-Encoding dispatch (:588-607 call sites) as a
    vectorized column: gzip/x-gzip -> unzip_best_effort, deflate ->
    inflate_best_effort, anything else passes through. Empty bodies
    pass through (redirections, :669-672); a failed decode yields NULL
    (the reference throws, failing the fetch). ``max_content`` follows
    the ``http.content.limit`` convention: negative means unlimited
    (the reference's -1 sentinel), 0 truncates to empty."""
    if max_content is not None and max_content < 0:
        max_content = None  # http.content.limit = -1 -> unlimited

    @F.pandas_udf("binary")
    def _decode(cols: pd.DataFrame) -> pd.Series:
        body, enc = cols["c"], cols["e"]

        def one(b, e):
            if b is None or len(b) == 0:
                return b
            e = (e or "").lower()
            if e in ("gzip", "x-gzip"):
                return unzip_best_effort(bytes(b), max_content)
            if e == "deflate":
                return inflate_best_effort(bytes(b), max_content)
            return b

        return pd.Series(
            [one(b, e) for b, e in zip(body, enc)], index=body.index, dtype=object
        )

    return _decode(F.struct(content.alias("c"), encoding.alias("e")))
