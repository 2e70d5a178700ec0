"""Character-encoding detection for fetched content.

Parity target: ``reference/src/java/org/apache/nutch/util/
EncodingDetector.java`` — the clue-list algorithm at :219-262
(guessEncoding), header parsing at :331-347 (parseCharacterEncoding,
the Tomcat RequestUtil port), alias resolution at :306-317, the
mislabel-correction map at :141-147 (ISO-8859-1 -> windows-1252 etc.),
the DETECTABLES mime gate at :122-130 and MIN_LENGTH=4 at :119.
Golden vectors ported from ``TestEncodingDetector.java:41-89``.

The reference's statistical detector is ICU4J's CharsetDetector; that
library is not in this container, so two sniffers ship behind the
pluggable ``sniffer=`` hook. The default, ``sniff_charset``, is a
deterministic mini-detector with a JVM column twin: BOM marks
(confidence 100), strict-UTF-8 multibyte decode (80), pure ASCII (10 —
real ICU also scores ASCII text too low to clear typical thresholds),
else a windows-1252 guess (30). The full ICU-equivalent is
``charset_sniffer.sniff_charset_statistical`` — byte-bigram profiles
trained per (charset, language) like the language identifier, covering
windows-125x / iso-8859-x / koi8-r / Shift_JIS / EUC-JP / EUC-KR /
GB18030 / Big5 / ISO-2022 / BOM-less UTF-16 — pass it (or any
``detectAll``-shaped list-returning callable) as ``sniffer=``.  The
clue-walk, ordering, thresholds, alias resolution and defaulting are
exact ports; only the statistical inner model is substituted.

Two surfaces:

- driver-side ``EncodingDetector`` class mirroring the reference API
  (autoDetectClues / addClue / guessEncoding) for per-record paths
  (ARC/file-protocol ingestion).
- ``detect_charset_col`` — the same decision as a pure JVM column
  expression for distributed use over (content bytes, content-type,
  header) columns: BOM tests are binary prefix compares, UTF-8
  validity is a decode roundtrip, header charset is a regexp.
  No Python in the hot path; whole-stage codegen throughout.

Scale: per-row expressions only — no shuffle, no UDF, no driver state.
"""

from __future__ import annotations

import codecs

from pyspark.sql import Column
from pyspark.sql import functions as F

NO_THRESHOLD = -1
MIN_LENGTH = 4  # EncodingDetector.java:119

# EncodingDetector.java:122-130
DETECTABLES = frozenset({
    "text/html", "text/plain", "text/richtext", "text/rtf", "text/sgml",
    "text/tab-separated-values", "text/xml", "application/rss+xml",
    "application/xhtml+xml",
})

# Python codec canonical name -> Java Charset canonical name, for the
# charsets the crawl path meets; resolve_encoding_alias falls back to
# the python canonical name for anything else (documented deviation —
# same charset, different spelling of the canonical).
_JAVA_CANONICAL = {
    "utf-8": "UTF-8",
    "utf-16": "UTF-16",
    "utf-16-le": "UTF-16LE",
    "utf-16-be": "UTF-16BE",
    "utf-32": "UTF-32",
    "ascii": "US-ASCII",
    "iso8859-1": "ISO-8859-1",
    "iso8859-9": "ISO-8859-9",
    "latin-1": "ISO-8859-1",
    "cp1250": "windows-1250",
    "cp1251": "windows-1251",
    "cp1252": "windows-1252",
    "cp1253": "windows-1253",
    "cp1254": "windows-1254",
    "cp1255": "windows-1255",
    "cp1256": "windows-1256",
    "euc_kr": "EUC-KR",
    "euc_jp": "EUC-JP",
    "gbk": "GBK",
    "gb18030": "GB18030",
    "big5": "Big5",
    "shift_jis": "Shift_JIS",
    "koi8-r": "KOI8-R",
}

# EncodingDetector.java:141-147 — NOT aliases: corrections for
# habitually mislabelled documents (windows-1252 supersets ISO-8859-1).
_MISLABEL_CORRECTIONS = {
    "ISO-8859-1": "windows-1252",
    "EUC-KR": "x-windows-949",
    "x-EUC-CN": "GB18030",
    "GBK": "GB18030",
}


def resolve_encoding_alias(encoding: str | None) -> str | None:
    """EncodingDetector.resolveEncodingAlias:306-317 — canonicalize,
    then apply the mislabel-correction map; None for unknown names."""
    if not encoding:
        return None
    try:
        py_name = codecs.lookup(encoding).name
    except (LookupError, TypeError):
        # correction-target names the JDK knows but python codecs does
        # not (x-windows-949): already canonical, pass through — a
        # corrected clue must survive re-resolution in guessEncoding
        if encoding in _MISLABEL_CORRECTIONS.values():
            return encoding
        return None
    canonical = _JAVA_CANONICAL.get(py_name, py_name)
    return _MISLABEL_CORRECTIONS.get(canonical, canonical)


def parse_character_encoding(content_type: str | None) -> str | None:
    """EncodingDetector.parseCharacterEncoding:331-347 (the Tomcat
    RequestUtil port): the trimmed, de-quoted charset= parameter."""
    if content_type is None:
        return None
    start = content_type.find("charset=")
    if start < 0:
        return None
    encoding = content_type[start + 8:]
    end = encoding.find(";")
    if end >= 0:
        encoding = encoding[:end]
    encoding = encoding.strip()
    if len(encoding) > 2 and encoding.startswith('"') and encoding.endswith('"'):
        encoding = encoding[1:-1]
    return encoding.strip()


def sniff_charset(data: bytes) -> tuple[str, int] | None:
    """Deterministic stand-in for ICU4J CharsetDetector.detectAll
    (EncodingDetector.java:167-185): (charset, confidence) or None.

    BOMs are certainties; a strict UTF-8 decode containing multibyte
    sequences is strong evidence; pure ASCII is weak evidence for any
    superset; arbitrary bytes get a low-confidence windows-1252 guess
    (every byte string decodes under it)."""
    if len(data) < MIN_LENGTH:
        return None
    if data[:4] in (b"\x00\x00\xfe\xff", b"\xff\xfe\x00\x00"):
        return ("UTF-32", 100)
    if data[:3] == b"\xef\xbb\xbf":
        return ("UTF-8", 100)
    if data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return ("UTF-16", 100)
    try:
        decoded = data.decode("utf-8")
    except UnicodeDecodeError:
        return ("windows-1252", 30)
    if len(decoded) < len(data):  # multibyte sequences present
        return ("UTF-8", 80)
    return ("UTF-8", 10)


class EncodingClue:
    """EncodingDetector.EncodingClue (inner class at :60-105)."""

    __slots__ = ("value", "source", "confidence")

    def __init__(self, value: str, source: str, confidence: int = NO_THRESHOLD):
        self.value = value
        self.source = source
        self.confidence = confidence

    def __repr__(self) -> str:  # EncodingClue.toString
        return f"{self.value} ({self.source}, {self.confidence}% confidence)"


class EncodingDetector:
    """Driver-side clue-list detector; the per-record twin of
    ``detect_charset_col``.  min_confidence < 0 disables the
    statistical source, exactly like the reference's
    ``encodingdetector.charset.min.confidence`` default."""

    def __init__(self, min_confidence: int = NO_THRESHOLD, sniffer=sniff_charset):
        self.min_confidence = min_confidence
        self._sniffer = sniffer
        self.clues: list[EncodingClue] = []

    def add_clue(self, value: str | None, source: str,
                 confidence: int = NO_THRESHOLD) -> None:
        # EncodingDetector.addClue:193-207 — drop empties and unknowns
        if not value:
            return
        resolved = resolve_encoding_alias(value)
        if resolved is not None:
            self.clues.append(EncodingClue(resolved, source, confidence))

    def auto_detect_clues(self, data: bytes, content_type: str | None,
                          header_content_type: str | None,
                          filter: bool = False) -> None:
        """EncodingDetector.autoDetectClues:163-191 — statistical clues
        first (gated on threshold, mime type, min length), then the
        HTTP header charset.

        ``filter=True`` is the reference's second argument
        (``detector.enableInputFilter(filter)``, :173 — parse-html
        passes true): markup is stripped before statistical scoring.
        Sniffers accepting ``filter_input`` (the statistical detector)
        get the exact raw/stripped split; others get pre-stripped
        bytes (BOMs and escapes are never inside tags, so the Unicode
        arms are unaffected)."""
        if (
            self.min_confidence >= 0
            and content_type in DETECTABLES
            and len(data) > MIN_LENGTH
        ):
            if filter:
                try:
                    match = self._sniffer(data, filter_input=True)
                except TypeError:
                    from nutch_spark.data.charset_sniffer import strip_markup

                    match = self._sniffer(strip_markup(data))
            else:
                match = self._sniffer(data)
            if match is not None:
                # ICU's detectAll yields a ranked match LIST and the
                # reference adds every one as a clue (:185-189); the
                # simple sniffer yields a single (name, conf) pair —
                # accept both shapes
                matches = match if isinstance(match, list) else [match]
                for m in matches:
                    self.add_clue(m[0], "detect", m[1])
        self.add_clue(parse_character_encoding(header_content_type), "header")

    def guess_encoding(self, default_value: str) -> str:
        """EncodingDetector.guessEncoding:219-262 — first clue meeting
        the threshold wins; else the first threshold-free clue; else
        the default. Lowercased, like the reference's return."""
        best: EncodingClue | None = None
        for clue in self.clues:
            if self.min_confidence >= 0 and clue.confidence >= self.min_confidence:
                return resolve_encoding_alias(clue.value).lower()
            if clue.confidence == NO_THRESHOLD and best is None:
                best = clue
        return (best.value if best is not None else default_value).lower()

    def clear_clues(self) -> None:
        self.clues.clear()


# ---------------------------------------------------------------------------
# JVM column twin
# ---------------------------------------------------------------------------

# common header spellings -> resolved (post-correction) lowercase name;
# the JVM twin resolves via this when-chain instead of codecs.lookup.
_HEADER_RESOLVE = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "utf-16": "utf-16", "utf16": "utf-16",
    "utf-32": "utf-32",
    "us-ascii": "us-ascii", "ascii": "us-ascii",
    "iso-8859-1": "windows-1252",  # mislabel correction
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "euc-kr": "x-windows-949",
    # gb2312 is NOT corrected: the reference's ALIASES map
    # (EncodingDetector.java:141-144) corrects only x-EUC-CN and GBK
    # to GB18030 — Charset.forName("gb2312") is its own canonical.
    "gbk": "gb18030", "gb18030": "gb18030", "gb2312": "gb2312",
    "koi8-r": "koi8-r", "koi8r": "koi8-r",
    "iso-8859-2": "iso-8859-2", "iso-8859-5": "iso-8859-5",
    # iso-8859-9 deliberately NOT corrected to windows-1254: the
    # reference's correction map (EncodingDetector.java:141-147) only
    # corrects ISO-8859-1 / EUC-KR / GB cases, and the Python
    # resolve_encoding_alias path leaves it alone — both paths agree.
    "iso-8859-7": "iso-8859-7", "iso-8859-9": "iso-8859-9",
    "iso-8859-15": "iso-8859-15",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc-jp", "big5": "big5", "big-5": "big5",
    "iso-2022-jp": "iso-2022-jp", "iso-2022-kr": "iso-2022-kr",
    **{f"windows-125{i}": f"windows-125{i}" for i in range(9)},
    **{f"cp125{i}": f"windows-125{i}" for i in range(9)},
}


def header_charset_col(content_type: Column) -> Column:
    """Column twin of parse_character_encoding + resolve_encoding_alias
    for the spellings in ``_HEADER_RESOLVE``; NULL when absent/unknown."""
    raw = F.lower(F.trim(F.regexp_extract(
        content_type, r'charset=\s*"?([^";]*)"?', 1
    )))
    table = F.create_map(
        *[F.lit(x) for kv in _HEADER_RESOLVE.items() for x in kv]
    )
    return F.element_at(table, raw)  # NULL for absent/unknown spellings


def detect_charset_col(
    content: Column,
    content_type: Column,
    header_content_type: Column,
    default: str = "windows-1252",
    min_confidence: int = NO_THRESHOLD,
) -> Column:
    """The guessEncoding decision as one JVM expression (lowercase).

    Clue order matches autoDetectClues: the statistical clue (BOM /
    UTF-8-validity mini-detector, same confidences as sniff_charset)
    is examined before the header clue.  With min_confidence < 0 the
    statistical source is disabled and the header (or default) wins.
    UTF-8 validity JVM-side: Spark 4's ``is_valid_utf8`` over the
    byte-reinterpreting binary->string cast — exact, no decode errors,
    and a valid decode SHORTER than the byte length proves multibyte.
    """
    header = header_charset_col(header_content_type)
    if min_confidence < 0:
        return F.lower(F.coalesce(header, F.lit(default)))

    detectable = content_type.isin(*sorted(DETECTABLES))
    blen = F.length(content)
    gate = detectable & (blen > MIN_LENGTH)

    # binary prefix compares via hex (substring works on binary)
    def pfx(n: int) -> Column:
        return F.hex(F.substring(content, 1, n))

    p2, p3, p4 = pfx(2), pfx(3), pfx(4)
    # binary->string cast reinterprets the bytes; Spark 4's UTF-8
    # validators classify them without ANSI decode errors
    s = content.cast("string")
    clean = F.is_valid_utf8(s)
    multibyte = clean & (F.length(s) < blen)
    ascii_only = clean & (F.length(s) == blen)

    detect_val = (
        F.when(p4.isin("0000FEFF", "FFFE0000"), F.lit("utf-32"))
        .when(p3 == "EFBBBF", F.lit("utf-8"))
        .when(F.substring(p2, 1, 4).isin("FEFF", "FFFE"), F.lit("utf-16"))
        .when(multibyte, F.lit("utf-8"))
        .when(ascii_only, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252"))
    )
    detect_conf = (
        F.when(p4.isin("0000FEFF", "FFFE0000"), F.lit(100))
        .when(p3 == "EFBBBF", F.lit(100))
        .when(F.substring(p2, 1, 4).isin("FEFF", "FFFE"), F.lit(100))
        .when(multibyte, F.lit(80))
        .when(ascii_only, F.lit(10))
        .otherwise(F.lit(30))
    )
    confident = gate & (detect_conf >= F.lit(min_confidence))
    return F.lower(
        F.when(confident, detect_val).otherwise(F.coalesce(header, F.lit(default)))
    )


def decode_with_charset_col(content: Column, charset: Column) -> Column:
    """Decode bytes to text under a *per-row* charset column.

    ``F.decode`` takes only a literal charset (and under ANSI mode it
    ERRORS on malformed input), so dispatch: UTF-8/ASCII rows — the
    overwhelming majority of real web content — go through
    ``make_valid_utf8`` (JVM, codegen, U+FFFD replacement exactly like
    Python's errors='replace'); ISO-8859-1 through ``decode`` (every
    byte string is well-formed latin-1); everything else (windows-125x,
    UTF-16 with its malformed-input error path, CJK sets...) takes one
    Arrow-batched fallback.  NULL charset falls through to the
    fallback, which treats it as utf-8-with-replacement.
    """
    cs = F.lower(charset)
    return (
        F.when(cs.isin("utf-8", "us-ascii"),
               F.make_valid_utf8(content.cast("string")))
        .when(cs == "iso-8859-1", F.decode(content, "ISO-8859-1"))
        .otherwise(_decode_fallback_pdf(content, cs))
    )


# Java-canonical names python codecs does not know, mapped to their
# python twins for the per-row decode
_PY_CODEC_ALIASES = {"x-windows-949": "cp949"}


def _decode_fallback_pdf_impl(content, cs):
    import pandas as pd  # local: keep module import light

    def one(blob, name):
        if blob is None:
            return None
        name = _PY_CODEC_ALIASES.get((name or "").lower(), name)
        try:
            return bytes(blob).decode(name or "utf-8", errors="replace")
        except (LookupError, TypeError):
            return bytes(blob).decode("utf-8", errors="replace")

    return pd.Series([one(b, n) for b, n in zip(content, cs)])


def _decode_fallback_pdf(content: Column, cs: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_decode_fallback_pdf_impl, "string")(content, cs)
