"""Statistical charset detection — the ICU4J ``CharsetDetector``
stand-in behind ``EncodingDetector``'s pluggable sniffer hook.

The reference delegates statistical detection to ICU at
``util/EncodingDetector.java:119-180`` (``detector.setText(data);
detector.detectAll()``). That library is not in this container, so
this module implements the same three recognizer families from
scratch (design mirrors icu4j's public ``CharsetRecog_*`` sources,
no tables ported):

- **Unicode recognizers** — BOM prefixes (confidence 100), strict
  UTF-8 structural validation (80 with multibyte evidence, 10 for
  pure ASCII — real ICU also scores plain ASCII too low to clear
  typical thresholds), a null-byte-distribution heuristic for
  BOM-less UTF-16 (70), and the ISO-2022-JP/KR escape-sequence
  detector (100 — the escapes are unambiguous).
- **n-gram recognizers** (SBCS *and* MBCS) — byte-bigram profiles
  trained per (charset, language) by ``tools/build_charset_profiles.py``
  the same way the language identifier was trained
  (``tools/build_lang_profiles.py``); a document is scored by cosine
  between its high-byte bigram counts and every profile, gated on a
  strict decode under the candidate charset (truncated trailing
  multibyte sequences tolerated). Confidence = scaled cosine,
  clipped to [10, 95].
- the windows-1252 floor (30) for byte soup nothing else claims,
  matching the cheap sniffer's fallback arm.

``detect_all`` returns the ranked match list (the reference adds every
``CharsetMatch`` as a clue); ``sniff_charset_statistical`` returns the
best match in the ``(name, confidence)`` shape of the pluggable hook.
``EncodingDetector.auto_detect_clues`` accepts either shape.

Scale: detection is per-row pure Python over a bounded byte prefix —
at 100 TB it runs as ``statistical_charset_udf``, an Arrow-batched
narrow map (zero shuffle, profiles serialized once per executor in
the closure), exactly the langid ``identify_udf`` plan shape.
"""

from __future__ import annotations

import json
import math
from collections import Counter
from pathlib import Path

MIN_LENGTH = 4  # EncodingDetector.java:119 — CharsetDetector dies under this

# cap the bytes examined per document: ICU's CharsetDetector looks at
# the first 8000 bytes (kBufSize); matching that bounds per-row cost
SNIFF_LIMIT = 8000

_PROFILE_PATH = Path(__file__).with_name("charset_profiles.json")
_PROFILES: dict[str, dict[str, dict[str, float]]] = json.loads(
    _PROFILE_PATH.read_text()
)

# Java canonical spellings for the profile charsets (codec -> report name)
_REPORT_NAME = {
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251",
    "windows-1252": "windows-1252",
    "windows-1253": "windows-1253",
    "windows-1254": "windows-1254",
    "windows-1255": "windows-1255",
    "windows-1256": "windows-1256",
    "iso-8859-2": "ISO-8859-2",
    "iso-8859-5": "ISO-8859-5",
    "iso-8859-7": "ISO-8859-7",
    "koi8-r": "KOI8-R",
    "shift_jis": "Shift_JIS",
    "euc-jp": "EUC-JP",
    "euc-kr": "EUC-KR",
    "gb18030": "GB18030",
    "big5": "Big5",
}

# how many trailing bytes a truncated multibyte sequence can dangle
_TRUNC_SLACK = 3

# ICU keeps the raw input when tag-stripping leaves fewer bytes than
# this (CharsetDetector.MungeInput's "not much real text" fallback)
_STRIP_MIN_REMAIN = 100


def strip_markup(data: bytes) -> bytes:
    """ICU CharsetDetector's input filter (enableInputFilter /
    MungeInput): drop ``<...>`` tag spans so ASCII markup does not
    dilute the statistical evidence; fall back to the raw bytes when
    stripping leaves under ~100 bytes (a page that is mostly markup
    still has to be detected from something)."""
    out = bytearray()
    in_tag = False
    for b in data:
        if in_tag:
            if b == 0x3E:  # '>'
                in_tag = False
        elif b == 0x3C:  # '<'
            in_tag = True
        else:
            out.append(b)
    if len(out) < _STRIP_MIN_REMAIN and len(out) < len(data):
        return data
    return bytes(out)


def _high_bigrams(data: bytes) -> Counter:
    """Same extraction as tools/build_charset_profiles.high_bigrams."""
    c: Counter = Counter()
    for i in range(len(data) - 1):
        a, b = data[i], data[i + 1]
        if a >= 0x80 or b >= 0x80:
            c["%02x%02x" % (a, b)] += 1
    return c


def _decodes(data: bytes, charset: str) -> bool:
    """Strict decode gate, tolerating a truncated final sequence."""
    for cut in range(_TRUNC_SLACK + 1):
        end = len(data) - cut
        if end <= 0:
            return False
        try:
            data[:end].decode(charset)
            return True
        except UnicodeDecodeError as e:
            # only retry when the failure is at the truncation point
            if e.start < end - _TRUNC_SLACK:
                return False
        except LookupError:
            return False
    return False


def _utf16_heuristic(data: bytes) -> tuple[str, int] | None:
    """BOM-less UTF-16: one byte of most code units is NUL; require a
    strong skew and a clean strict decode."""
    if len(data) < 8:
        return None
    sample = data[: SNIFF_LIMIT & ~1]
    even = sum(1 for i in range(0, len(sample), 2) if sample[i] == 0)
    odd = sum(1 for i in range(1, len(sample), 2) if sample[i] == 0)
    half = len(sample) // 2
    if odd > half * 0.7 and even < half * 0.05 and _decodes(sample, "utf-16-le"):
        return ("UTF-16LE", 70)
    if even > half * 0.7 and odd < half * 0.05 and _decodes(sample, "utf-16-be"):
        return ("UTF-16BE", 70)
    return None


def _high_unigrams(data: bytes) -> Counter:
    """Same extraction as tools/build_charset_profiles.high_unigrams."""
    c: Counter = Counter()
    for b in data:
        if b >= 0x80:
            c["%02x" % b] += 1
    return c


# score = BI_W*bigram_cos + UNI_W*unigram_cos: bigrams are the precise
# discriminator (cp1251-Russian vs cp1253-Greek share no pairs) but
# sparse on unseen text; the unigram letter-frequency signature
# generalizes across documents and carries most of the recall.
_BI_W, _UNI_W = 0.4, 0.6


def _cosine(counts: Counter, prof: dict[str, float]) -> float:
    norm = math.sqrt(sum(v * v for v in counts.values()))
    if norm == 0.0:
        return 0.0
    dot = sum(v * prof[g] for g, v in counts.items() if g in prof)
    return dot / norm


def _ngram_matches(data: bytes) -> list[tuple[str, int]]:
    """Mixed unigram+bigram cosine against every trained
    (charset, language) profile, decode-gated; best language per
    charset."""
    bi = _high_bigrams(data)
    uni = _high_unigrams(data)
    if not uni:
        return []
    out: list[tuple[str, int]] = []
    for charset, langs in _PROFILES.items():
        if not _decodes(data, charset):
            continue
        best = 0.0
        for prof in langs.values():
            score = _BI_W * _cosine(bi, prof["bi"]) + _UNI_W * _cosine(
                uni, prof["uni"]
            )
            if score > best:
                best = score
        if best > 0.0:
            conf = max(10, min(95, int(round(best * 100))))
            out.append((_REPORT_NAME[charset], conf))
    out.sort(key=lambda m: (-m[1], m[0]))
    return out


def detect_all(
    data: bytes, filter_input: bool = False
) -> list[tuple[str, int]]:
    """Ranked ``(charset, confidence)`` matches — the ``detectAll``
    twin. Unicode recognizers win outright; otherwise every n-gram
    match is returned (the reference adds each as a clue), with the
    windows-1252 floor appended when nothing else claims the bytes.

    ``filter_input=True`` is ICU's enableInputFilter: the Unicode
    recognizers (BOM / escapes / UTF-8 / UTF-16) see the RAW bytes
    (ICU's fRawInput), while the n-gram recognizers score the
    markup-stripped bytes (fInputBytes) so ``<html>`` soup does not
    dilute the evidence — parse-html calls autoDetectClues(content,
    true), so this is the main consumer's mode."""
    if data is None or len(data) < MIN_LENGTH:
        return []
    data = bytes(data[:SNIFF_LIMIT])
    if data[:4] in (b"\x00\x00\xfe\xff", b"\xff\xfe\x00\x00"):
        return [("UTF-32", 100)]
    if data[:3] == b"\xef\xbb\xbf":
        return [("UTF-8", 100)]
    if data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return [("UTF-16", 100)]
    # ISO-2022 escape sequences are unambiguous shift states
    if b"\x1b$B" in data or b"\x1b$@" in data or b"\x1b(J" in data:
        return [("ISO-2022-JP", 100)]
    if b"\x1b$)C" in data:
        return [("ISO-2022-KR", 100)]
    # BOM-less UTF-16 before the UTF-8 arm: UTF-16 of ASCII text is
    # byte-wise valid UTF-8 (NULs are legal), so the UTF-8 recognizer
    # would otherwise claim it
    if b"\x00" in data:
        u16 = _utf16_heuristic(data)
        if u16 is not None:
            return [u16]
    try:
        decoded = data.decode("utf-8")
        if len(decoded) < len(data):
            return [("UTF-8", 80)]
        return [("UTF-8", 10)]
    except UnicodeDecodeError:
        pass
    matches = _ngram_matches(strip_markup(data) if filter_input else data)
    if not any(m[0] == "windows-1252" for m in matches):
        matches.append(("windows-1252", 30))
        # re-rank: the floor can outrank weak (conf 10-29) ngram hits
        matches.sort(key=lambda m: (-m[1], m[0]))
    return matches


def sniff_charset_statistical(
    data: bytes, filter_input: bool = False
) -> tuple[str, int] | None:
    """Best single match — drop-in for ``EncodingDetector(sniffer=...)``
    and the shape-compatible upgrade of ``encoding.sniff_charset``."""
    matches = detect_all(data, filter_input)
    return matches[0] if matches else None


def statistical_charset_udf():
    """Arrow-batched pandas UDF: content bytes -> best charset name
    (lowercase, post mislabel-correction) or NULL below MIN_LENGTH.

    The distributed form of the sniffer for charset-chaotic corpora:
    a zero-shuffle narrow map; combine with ``header_charset_col`` via
    the same clue order as ``detect_charset_col``.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from nutch_spark.data.encoding import resolve_encoding_alias

    @F.pandas_udf("string")
    def _sniff(content):
        def one(blob):
            if blob is None:
                return None
            m = sniff_charset_statistical(bytes(blob))
            if m is None:
                return None
            resolved = resolve_encoding_alias(m[0])
            return resolved.lower() if resolved else m[0].lower()

        return content.map(one)

    return _sniff


def statistical_charset_struct_udf():
    """Arrow-batched pandas UDF: content bytes -> struct(cs, conf) —
    the detect clue WITH its confidence, for callers that run the
    reference's threshold walk JVM-side (arc_text_spans
    statistical=True). cs is lowercase post-correction; NULL struct
    fields below MIN_LENGTH."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nutch_spark.data.encoding import resolve_encoding_alias

    @F.pandas_udf("cs string, conf int")
    def _sniff(content):
        names, confs = [], []
        for blob in content:
            m = (
                sniff_charset_statistical(bytes(blob))
                if blob is not None
                else None
            )
            if m is None:
                names.append(None)
                confs.append(None)
            else:
                resolved = resolve_encoding_alias(m[0])
                names.append(resolved.lower() if resolved else m[0].lower())
                confs.append(m[1])
        return pd.DataFrame({"cs": names, "conf": confs})

    return _sniff
