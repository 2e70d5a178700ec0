"""Statistical charset detection — the ICU4J CharsetDetector stand-in
(`nutch_spark/data/charset_sniffer.py`).

Goldens use HELD-OUT text (UDHR Article 2 fragments and freshly
composed sentences), NOT the Article-1 training samples in
tools/build_charset_profiles.py — the model is graded on unseen data.
Reference anchor: util/EncodingDetector.java:119-189 (detectAll clue
source) and TestEncodingDetector.java's clue-walk goldens (ported in
test_encoding.py; here we grade the inner detector itself).
"""

from __future__ import annotations

import pytest

from nutch_spark.data.charset_sniffer import (
    detect_all,
    sniff_charset_statistical,
)
from nutch_spark.data.encoding import EncodingDetector

# held-out native-script text per language (different sentences from
# the training corpus)
HELDOUT = {
    "ru": (
        "Каждый человек имеет право на жизнь, на свободу и на личную "
        "неприкосновенность. Никто не должен содержаться в рабстве или "
        "в подневольном состоянии; рабство и работорговля запрещаются."
    ),
    "el": (
        "Κάθε άνθρωπος έχει δικαίωμα στη ζωή, στην ελευθερία και στην "
        "προσωπική του ασφάλεια. Κανείς δεν επιτρέπεται να κρατείται σε "
        "δουλεία ή καταναγκασμό, σε οποιαδήποτε μορφή."
    ),
    "he": (
        "לכל אדם הזכות לחיים, לחירות ולביטחון אישי. לא יוחזק אדם בעבדות "
        "או בשעבוד; העבדות וסחר העבדים אסורים בכל צורה שהיא."
    ),
    "ar": (
        "لكل فرد الحق في الحياة والحرية وسلامة شخصه. لا يجوز استرقاق "
        "أو استعباد أي شخص، ويحظر الاسترقاق وتجارة الرقيق بكافة أوضاعهما."
    ),
    "cs": (
        "Každý má právo na život, svobodu a osobní bezpečnost. Nikdo "
        "nesmí být držen v otroctví nebo nevolnictví; všechny formy "
        "otroctví a obchodu s otroky jsou zakázány."
    ),
    "pl": (
        "Każdy człowiek ma prawo do życia, wolności i bezpieczeństwa "
        "swej osoby. Nie wolno nikogo czynić niewolnikiem ani nakładać "
        "na nikogo służebności; niewolnictwo jest zakazane. Wszystko "
        "zaczęło się wczesną wiosną, gdy na łąkach pojawiły się pierwsze "
        "kwiaty, a uczniowie wrócili do szkoły po długiej przerwie "
        "świątecznej i opowiadali o górach, jeziorach i pięknej pogodzie."
    ),
    "tr": (
        "Yaşamak, özgürlük ve kişi güvenliği herkesin hakkıdır. Hiç "
        "kimse kölelik veya kulluk altında bulundurulamaz; kölelik ve "
        "köle ticareti her türlü biçimde yasaktır."
    ),
    "fr": (
        "Tout individu a droit à la vie, à la liberté et à la sûreté de "
        "sa personne. Nul ne sera tenu en esclavage ni en servitude; "
        "l'esclavage et la traite des esclaves sont interdits."
    ),
    "de": (
        "Jeder hat das Recht auf Leben, Freiheit und Sicherheit der "
        "Person. Die Würde des Menschen ist unantastbar; sie zu achten "
        "und zu schützen ist Verpflichtung aller staatlichen Gewalt. "
        "Überall müssen die Bürger dafür Sorge tragen, daß größere "
        "Missstände möglichst früh erkannt werden."
    ),
    "ja": (
        "何人も、奴隷にされ、又は苦役に服することはない。奴隷制度及び奴隷"
        "売買は、いかなる形においても禁止する。すべて人は、生命、自由及び"
        "身体の安全に対する権利を有する。来週は雨が降るかもしれません。"
    ),
    "zh-hans": (
        "人人有权享有生命、自由和人身安全。任何人不得使为奴隶或奴役；一切"
        "形式的奴隶制度和奴隶买卖，均应予以禁止。明天我们要去图书馆看书。"
    ),
    "zh-hant": (
        "人人有權享有生命、自由和人身安全。任何人不得使為奴隸或奴役；一切"
        "形式的奴隸制度和奴隸買賣，均應予以禁止。明天我們要去圖書館看書。"
    ),
    "ko": (
        "모든 사람은 생명과 신체의 자유와 안전에 대한 권리를 가진다. 어느 "
        "누구도 노예 상태 또는 예속 상태에 놓이지 아니한다. 모든 형태의 "
        "노예 제도와 노예 매매는 금지된다. 내일은 도서관에 갑니다."
    ),
}

GOLDENS = [
    # (language, python codec to encode under, expected detected name)
    ("ru", "windows-1251", "windows-1251"),
    ("ru", "koi8-r", "KOI8-R"),
    ("ru", "iso-8859-5", "ISO-8859-5"),
    ("he", "windows-1255", "windows-1255"),
    ("ar", "windows-1256", "windows-1256"),
    ("tr", "windows-1254", "windows-1254"),
    ("fr", "windows-1252", "windows-1252"),
    ("de", "windows-1252", "windows-1252"),
    ("ja", "shift_jis", "Shift_JIS"),
    ("ja", "euc-jp", "EUC-JP"),
    ("zh-hans", "gb18030", "GB18030"),
    ("zh-hant", "big5", "Big5"),
    ("ko", "euc-kr", "EUC-KR"),
]


@pytest.mark.parametrize("lang,codec,expected", GOLDENS)
def test_heldout_detection(lang, codec, expected):
    data = HELDOUT[lang].encode(codec)
    got = sniff_charset_statistical(data)
    assert got is not None
    assert got[0] == expected, f"{lang}/{codec}: got {got}"
    assert got[1] >= 40  # confident, not a floor guess


# charset pairs that share (nearly) all letter positions for their
# script — cp1250/iso-8859-2 for Central European, cp1253/iso-8859-7
# for Greek: either answer decodes the text to the same letters, so the
# golden is the family plus a correct decode, not the exact member
FAMILY = [
    ("cs", "windows-1250", ("windows-1250", "ISO-8859-2")),
    ("cs", "iso-8859-2", ("windows-1250", "ISO-8859-2")),
    ("pl", "windows-1250", ("windows-1250", "ISO-8859-2")),
    ("pl", "iso-8859-2", ("windows-1250", "ISO-8859-2")),
    ("el", "windows-1253", ("windows-1253", "ISO-8859-7")),
    ("el", "iso-8859-7", ("windows-1253", "ISO-8859-7")),
]


@pytest.mark.parametrize("lang,codec,family", FAMILY)
def test_lookalike_family(lang, codec, family):
    data = HELDOUT[lang].encode(codec)
    got = sniff_charset_statistical(data)
    assert got is not None
    assert got[0] in family, f"{lang}/{codec}: {got}"
    assert got[1] >= 40
    # letters must survive a decode under the detected member
    dec = data.decode(got[0].lower())
    assert any(ord(c) > 127 for c in dec)


def test_unicode_recognizers_keep_parity_with_simple_sniffer():
    assert sniff_charset_statistical(b"\xef\xbb\xbfabc") == ("UTF-8", 100)
    assert sniff_charset_statistical("héllo wörld".encode("utf-8")) == ("UTF-8", 80)
    assert sniff_charset_statistical(b"plain ascii text") == ("UTF-8", 10)
    assert sniff_charset_statistical(b"ab") is None  # below MIN_LENGTH
    assert sniff_charset_statistical("héllo".encode("utf-16"))[0] == "UTF-16"


def test_bomless_utf16():
    le = "plain ascii sentence for the null-byte heuristic".encode("utf-16-le")
    be = "plain ascii sentence for the null-byte heuristic".encode("utf-16-be")
    assert sniff_charset_statistical(le) == ("UTF-16LE", 70)
    assert sniff_charset_statistical(be) == ("UTF-16BE", 70)


def test_iso2022_jp():
    data = HELDOUT["ja"].encode("iso-2022-jp")
    assert sniff_charset_statistical(data) == ("ISO-2022-JP", 100)


def test_byte_soup_falls_back_to_latin_lookalike():
    got = sniff_charset_statistical(b"caf\xe9 au lait")
    # 0xE9 is "é" in every latin SBCS charset — any of them is a correct
    # claim for one stray accent; the decode must produce "café"
    assert got is not None
    assert "café" in b"caf\xe9 au lait".decode(got[0].lower())


def test_high_byte_soup_gets_the_floor():
    # bytes that no profile claims with signal but cp1252 decodes:
    # the windows-1252 floor (30) must appear in the match list
    matches = detect_all(bytes(range(0xA0, 0xFF)) * 2)
    assert any(name == "windows-1252" for name, _ in matches)


def test_detect_all_is_ranked_and_multi():
    data = HELDOUT["ru"].encode("windows-1251")
    matches = detect_all(data)
    assert matches[0][0] == "windows-1251"
    confs = [c for _, c in matches]
    assert confs == sorted(confs, reverse=True)


def test_plugs_into_encoding_detector_clue_walk():
    """The detectAll list shape feeds the exact reference clue walk:
    every match becomes a clue, threshold picks the winner, and the
    mislabel-correction map still applies (EUC-KR -> x-windows-949)."""
    d = EncodingDetector(min_confidence=40, sniffer=detect_all)
    d.auto_detect_clues(HELDOUT["ko"].encode("euc-kr"), "text/html", None)
    assert d.guess_encoding("windows-1252") == "x-windows-949"

    d = EncodingDetector(min_confidence=40, sniffer=detect_all)
    d.auto_detect_clues(HELDOUT["ru"].encode("windows-1251"), "text/html", None)
    assert d.guess_encoding("windows-1252") == "windows-1251"

    # below threshold -> header clue wins
    d = EncodingDetector(min_confidence=99, sniffer=detect_all)
    d.auto_detect_clues(
        HELDOUT["ru"].encode("windows-1251"),
        "text/html",
        "text/html; charset=KOI8-R",
    )
    assert d.guess_encoding("windows-1252") == "koi8-r"


def test_truncated_tail_still_detects():
    """A multibyte document cut mid-character (http.content.limit
    truncation) must still decode-gate and detect."""
    data = HELDOUT["ja"].encode("euc-jp")[:-1]
    got = sniff_charset_statistical(data)
    assert got is not None and got[0] == "EUC-JP"


def test_statistical_udf(spark):
    from pyspark.sql import functions as F

    from nutch_spark.data.charset_sniffer import statistical_charset_udf

    rows = [
        ("ru", HELDOUT["ru"].encode("windows-1251")),
        ("ko", HELDOUT["ko"].encode("euc-kr")),
        ("utf8", "héllo wörld".encode("utf-8")),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, content binary")
    got = {
        r["k"]: r["cs"]
        for r in df.select(
            "k", statistical_charset_udf()(F.col("content")).alias("cs")
        ).collect()
    }
    assert got["ru"] == "windows-1251"
    assert got["ko"] == "x-windows-949"  # mislabel correction applied
    assert got["utf8"] == "utf-8"
    assert got["null"] is None


def test_input_filter_strips_markup():
    """ICU enableInputFilter parity (EncodingDetector.java:173 —
    parse-html passes filter=true): heavy ASCII markup must not
    dilute the statistical evidence, and the Unicode recognizers
    still see raw bytes (BOMs/escapes are never inside tags)."""
    from nutch_spark.data.charset_sniffer import strip_markup

    body = HELDOUT["ru"]
    page = (
        "<html><head><meta name=\"viewport\" content=\"width=device-width\">"
        "<title>t</title></head><body><div class=\"main article content\">"
        + body
        + "</div></body></html>"
    ).encode("windows-1251")

    stripped = strip_markup(page)
    assert b"<" not in stripped and b"viewport" not in stripped
    assert "жизнь".encode("windows-1251") in stripped

    plain_conf = sniff_charset_statistical(body.encode("windows-1251"))[1]
    raw = sniff_charset_statistical(page)
    filt = sniff_charset_statistical(page, filter_input=True)
    assert filt[0] == "windows-1251"
    # filtering recovers (at least) the markup-free confidence
    assert filt[1] >= raw[1]
    assert filt[1] >= plain_conf - 2

    # mostly-markup page: stripping would leave <100 bytes -> raw kept
    tiny = b"<a href='x'>\xe9t\xe9</a>"
    assert strip_markup(tiny) == tiny


def test_detector_filter_arg():
    """autoDetectClues(content, filter) end-to-end through the clue
    walk, both with the statistical sniffer (filter_input kwarg) and
    the simple tuple sniffer (pre-stripped fallback)."""
    page = (
        "<html><body><p class=\"x\">" + HELDOUT["ru"] + "</p></body></html>"
    ).encode("windows-1251")
    d = EncodingDetector(min_confidence=40, sniffer=detect_all)
    d.auto_detect_clues(page, "text/html", None, filter=True)
    assert d.guess_encoding("utf-8") == "windows-1251"

    from nutch_spark.data.encoding import sniff_charset

    d2 = EncodingDetector(min_confidence=50, sniffer=sniff_charset)
    d2.auto_detect_clues("<p>héllo wörld</p>".encode("utf-8"),
                         "text/html", None, filter=True)
    assert d2.guess_encoding("windows-1252") == "utf-8"


# ---------------------------------------------------------------------------
# robustness properties (pure driver-side)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_prop_detect_never_crashes_and_is_decodable(data):
    """Any byte soup: detect_all must not raise, must rank by
    confidence, and every claimed charset must not crash a
    replace-mode decode of the input."""
    matches = detect_all(data)
    confs = [c for _, c in matches]
    assert confs == sorted(confs, reverse=True)
    for name, conf in matches:
        assert 0 < conf <= 100
        data.decode({"x-windows-949": "cp949"}.get(name.lower(), name.lower()),
                    errors="replace")


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_prop_strip_markup_is_subsequence_or_identity(data):
    """strip_markup only deletes bytes (or falls back to the input
    whole) — it never invents bytes, and never strips a leading BOM."""
    from nutch_spark.data.charset_sniffer import strip_markup

    out = strip_markup(data)
    if out != data:
        # subsequence check
        it = iter(data)
        assert all(b in it for b in out)
    if data[:3] == b"\xef\xbb\xbf":
        assert out[:3] == b"\xef\xbb\xbf" or out == data
