"""Language-identifier parity (VERDICT r02 missing #2).

Ports the reference plugin's tests:
- ``TestHTMLLanguageParser.testParseLanguage`` — the 44 golden
  normalization vectors (language-identifier/.../TestHTMLLanguageParser.java:70-95),
- ``testMetaHTMLParsing`` — the three markup docs (:38-44; the lang
  attribute case expects 'fi' as the test comments note Tika itself
  does not),
- ``testLanguageIndentifier`` — per-line (>256 chars, trimmed) and
  whole-file statistical identification over the Europarl corpus
  (:104-144). Here the profiles were trained on the EVEN lines
  (tools/build_lang_profiles.py) and these assertions run on the
  held-out ODD lines in tests/data/langid/golden/, so the statistical
  model is evaluated, not memorized.
Plus LanguageIndexingFilter semantics (:67-86) and the policy
combinator.
"""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from nutch_spark.ml.langid import (
    LANGUAGES_MAP,
    detect_language,
    extraction_policy,
    identify_language,
    identify_text,
    language_indexing_filter,
    parse_language,
    parse_language_col,
)

GOLDEN_DIR = Path(__file__).parent / "data" / "langid" / "golden"
GOLDEN_LANGS = ["da", "de", "el", "en", "es", "fi", "fr", "it", "nl", "pt"]

# TestHTMLLanguageParser.testParseLanguage's 44 vectors, verbatim
PARSE_VECTORS = [
    ("(SCHEME=ISO.639-1) sv", "sv"),
    ("(SCHEME=RFC1766) sv-FI", "sv"),
    ("(SCHEME=Z39.53) SWE", "sv"),
    ("EN_US, SV, EN, EN_UK", "en"),
    ("English Swedish", "en"),
    ("English, swedish", "en"),
    ("English,Swedish", "en"),
    ("Other (Svenska)", "sv"),
    ("SE", "se"),
    ("SV", "sv"),
    ("SV charset=iso-8859-1", "sv"),
    ("SV-FI", "sv"),
    ("SV; charset=iso-8859-1", "sv"),
    ("SVE", "sv"),
    ("SW", "sw"),
    ("SWE", "sv"),
    ("SWEDISH", "sv"),
    ("Sv", "sv"),
    ("Sve", "sv"),
    ("Svenska", "sv"),
    ("Swedish", "sv"),
    ("Swedish, svenska", "sv"),
    ("en, sv", "en"),
    ("sv", "sv"),
    ("sv, be, dk, de, fr, no, pt, ch, fi, en", "sv"),
    ("sv,en", "sv"),
    ("sv-FI", "sv"),
    ("sv-SE", "sv"),
    ("sv-en", "sv"),
    ("sv-fi", "sv"),
    ("sv-se", "sv"),
    ("sv; Content-Language: sv", "sv"),
    ("sv_SE", "sv"),
    ("sve", "sv"),
    ("svenska, swedish, engelska, english", "sv"),
    ("sw", "sw"),
    ("swe", "sv"),
    ("swe.SPR.", "sv"),
    ("sweden", "sv"),
    ("swedish", "sv"),
    ("swedish,", "sv"),
    ("text/html; charset=sv-SE", "sv"),
    ("text/html; sv", "sv"),
    ("torp, stuga, uthyres, bed & breakfast", None),
]


def test_parse_language_goldens():
    for raw, expected in PARSE_VECTORS:
        assert parse_language(raw) == expected, raw


def test_parse_language_col_matches_python(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(PARSE_VECTORS)],
                               "i int, raw string")
    got = {
        r["i"]: r["lang"]
        for r in df.select("i", parse_language_col(F.col("raw")).alias("lang")).collect()
    }
    for i, (raw, expected) in enumerate(PARSE_VECTORS):
        assert got[i] == expected, raw


def test_languages_map_includes_self_codes():
    assert LANGUAGES_MAP["en"] == "en"
    assert LANGUAGES_MAP["swedish"] == "sv"
    assert LANGUAGES_MAP["dut"] == "nl"


# --- testMetaHTMLParsing (:38-44) -------------------------------------------

META_DOCS = [
    ('<html lang="fi"><head>document 1 title</head>'
     "<body>jotain suomeksi</body></html>", "fi"),
    ('<html><head><meta http-equiv="content-language" content="en">'
     "<title>document 2 title</head><body>this is english</body></html>", "en"),
    ('<html><head><meta name="dc.language" content="en">'
     "<title>document 3 title</head><body>this is english</body></html>", "en"),
]


def test_meta_html_parsing(spark):
    df = spark.createDataFrame(
        [(i, html) for i, (html, _) in enumerate(META_DOCS)], "i int, html string"
    )
    got = {r["i"]: r["lang_detected"] for r in detect_language(df).collect()}
    for i, (_, expected) in enumerate(META_DOCS):
        assert got[i] == expected


def test_detect_precedence_attr_over_meta(spark):
    # LanguageParser: htmlAttribute > dublinCore > httpEquiv
    html = ('<html lang="de"><head><meta name="dc.language" content="fr">'
            '<meta http-equiv="content-language" content="en"></head></html>')
    df = spark.createDataFrame([(html,)], "html string")
    assert detect_language(df).collect()[0]["lang_detected"] == "de"


def test_detect_header_fallback(spark):
    df = spark.createDataFrame([("<html><body>x</body></html>", "pt")],
                               "html string, content_language string")
    got = detect_language(df, header_col="content_language").collect()[0]
    assert got["lang_detected"] == "pt"


# --- testLanguageIndentifier on the held-out halves -------------------------


@pytest.mark.parametrize("lang", GOLDEN_LANGS)
def test_identify_language_heldout_lines(lang):
    lines = (GOLDEN_DIR / f"{lang}.txt").read_text(encoding="utf-8").splitlines()
    checked = 0
    for line in lines:
        line = line.strip()
        if len(line) > 256:  # the reference's per-line threshold
            assert identify_text(line) == lang, line[:80]
            checked += 1
    assert checked > 0
    # whole-file identification, as the reference test also asserts
    assert identify_text("\n".join(lines)) == lang


def test_identify_language_dataframe(spark):
    rows = []
    for lang in GOLDEN_LANGS:
        text = (GOLDEN_DIR / f"{lang}.txt").read_text(encoding="utf-8")
        rows.append((lang, text[:2000]))
    df = spark.createDataFrame(rows, "expected string, text string")
    out = identify_language(df).collect()
    for r in out:
        assert r["lang_pred"] == r["expected"]


def test_identify_max_length_and_nulls(spark):
    # lang.analyze.max.length truncates before analysis
    text = ("tämä on suomenkielinen teksti joka jatkuu ja jatkuu " * 10
            + " this is a long english tail that would win without truncation" * 40)
    assert identify_text(text, max_length=400) == "fi"
    assert identify_text(text) == "en"
    assert identify_text(None) is None
    assert identify_text("") is None
    assert identify_text("123 456 !!!") is None


# --- LanguageIndexingFilter (:67-86) ----------------------------------------


def test_language_indexing_filter_unknown_and_allowlist(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, ""), (4, "fi")], "doc_id int, lang string"
    )
    out = {r["doc_id"]: r["lang"] for r in language_indexing_filter(df).collect()}
    assert out == {1: "en", 2: "unknown", 3: "unknown", 4: "fi"}
    kept = language_indexing_filter(df, allowed=("en", "unknown")).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3]


def test_extraction_policy_order(spark):
    df = spark.createDataFrame([("de", "fr"), (None, "fr")], "d string, i string")
    first_detect = df.select(
        extraction_policy(F.col("d"), F.col("i")).alias("lang")
    ).collect()
    assert [r["lang"] for r in first_detect] == ["de", "fr"]
    first_identify = df.select(
        extraction_policy(F.col("d"), F.col("i"), policy=("identify", "detect")).alias("lang")
    ).collect()
    assert [r["lang"] for r in first_identify] == ["fr", "fr"]
    with pytest.raises(ValueError):
        extraction_policy(F.col("d"), F.col("i"), policy=("detect", "bogus"))
