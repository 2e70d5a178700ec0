"""Language identification — parity with the reference's
language-identifier plugin (T-coverage of VERDICT r02 missing #2).

Reference surface (all in ``src/plugin/language-identifier/``):

- ``HTMLLanguageParser.LanguageParser.parseLanguage`` (:289-312):
  normalize a free-form language string (HTTP header / meta tag value)
  to an ISO-639-1 primary code via the ``langmappings.properties``
  alias table — split multi-valued strings on ``,| |;|\\.|\\(|\\)|=``,
  take each token's primary subtag (before ``-``/``_``), return the
  first alias hit.
- the DOM walk (:224-283): html ``lang`` attribute > ``dc.language``
  meta > ``http-equiv content-language`` meta, each normalized through
  parseLanguage; then the raw ``Content-Language`` response header
  (:137-139). Re-expressed here as JVM ``regexp_extract`` over the
  stored markup (documented deviation: regex scan, not a DOM walk —
  identical on well-formed markup, and this engine stores page source
  as a column, not a DOM).
- statistical identification (:168-181): the reference delegates to
  Tika's OptimaizeLangDetector; this repo ships its own char-trigram
  profiles (``lang_profiles.json``, built by
  ``tools/build_lang_profiles.py`` from the plugin's Europarl test
  corpus — trained on even lines, golden-tested on the held-out odd
  lines). Classification = cosine-style dot product of the document's
  trigram counts against each language's L2-normalized top-300
  profile, ties broken by ascending code.
- ``LanguageIndexingFilter`` (:67-86): ``lang`` field = detected
  language else ``"unknown"``; when ``lang.index.languages`` is set,
  documents in other languages are dropped.
- policy combinator (HTMLLanguageParser.filter:98-115):
  ``lang.extraction.policy`` orders detect (metadata) vs identify
  (statistical) attempts.

Scale: parse/detect are pure JVM column expressions (the alias map is
a constant-folded literal); identify is an Arrow-batched pandas UDF —
a narrow map with ZERO shuffle, the profiles (~11x300 floats)
serialized once per executor in the UDF closure. The JVM alternative
(explode trigrams + broadcast-join profiles + re-aggregate by doc)
costs a full shuffle on doc_id at 100 TB for no accuracy gain, so the
UDF is the *better* distributed plan here, not the fallback.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ISO-639 alias table — data parity with langmappings.properties
# (common erroneous codes + ISO-639-2 + English names -> two-letter code;
# quirks like the 'yi=yidYiddish' missing-comma line kept verbatim)
# ---------------------------------------------------------------------------

LANG_MAPPINGS: dict[str, tuple[str, ...]] = {
    "aa": ('aar', 'Afar'),
    "ab": ('abk', 'Abkhazian'),
    "ae": ('ave',),
    "af": ('afr', 'Afrikaans'),
    "ak": ('aka',),
    "am": ('amh', 'Amharic'),
    "an": ('arg',),
    "ar": ('ara', 'Arabic'),
    "as": ('asm', 'Assamese'),
    "av": ('ava',),
    "ay": ('aym', 'Aymara'),
    "az": ('aze', 'Azerbaijani'),
    "ba": ('bak', 'Bashkir'),
    "be": ('bel', 'Byelorussian'),
    "bg": ('bul', 'Bulgarian'),
    "bh": ('bih', 'Bihari'),
    "bi": ('bis', 'Bislama'),
    "bm": ('bam',),
    "bn": ('ben', 'Bengali'),
    "bo": ('bod', 'tib', 'Tibetan'),
    "br": ('bre', 'Breton'),
    "bs": ('bos',),
    "ca": ('cat', 'Catalan'),
    "ce": ('che',),
    "ch": ('cha',),
    "co": ('cos', 'Corsican'),
    "cr": ('cre',),
    "cs": ('ces', 'cze', 'Czech'),
    "cu": ('chu',),
    "cv": ('chv',),
    "cy": ('cym', 'wel', 'Welsh'),
    "da": ('dan', 'Danish'),
    "de": ('deu', 'ger', 'German'),
    "dv": ('div',),
    "dz": ('dzo', 'Dzongkha'),
    "ee": ('ewe',),
    "el": ('ell', 'gre', 'Greek'),
    "en": ('eng', 'English'),
    "eo": ('epo', 'Esperanto'),
    "es": ('esl', 'spa', 'Spanish'),
    "et": ('est', 'Estonian'),
    "eu": ('baq', 'eus', 'Basque'),
    "fa": ('fas', 'per', 'Persian'),
    "ff": ('ful',),
    "fi": ('fin', 'Finnish'),
    "fj": ('fij', 'Fijian'),
    "fo": ('fao', 'Faroese'),
    "fr": ('fra', 'fre', 'French'),
    "fy": ('fry', 'Frisian'),
    "ga": ('gai', 'iri', 'Irish'),
    "gd": ('gla',),
    "gl": ('glg', 'Gallegan'),
    "gn": ('grn', 'Guarani'),
    "gu": ('guj', 'Gujarati'),
    "gv": ('glv',),
    "ha": ('hau', 'Hausa'),
    "he": ('heb', 'Hebrew'),
    "hi": ('hin', 'Hindi'),
    "ho": ('hmo',),
    "hr": ('scr', 'hrv', 'Croatian'),
    "ht": ('hat',),
    "hu": ('hun', 'Hungarian'),
    "hy": ('arm', 'hye', 'Armenian'),
    "hz": ('her',),
    "ia": ('ina', 'Interlingua'),
    "id": ('ind', 'Indonesian'),
    "ie": ('ile',),
    "ig": ('ibo',),
    "ii": ('iii',),
    "ik": ('ipk', 'Inupiak'),
    "io": ('ido',),
    "is": ('ice', 'isl', 'Icelandic'),
    "it": ('ita', 'Italian'),
    "iu": ('iku', 'Inuktitut'),
    "ja": ('jpn', 'Japanese'),
    "jv": ('jw', 'jav', 'jaw', 'Javanese'),
    "ka": ('geo', 'kat', 'Georgian'),
    "kg": ('kon',),
    "ki": ('kik',),
    "kj": ('kua',),
    "kk": ('kaz', 'Kazakh'),
    "kl": ('kal', 'Greenlandic'),
    "km": ('khm', 'Khmer'),
    "kn": ('kan', 'Kannada'),
    "ko": ('kor', 'Korean'),
    "kr": ('kau',),
    "ks": ('kas', 'Kashmiri'),
    "ku": ('kur', 'Kurdish'),
    "kv": ('kom',),
    "kw": ('cor',),
    "ky": ('kir', 'Kirghiz'),
    "la": ('lat', 'Latin'),
    "lb": ('ltz',),
    "lg": ('lug',),
    "li": ('lim',),
    "ln": ('lin', 'Lingala'),
    "lo": ('lao', 'Lao'),
    "lt": ('lit', 'Lithuanian'),
    "lu": ('lub',),
    "lv": ('lav', 'Latvian'),
    "mg": ('mlg', 'Malagasy'),
    "mh": ('mah',),
    "mi": ('mao', 'mri', 'Maori'),
    "mk": ('mac', 'mak', 'Macedonian'),
    "ml": ('mal', 'mlt', 'Maltese'),
    "mn": ('mon', 'Mongolian'),
    "mo": ('mol', 'Moldavian'),
    "mr": ('mar', 'Marathi'),
    "ms": ('may', 'msa', 'Malay'),
    "mt": ('mlt',),
    "my": ('bur', 'mya', 'Burmese'),
    "na": ('nau', 'Nauru'),
    "nb": ('nob',),
    "nd": ('nde',),
    "ne": ('nep', 'Nepali'),
    "ng": ('ndo',),
    "nl": ('dut', 'nla', 'Dutch'),
    "nn": ('nno',),
    "no": ('nor', 'Norwegian'),
    "nr": ('nbl',),
    "nv": ('nav',),
    "ny": ('nya',),
    "oc": ('oci', "Langue d'Oc"),
    "oj": ('oji',),
    "om": ('orm', 'Oromo'),
    "or": ('ori', 'Oriya'),
    "os": ('oss',),
    "pa": ('pan', 'Panjabi'),
    "pi": ('pli',),
    "pl": ('pol', 'Polish'),
    "ps": ('pus', 'Pushto'),
    "pt": ('por', 'Portuguese'),
    "qu": ('que', 'Quechua'),
    "rm": ('roh', 'Rhaeto-Romance'),
    "rn": ('run', 'Rundi'),
    "ro": ('ron', 'rum', 'Romanian'),
    "ru": ('rus', 'Russian'),
    "rw": ('kin', 'Kinyarwanda'),
    "sa": ('san', 'Sanskrit'),
    "sc": ('srd',),
    "sd": ('snd', 'Sindhi'),
    "se": ('sme',),
    "sg": ('sag', 'Sango'),
    "sh": ('scr', 'Serbo-Croatian'),
    "si": ('sin', 'Singhalese'),
    "sk": ('slk', 'slo', 'Slovak'),
    "sl": ('slv', 'Slovenian'),
    "sm": ('smo', 'Samoan'),
    "sn": ('sna', 'Shona'),
    "so": ('som', 'Somali'),
    "sq": ('alb', 'sqi', 'Albanian'),
    "sr": ('scc', 'srp', 'Serbian'),
    "ss": ('ssw', 'Siswant'),
    "st": ('sot', 'Sotho'),
    "su": ('sun', 'Sudanese'),
    "sv": ('sve', 'swe', 'Swedish', 'Svenska', 'Sweden'),
    "sw": ('swa', 'Swahili'),
    "ta": ('tam', 'Tamil'),
    "te": ('tel', 'Telugu'),
    "tg": ('tgk', 'Tajik'),
    "th": ('tha', 'Thai'),
    "ti": ('tir', 'Tigrinya'),
    "tk": ('tuk', 'Turkmen'),
    "tl": ('tgl', 'Tagalog'),
    "tn": ('tsn', 'Tswana'),
    "to": ('tog', 'Tonga'),
    "tr": ('tur', 'Turkish'),
    "ts": ('tso', 'Tsonga'),
    "tt": ('tat', 'Tatar'),
    "tw": ('twi', 'Twi'),
    "ty": ('tah',),
    "ug": ('uig', 'Uighur'),
    "uk": ('ukr', 'Ukrainian'),
    "ur": ('urd', 'Urdu'),
    "uz": ('uzb', 'Uzbek'),
    "ve": ('ven',),
    "vi": ('vie', 'Vietnamese'),
    "vo": ('vol', 'Volapk'),
    "wa": ('wln',),
    "wo": ('wol', 'Wolof'),
    "xh": ('xho', 'Xhosa'),
    "yi": ('yidYiddish',),
    "yo": ('yor', 'Yoruba'),
    "za": ('zha', 'Zhuang'),
    "zh": ('chi', 'zho', 'Chinese'),
    "zu": ('zul', 'Zulu'),
}

LANGUAGES_MAP: dict[str, str] = {}
for _code, _aliases in LANG_MAPPINGS.items():
    LANGUAGES_MAP[_code] = _code
    for _a in _aliases:
        LANGUAGES_MAP[_a.strip().lower()] = _code

# the reference splits with String.split(",| |;|\\.|\\(|\\)|=", -1)
_SPLIT_PATTERN = r"[, ;.()=]"
_SPLIT_RE = re.compile(_SPLIT_PATTERN)


def parse_language(lang: str | None) -> str | None:
    """Python twin of parseLanguage (HTMLLanguageParser.java:289-312):
    first token whose primary subtag maps to an ISO-639-1 code."""
    if lang is None:
        return None
    for token in _SPLIT_RE.split(lang):
        code = token.split("-")[0].split("_")[0]
        hit = LANGUAGES_MAP.get(code.lower())
        if hit is not None:
            return hit
    return None


def _lang_map_literal() -> Column:
    """The alias table as a map literal — all-literal children, so
    Catalyst constant-folds it to a single map value at plan time."""
    pairs: list[Column] = []
    for k in sorted(LANGUAGES_MAP):
        pairs.append(F.lit(k))
        pairs.append(F.lit(LANGUAGES_MAP[k]))
    return F.create_map(*pairs)


def parse_language_col(lang: Column) -> Column:
    """JVM column form of parseLanguage: split, strip subtags, first
    alias-table hit (NULL when nothing maps)."""
    m = _lang_map_literal()
    toks = F.split(F.coalesce(lang, F.lit("")), _SPLIT_PATTERN, -1)
    mapped = F.transform(
        toks,
        lambda t: F.element_at(
            m,
            F.lower(
                F.split_part(F.split_part(t, F.lit("-"), F.lit(1)), F.lit("_"), F.lit(1))
            ),
        ),
    )
    return F.get(F.filter(mapped, lambda x: x.isNotNull()), 0)


def lang_map_sql() -> str:
    """DuckDB map-literal fragment of the same alias table, for oracle
    parity in ``__spark_entry__.oracle_sql``."""
    keys = ", ".join("'{}'".format(k.replace("'", "''")) for k in sorted(LANGUAGES_MAP))
    vals = ", ".join(f"'{LANGUAGES_MAP[k]}'" for k in sorted(LANGUAGES_MAP))
    return f"map([{keys}], [{vals}])"


def parse_language_sql(expr: str) -> str:
    """DuckDB fragment applying parseLanguage to a SQL expression."""
    # DuckDB map[key] yields a LIST ([] on miss) — the trailing [1]
    # unwraps it to the scalar / NULL
    return (
        "list_filter(list_transform("
        f"regexp_split_to_array(coalesce({expr}, ''), '[, ;.()=]'), "
        f"t -> {lang_map_sql()}["
        "lower(string_split(string_split(t, '-')[1], '_')[1])][1]"
        "), x -> x IS NOT NULL)[1]"
    )


# ---------------------------------------------------------------------------
# markup signals + detect path (HTMLLanguageParser DOM walk :224-283)
# ---------------------------------------------------------------------------

_LANG_ATTR = r"(?i)<[a-zA-Z][^>]*\slang\s*=\s*[\"']([^\"']*)[\"']"
_DC_META_NC = (
    r"(?i)<meta[^>]*\sname\s*=\s*[\"']dc\.language[\"']"
    r"[^>]*\scontent\s*=\s*[\"']([^\"']*)[\"']"
)
_DC_META_CN = (
    r"(?i)<meta[^>]*\scontent\s*=\s*[\"']([^\"']*)[\"']"
    r"[^>]*\sname\s*=\s*[\"']dc\.language[\"']"
)
_EQUIV_NC = (
    r"(?i)<meta[^>]*\shttp-equiv\s*=\s*[\"']content-language[\"']"
    r"[^>]*\scontent\s*=\s*[\"']([^\"']*)[\"']"
)
_EQUIV_CN = (
    r"(?i)<meta[^>]*\scontent\s*=\s*[\"']([^\"']*)[\"']"
    r"[^>]*\shttp-equiv\s*=\s*[\"']content-language[\"']"
)


def _first_match(html: Column, *patterns: str) -> Column:
    hits = [F.regexp_extract(html, p, 1) for p in patterns]
    out = F.lit(None).cast("string")
    for h in reversed(hits):
        out = F.when(h != "", h).otherwise(out)
    return out


def extract_lang_signals(html: Column) -> dict[str, Column]:
    """The three markup signals the reference's NodeWalker collects
    (first occurrence each, attribute order-insensitive for metas)."""
    h = F.coalesce(html, F.lit(""))
    return {
        "lang_attr": _first_match(h, _LANG_ATTR),
        "dc_language": _first_match(h, _DC_META_NC, _DC_META_CN),
        "http_equiv_lang": _first_match(h, _EQUIV_NC, _EQUIV_CN),
    }


def detect_language_col(
    lang_attr: Column,
    dc_language: Column,
    http_equiv_lang: Column,
    content_language_header: Column | None = None,
) -> Column:
    """detectLanguage (:126-140): LanguageParser precedence html lang
    attribute > dc.language > http-equiv, each through parseLanguage;
    then the raw Content-Language response header as last resort.
    Deviation: the reference first consults Tika-prepopulated parse
    metadata (raw, un-normalized); this engine has no Tika stage, so
    the markup walk IS the first source."""
    detected = F.coalesce(
        parse_language_col(lang_attr),
        parse_language_col(dc_language),
        parse_language_col(http_equiv_lang),
    )
    if content_language_header is not None:
        detected = F.coalesce(detected, content_language_header)
    return detected


def detect_language(df: DataFrame, html_col: str = "html",
                    header_col: str | None = None,
                    out_col: str = "lang_detected") -> DataFrame:
    sig = extract_lang_signals(F.col(html_col))
    header = F.col(header_col) if header_col else None
    return df.withColumn(
        out_col,
        detect_language_col(
            sig["lang_attr"], sig["dc_language"], sig["http_equiv_lang"], header
        ),
    )


# ---------------------------------------------------------------------------
# statistical identification (HTMLLanguageParser.identifyLanguage :142-181)
# ---------------------------------------------------------------------------

_PROFILE_PATH = Path(__file__).with_name("lang_profiles.json")
_PROFILES: dict[str, dict[str, float]] = json.loads(
    _PROFILE_PATH.read_text(encoding="utf-8")
)


def _normalize(text: str) -> str:
    """Lockstep with tools/build_lang_profiles.normalize AND the
    lang_identify oracle SQL: lowercase, Unicode letters only,
    separator runs -> single space, single-space padding."""
    out = []
    prev_space = True
    for ch in text.lower():
        if ch.isalpha():
            out.append(ch)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    s = "".join(out).strip()
    return f" {s} " if s else ""


def identify_text(
    text: str | None,
    max_length: int | None = None,
    profiles: dict[str, dict[str, float]] | None = None,
) -> str | None:
    """Python scoring core (also the pandas-UDF kernel): dot product of
    the text's trigram counts against each L2-normalized profile,
    rounded to 9 decimals before the argmax so the DuckDB oracle's
    different summation order can't flip near-ties; ties break to the
    ascending language code. ``max_length`` mirrors
    ``lang.analyze.max.length`` (:160-162)."""
    if text is None:
        return None
    if max_length is not None and max_length >= 0:
        text = text[:max_length]
    profs = profiles if profiles is not None else _PROFILES
    n = _normalize(text)
    if len(n) < 3:
        return None
    tf: dict[str, int] = {}
    for i in range(len(n) - 2):
        g = n[i : i + 3]
        tf[g] = tf.get(g, 0) + 1
    best_lang, best_score = None, 0.0
    for lang in sorted(profs):
        w = profs[lang]
        score = round(sum(c * w.get(g, 0.0) for g, c in tf.items()), 9)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def identify_language(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    max_length: int | None = None,
) -> DataFrame:
    """Statistical language ID over a text column — Arrow-batched
    pandas UDF, zero shuffle (see module docstring for why this beats
    the explode+join JVM alternative at scale)."""
    profiles = _PROFILES
    ml = max_length

    @F.pandas_udf("string")
    def _identify(s: pd.Series) -> pd.Series:
        return s.map(lambda t: identify_text(t, ml, profiles))

    return df.withColumn(out_col, _identify(F.col(text_col)))


def profile_sql_values(table_alias: str = "prof") -> str:
    """The shipped profiles as a DuckDB VALUES relation
    ``(lang, gram, w)`` — lets oracle_sql replay the exact dot-product
    scoring of ``identify_text`` in ANSI SQL."""
    rows = []
    for lang in sorted(_PROFILES):
        for g, w in sorted(_PROFILES[lang].items()):
            esc = g.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {w!r})")
    return f"(VALUES {', '.join(rows)}) AS {table_alias}(lang, gram, w)"


# ---------------------------------------------------------------------------
# policy combinator + indexing filter
# ---------------------------------------------------------------------------

def extraction_policy(
    detect: Column, identify: Column, policy: tuple[str, ...] = ("detect", "identify")
) -> Column:
    """HTMLLanguageParser.filter (:98-115): try the policy's sources in
    order, fall through on null (``lang.extraction.policy``)."""
    cols = []
    for p in policy:
        if p == "detect":
            cols.append(detect)
        elif p == "identify":
            cols.append(identify)
        else:
            raise ValueError(f"extraction_policy: unknown source {p!r}")
    if not cols:
        raise ValueError("extraction_policy: empty policy")
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def language_indexing_filter(
    docs: DataFrame,
    lang_col: str = "lang",
    allowed: tuple[str, ...] = (),
    out_col: str = "lang",
) -> DataFrame:
    """LanguageIndexingFilter (:67-86): the indexed ``lang`` field
    defaults to 'unknown' for null/empty; with ``lang.index.languages``
    set, other-language documents are dropped (return null)."""
    src = F.col(lang_col)
    lang = F.when(
        src.isNull() | (F.length(src) == 0), F.lit("unknown")
    ).otherwise(src)
    out = docs.withColumn(out_col, lang)
    if allowed:
        out = out.filter(F.col(out_col).isin(*allowed))
    return out
