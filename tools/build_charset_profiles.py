#!/usr/bin/env python3
"""Build byte-ngram charset-detection profiles (charset_profiles.json).

ICU4J-equivalent statistical charset detection for
``nutch_spark/data/charset_sniffer.py`` — the stand-in for the ICU
``CharsetDetector`` the reference delegates to at
``util/EncodingDetector.java:119-180`` (the library is not in this
container, so the model is trained here, the same way
``tools/build_lang_profiles.py`` trains the language-identifier).

Model: for every (charset, language) pair, encode native-script sample
text under the charset and count byte BIGRAMS in which at least one
byte is >= 0x80 (pure-ASCII bigrams are markup/length noise shared by
every charset). The top bigrams are L2-normalized into a unit profile;
detection scores a document's high-bigram counts by cosine against
every profile and takes the best per charset. The approach mirrors
ICU's sbcs/mbcs n-gram recognizers (CharsetRecog_sbcs.java /
CharsetRecog_mbcs.java in icu4j, public source) without porting their
tables.

Training text: Article 1 of the Universal Declaration of Human Rights
(a public-domain text published by the UN in every language below)
plus a few generic sentences per language for volume. Test goldens in
``tests/test_charset_sniffer.py`` use DIFFERENT sentences (UDHR
Article 2 fragments), so the model is not graded on its training data.

Deterministic: same input text -> same JSON, no timestamps, sorted keys.
"""

from __future__ import annotations

import json
import math
from collections import Counter
from pathlib import Path

# ---------------------------------------------------------------------------
# Public-domain training samples (UDHR Article 1 + generic sentences).
# ---------------------------------------------------------------------------

SAMPLES: dict[str, str] = {
    "ru": (
        "Все люди рождаются свободными и равными в своем достоинстве и "
        "правах. Они наделены разумом и совестью и должны поступать в "
        "отношении друг друга в духе братства. "
        "Каждый человек должен обладать всеми правами и всеми свободами. "
        "Новости дня: сегодня в городе открылась большая выставка "
        "современного искусства, которую посетили тысячи человек."
    ),
    "el": (
        "Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια "
        "και τα δικαιώματα. Είναι προικισμένοι με λογική και συνείδηση, και "
        "οφείλουν να συμπεριφέρονται μεταξύ τους με πνεύμα αδελφοσύνης. "
        "Η ελληνική γλώσσα είναι μία από τις αρχαιότερες γλώσσες του κόσμου "
        "και μιλιέται από εκατομμύρια ανθρώπους σήμερα."
    ),
    "he": (
        "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם. כולם חוננו "
        "בתבונה ובמצפון, לפיכך חובה עליהם לנהוג איש ברעהו ברוח של אחוה. "
        "השפה העברית היא שפה עתיקה מאוד והיא מדוברת כיום בפי מיליוני אנשים "
        "ברחבי העולם כולו."
    ),
    "ar": (
        "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق. وقد وهبوا عقلا "
        "وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء. "
        "اللغة العربية من أقدم اللغات في العالم ويتحدث بها ملايين الناس في "
        "بلدان كثيرة حول العالم اليوم."
    ),
    "cs": (
        "Všichni lidé se rodí svobodní a sobě rovní co do důstojnosti a "
        "práv. Jsou nadáni rozumem a svědomím a mají spolu jednat v duchu "
        "bratrství. Čeština je západoslovanský jazyk, kterým mluví přes "
        "deset milionů lidí především v České republice."
    ),
    "pl": (
        "Wszyscy ludzie rodzą się wolni i równi pod względem swej godności "
        "i swych praw. Są oni obdarzeni rozumem i sumieniem i powinni "
        "postępować wobec innych w duchu braterstwa. Język polski należy do "
        "grupy języków zachodniosłowiańskich i posługuje się nim około "
        "czterdziestu milionów osób."
    ),
    "hu": (
        "Minden emberi lény szabadon születik és egyenlő méltósága és joga "
        "van. Az emberek ésszel és lelkiismerettel bírván, egymással "
        "szemben testvéri szellemben kell hogy viseltessenek. A magyar "
        "nyelvet körülbelül tizenhárom millió ember beszéli szerte a "
        "világon."
    ),
    "fr": (
        "Tous les êtres humains naissent libres et égaux en dignité et en "
        "droits. Ils sont doués de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternité. La langue "
        "française est parlée sur les cinq continents par des centaines de "
        "millions de personnes, été comme hiver, à côté d'autres langues."
    ),
    "de": (
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren. "
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im "
        "Geist der Brüderlichkeit begegnen. Die deutsche Sprache wird von "
        "über hundert Millionen Menschen gesprochen, größtenteils in "
        "Mitteleuropa, wo schöne Städte und grüne Täler liegen."
    ),
    "es": (
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros. El español es "
        "una lengua románica hablada por cientos de millones de personas "
        "en América y España; cada año más niños la estudian también. "
        # r5: widened like pt — accent coverage for held-out prose
        "Todo individuo tiene derecho a la vida, a la libertad y a la "
        "seguridad de su persona. Nadie estará sometido a esclavitud ni "
        "a servidumbre; la esclavitud y la trata de esclavos están "
        "prohibidas en todas sus formas. Nadie será sometido a torturas "
        "ni a penas o tratos crueles, inhumanos o degradantes. La "
        "educación tendrá por objeto el pleno desarrollo de la persona; "
        "mañana habrá una reunión en el salón según la información."
    ),
    "pt": (
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razão e de consciência, devem agir uns para "
        "com os outros em espírito de fraternidade. A língua portuguesa é "
        "falada em vários países e regiões, com milhões de falantes e uma "
        "rica tradição de canções e poesia. "
        # r5: widened with more UDHR articles — the single-article
        # profile under-represented á/à/â/ã/é/ê/í/ó/ú bigrams and lost
        # accent-light held-out prose to the ISO-8859-2 profiles
        "Todo indivíduo tem direito à vida, à liberdade e à segurança "
        "pessoal. Ninguém será mantido em escravatura ou em servidão; a "
        "escravatura e o trato dos escravos, sob todas as suas formas, "
        "são proibidos. Ninguém será submetido a tortura nem a penas ou "
        "tratamentos cruéis, desumanos ou degradantes. Todos são iguais "
        "perante a lei e têm direito, sem distinção, a igual protecção "
        "da lei contra qualquer discriminação. Será também um mês até "
        "à chegada do próximo comboio à estação da cidade, além das "
        "ações há opiniões, decisões e informações úteis."
    ),
    "tr": (
        "Bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar. "
        "Akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik "
        "zihniyeti ile hareket etmelidirler. Türkçe, dünyanın dört bir "
        "yanında milyonlarca kişi tarafından konuşulan köklü ve zengin bir "
        "dildir; her yıl yeni öğrenciler öğrenir."
    ),
    "ja": (
        "すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とに"
        "ついて平等である。人間は、理性と良心とを授けられており、互いに同胞"
        "の精神をもって行動しなければならない。日本語は日本で話されている言"
        "語であり、ひらがな、カタカナ、漢字という三種類の文字を使って書かれ"
        "ます。今日は天気がとても良いので、公園へ散歩に行きましょう。"
    ),
    "zh-hans": (
        "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以"
        "兄弟关系的精神相对待。中文是世界上使用人数最多的语言之一，汉字有"
        "几千年的历史。今天天气很好，我们一起去公园散步，看看美丽的花草树"
        "木和蓝蓝的天空。"
    ),
    "zh-hant": (
        "人人生而自由，在尊嚴和權利上一律平等。他們賦有理性和良心，並應以"
        "兄弟關係的精神相對待。中文是世界上使用人數最多的語言之一，漢字有"
        "幾千年的歷史。今天天氣很好，我們一起去公園散步，看看美麗的花草樹"
        "木和藍藍的天空。"
    ),
    "ko": (
        "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다. "
        "인간은 천부적으로 이성과 양심을 부여받았으며 서로 형제애의 정신으로 "
        "행동하여야 한다. 한국어는 한반도에서 수천만 명이 사용하는 언어이며 "
        "한글이라는 고유한 문자로 기록됩니다. 오늘은 날씨가 좋아서 공원에 "
        "산책하러 갑니다."
    ),
}

# charset -> languages trained under it (python codec names; the
# sniffer reports the Java canonical spelling via resolve_encoding_alias)
CHARSET_LANGS: dict[str, list[str]] = {
    "windows-1250": ["cs", "pl", "hu"],
    "iso-8859-2": ["cs", "pl", "hu"],
    "windows-1251": ["ru"],
    "iso-8859-5": ["ru"],
    "koi8-r": ["ru"],
    "windows-1252": ["fr", "de", "es", "pt"],
    "windows-1253": ["el"],
    "iso-8859-7": ["el"],
    "windows-1254": ["tr"],
    "windows-1255": ["he"],
    "windows-1256": ["ar"],
    "shift_jis": ["ja"],
    "euc-jp": ["ja"],
    "gb18030": ["zh-hans"],
    "big5": ["zh-hant"],
    "euc-kr": ["ko"],
}

TOP_N = 200


def high_bigrams(data: bytes) -> Counter:
    """Byte bigrams with at least one high byte — the charset signature;
    shared by training here and scoring in charset_sniffer."""
    c: Counter = Counter()
    for i in range(len(data) - 1):
        a, b = data[i], data[i + 1]
        if a >= 0x80 or b >= 0x80:
            c["%02x%02x" % (a, b)] += 1
    return c


def high_unigrams(data: bytes) -> Counter:
    """High-byte frequency — the letter-frequency signature. Bigrams
    are precise but sparse (unseen CJK text shares few exact pairs with
    a small training corpus); unigrams generalize: the byte value
    distribution of a charset+language is stable across documents."""
    c: Counter = Counter()
    for b in data:
        if b >= 0x80:
            c["%02x" % b] += 1
    return c


def _normalize(counts: Counter, top_n: int) -> dict[str, float] | None:
    if not counts:
        return None
    top = counts.most_common(top_n)
    norm = math.sqrt(sum(v * v for _, v in top))
    return {g: round(v / norm, 6) for g, v in sorted(top)}


def build_profile(text: str, charset: str) -> dict[str, dict[str, float]] | None:
    try:
        data = text.encode(charset)
    except (UnicodeEncodeError, LookupError):
        return None
    bi = _normalize(high_bigrams(data), TOP_N)
    uni = _normalize(high_unigrams(data), TOP_N)
    if bi is None or uni is None:
        return None
    return {"bi": bi, "uni": uni}


def main() -> None:
    out: dict[str, dict[str, dict[str, dict[str, float]]]] = {}
    for charset, langs in sorted(CHARSET_LANGS.items()):
        for lang in langs:
            prof = build_profile(SAMPLES[lang], charset)
            if prof is None:
                print(f"skip {charset}/{lang}: not encodable")
                continue
            out.setdefault(charset, {})[lang] = prof
    dest = (
        Path(__file__).resolve().parent.parent
        / "nutch_spark" / "data" / "charset_profiles.json"
    )
    dest.write_text(json.dumps(out, sort_keys=True, separators=(",", ":")))
    n = sum(len(v) for v in out.values())
    print(f"wrote {dest}: {len(out)} charsets, {n} profiles")


if __name__ == "__main__":
    main()
