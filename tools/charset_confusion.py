"""Held-out confusion-matrix report for the statistical charset
sniffer (``nutch_spark/data/charset_sniffer.py``).

Evaluates every trained charset (the 16 in
``tools/build_charset_profiles.CHARSET_LANGS``) over held-out
sentences — everyday prose composed for this report, disjoint from
both the UDHR training samples and the test-suite goldens — at several
truncation lengths, so the per-charset detection-rate claims behind
the calibrated confidence arms (100/80/70/30, see the sniffer module
docstring) are evidenced instead of asserted.

Writes ``BENCH/probes/charset_confusion.md`` (tables) and
``charset_confusion.json`` (raw records). Exact-match is the Java
canonical spelling; family-match folds the positional-lookalike pairs
(cp1250/ISO-8859-2, cp1253/ISO-8859-7 — either member decodes the
text to identical letters, same equivalence the goldens use).

Usage: python tools/charset_confusion.py [--out BENCH/probes]
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from build_charset_profiles import CHARSET_LANGS  # noqa: E402

from nutch_spark.data.charset_sniffer import detect_all  # noqa: E402

# held-out everyday prose (NOT UDHR, NOT the test goldens)
EVAL_TEXT: dict[str, str] = {
    "ru": (
        "Вчера вечером мы долго гуляли по набережной, разговаривали о "
        "книгах и музыке, а потом зашли в маленькое кафе выпить чаю с "
        "пирожными и посмотреть на огни старого города."
    ),
    "el": (
        "Χθες το απόγευμα περπατήσαμε στην παραλία, μιλήσαμε για τα "
        "βιβλία και τη μουσική, και μετά καθίσαμε σε ένα μικρό "
        "καφενείο να πιούμε καφέ βλέποντας τα φώτα της πόλης."
    ),
    "he": (
        "אתמול בערב טיילנו לאורך הטיילת, דיברנו על ספרים ומוזיקה, "
        "ואחר כך נכנסנו לבית קפה קטן לשתות תה ולראות את אורות העיר "
        "העתיקה מרחוק."
    ),
    "ar": (
        "في المساء مشينا طويلا على الكورنيش وتحدثنا عن الكتب والموسيقى "
        "ثم دخلنا مقهى صغيرا لنشرب الشاي وننظر إلى أضواء المدينة "
        "القديمة من بعيد."
    ),
    "cs": (
        "Včera večer jsme se dlouho procházeli po nábřeží, povídali si "
        "o knihách a hudbě a potom jsme zašli do malé kavárny na čaj a "
        "dívali se na světla starého města."
    ),
    "pl": (
        "Wczoraj wieczorem długo spacerowaliśmy po bulwarze, rozmawiając "
        "o książkach i muzyce, a potem weszliśmy do małej kawiarni na "
        "herbatę, patrząc na światła starego miasta."
    ),
    "hu": (
        "Tegnap este sokáig sétáltunk a rakparton, könyvekről és zenéről "
        "beszélgettünk, aztán beültünk egy kis kávézóba teázni, és néztük "
        "az óváros fényeit."
    ),
    "tr": (
        "Dün akşam rıhtımda uzun uzun yürüdük, kitaplardan ve müzikten "
        "konuştuk, sonra küçük bir kafeye girip çay içtik ve eski şehrin "
        "ışıklarını seyrettik."
    ),
    "fr": (
        "Hier soir, nous avons longuement marché le long du quai, parlé "
        "de livres et de musique, puis nous sommes entrés dans un petit "
        "café pour boire un thé en regardant les lumières de la vieille "
        "ville été déjà à côté."
    ),
    "de": (
        "Gestern Abend sind wir lange am Ufer entlanggegangen, haben "
        "über Bücher und Musik gesprochen und saßen später in einem "
        "kleinen Café, tranken Tee und schauten auf die Lichter der "
        "Altstadt hinüber."
    ),
    "es": (
        "Ayer por la noche caminamos largo rato por el malecón, hablando "
        "de libros y de música, y después entramos en un pequeño café a "
        "tomar té mientras mirábamos las luces de la ciudad antigua."
    ),
    "pt": (
        "Ontem à noite caminhámos longamente pela marginal, a conversar "
        "sobre livros e música, e depois entrámos num pequeno café para "
        "beber chá enquanto olhávamos as luzes da cidade antiga."
    ),
    "ja": (
        "昨日の夕方、私たちは川沿いの道を長い間歩きながら、本や音楽について"
        "話しました。それから小さな喫茶店に入ってお茶を飲み、旧市街の灯りを"
        "眺めて過ごしました。"
    ),
    "ko": (
        "어제 저녁 우리는 강변을 따라 오래 걸으며 책과 음악에 대해 "
        "이야기했습니다. 그리고 작은 찻집에 들어가 차를 마시며 옛 도시의 "
        "불빛을 바라보았습니다."
    ),
    "zh-hans": (
        "昨天傍晚我们沿着江边走了很久，聊着书和音乐，后来走进一家小茶馆，"
        "一边喝茶一边远远地望着老城的灯火，直到夜色完全降临才慢慢回家。"
    ),
    "zh-hant": (
        "昨天傍晚我們沿著江邊走了很久，聊著書與音樂，後來走進一家小茶館，"
        "一邊喝茶一邊遠遠地望著老城的燈火，直到夜色完全降臨才慢慢回家。"
    ),
}

# positional-lookalike families (same letters, either member decodes
# identically) — the same equivalence the held-out goldens use
FAMILY = {
    "windows-1250": {"windows-1250", "ISO-8859-2"},
    "iso-8859-2": {"windows-1250", "ISO-8859-2"},
    "windows-1253": {"windows-1253", "ISO-8859-7"},
    "iso-8859-7": {"windows-1253", "ISO-8859-7"},
}

# Java canonical report spelling per trained codec
_CANON = {
    "iso-8859-2": "ISO-8859-2", "iso-8859-5": "ISO-8859-5",
    "iso-8859-7": "ISO-8859-7", "koi8-r": "KOI8-R",
    "shift_jis": "Shift_JIS", "euc-jp": "EUC-JP", "euc-kr": "EUC-KR",
    "gb18030": "GB18030", "big5": "Big5",
}

LENGTHS = [16, 32, 64, 128, 256, 512, 0]  # 0 = full


def evaluate() -> list[dict]:
    records = []
    for charset, langs in sorted(CHARSET_LANGS.items()):
        want = _CANON.get(charset, charset)
        fam = FAMILY.get(charset, {want})
        for lang in langs:
            data = EVAL_TEXT[lang].encode(charset)
            for length in LENGTHS:
                chunk = data if length == 0 else data[:length]
                matches = detect_all(chunk)
                top = matches[0] if matches else (None, 0)
                records.append({
                    "charset": charset,
                    "want": want,
                    "lang": lang,
                    "length": length if length else len(data),
                    "full": length == 0,
                    "got": top[0],
                    "conf": top[1],
                    "exact": top[0] == want,
                    "family": top[0] in fam,
                })
    return records


def report(records: list[dict]) -> str:
    lines = [
        "# Charset sniffer held-out confusion report",
        "",
        "Generated by `tools/charset_confusion.py` over held-out prose",
        "(disjoint from UDHR training samples and test goldens) for all",
        "16 trained charsets. `exact` = Java canonical name match;",
        "`family` folds cp1250/ISO-8859-2 and cp1253/ISO-8859-7 (either",
        "member decodes the text to identical letters).",
        "",
        "## Detection rate by truncation length",
        "",
        "| bytes | exact | family | mean conf (top-1) |",
        "|---|---|---|---|",
    ]
    by_len: dict[int, list[dict]] = {}
    for r in records:
        key = 0 if r["full"] else r["length"]
        by_len.setdefault(key, []).append(r)
    for key in sorted(by_len, key=lambda k: (k == 0, k)):
        rs = by_len[key]
        ex = sum(r["exact"] for r in rs)
        fa = sum(r["family"] for r in rs)
        mc = sum(r["conf"] for r in rs) / len(rs)
        label = "full" if key == 0 else str(key)
        lines.append(
            f"| {label} | {ex}/{len(rs)} | {fa}/{len(rs)} | {mc:.0f} |"
        )
    lines += ["", "## Per-charset detection at full length", "",
              "| charset | langs | exact | family | top-1 (conf) |",
              "|---|---|---|---|---|"]
    full = [r for r in records if r["full"]]
    by_cs: dict[str, list[dict]] = {}
    for r in full:
        by_cs.setdefault(r["charset"], []).append(r)
    for cs in sorted(by_cs):
        rs = by_cs[cs]
        ex = sum(r["exact"] for r in rs)
        fa = sum(r["family"] for r in rs)
        got = ", ".join(f"{r['lang']}:{r['got']}({r['conf']})" for r in rs)
        lines.append(
            f"| {cs} | {len(rs)} | {ex}/{len(rs)} | {fa}/{len(rs)} | {got} |"
        )
    lines += ["", "## Confusion matrix (full length, top-1)", ""]
    conf_counts: Counter = Counter(
        (r["want"], r["got"] or "none") for r in full
    )
    preds = sorted({g for _, g in conf_counts})
    lines.append("| true \\ predicted | " + " | ".join(preds) + " |")
    lines.append("|---|" + "---|" * len(preds))
    for want in sorted({w for w, _ in conf_counts}):
        row = [str(conf_counts.get((want, p), "")) for p in preds]
        lines.append(f"| {want} | " + " | ".join(row) + " |")
    lines += [
        "",
        "## Reading",
        "",
        "- MBCS charsets (Shift_JIS/EUC/GB18030/Big5) need enough",
        "  multibyte evidence: short prefixes under ~64 bytes may fall",
        "  to a Latin lookalike or the windows-1252 floor — the same",
        "  degradation ICU shows on tiny inputs (its kBufSize is 8000",
        "  for a reason). The crawl path always feeds full payloads",
        "  (SNIFF_LIMIT=8000).",
        "- Family confusions (cp1250 vs ISO-8859-2, cp1253 vs",
        "  ISO-8859-7) are positional lookalikes: both members decode",
        "  the document to the same letters, so either answer decodes",
        "  correctly downstream.",
        "",
    ]
    return "\n".join(lines)


def main() -> int:
    out_dir = Path("BENCH/probes")
    if "--out" in sys.argv:
        out_dir = Path(sys.argv[sys.argv.index("--out") + 1])
    out_dir.mkdir(parents=True, exist_ok=True)
    records = evaluate()
    (out_dir / "charset_confusion.json").write_text(
        json.dumps(records, ensure_ascii=False, indent=1)
    )
    (out_dir / "charset_confusion.md").write_text(report(records))
    full = [r for r in records if r["full"]]
    ex = sum(r["exact"] for r in full)
    fa = sum(r["family"] for r in full)
    print(f"full-length: exact {ex}/{len(full)}, family {fa}/{len(full)}")
    print(f"wrote {out_dir}/charset_confusion.md (+.json)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
