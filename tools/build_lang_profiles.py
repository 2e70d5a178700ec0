#!/usr/bin/env python3
"""Build the statistical language-ID profiles shipped at
``nutch_spark/ml/lang_profiles.json``.

The reference's language-identifier plugin delegates statistical
identification to Tika's OptimaizeLangDetector
(``src/plugin/language-identifier/.../HTMLLanguageParser.java:168-181``)
with pre-trained profiles. This repo ships its own char-trigram
profiles (Cavnar-Trenkle-style frequency vectors, cosine-scored),
trained on the EVEN lines of the plugin's Europarl test corpus
(``src/test/.../{da,de,el,en,es,fi,fr,it,nl,pt,sv}.test``); the ODD
lines are held out as the golden-test fixtures in
``tests/data/langid/golden/`` — mirroring the per-line >256-char
assertions of ``TestHTMLLanguageParser.testLanguageIndentifier``
without training on the evaluated lines.

Usage (dev-time only; requires the reference checkout)::

    python tools/build_lang_profiles.py [--ref /root/reference] [--top 300]

Writes:
- nutch_spark/ml/lang_profiles.json   {lang: {trigram: l2_normalized_weight}}
- tests/data/langid/train/{lang}.txt  (even lines; profile provenance)
- tests/data/langid/golden/{lang}.txt (odd lines; held-out goldens)
and prints held-out per-line accuracy.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_TESTS = "src/plugin/language-identifier/src/test/org/apache/nutch/analysis/lang"
LANGS = ["da", "de", "el", "en", "es", "fi", "fr", "it", "nl", "pt", "sv"]


def normalize(text: str) -> str:
    """Lowercase, keep Unicode letters only, collapse separators to a
    single space, pad with one leading/trailing space (word-boundary
    trigrams carry most of the signal). MUST stay in lockstep with
    nutch_spark.ml.langid._normalize."""
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


def trigrams(text: str) -> Counter:
    n = normalize(text)
    return Counter(n[i : i + 3] for i in range(len(n) - 2))


def train(lines: list[str], top: int) -> dict[str, float]:
    counts = Counter()
    for line in lines:
        counts.update(trigrams(line))
    best = counts.most_common(top)
    norm = math.sqrt(sum(c * c for _, c in best))
    return {g: c / norm for g, c in best}


def classify(text: str, profiles: dict[str, dict[str, float]]) -> str | None:
    tf = trigrams(text)
    scores = {
        lang: sum(c * w.get(g, 0.0) for g, c in tf.items())
        for lang, w in profiles.items()
    }
    best = max(scores.items(), key=lambda kv: (round(kv[1], 9), [-ord(c) for c in kv[0]]))
    return best[0] if best[1] > 0 else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--top", type=int, default=300)
    args = ap.parse_args()

    src = Path(args.ref) / REF_TESTS
    train_dir = REPO / "tests" / "data" / "langid" / "train"
    golden_dir = REPO / "tests" / "data" / "langid" / "golden"
    train_dir.mkdir(parents=True, exist_ok=True)
    golden_dir.mkdir(parents=True, exist_ok=True)

    profiles: dict[str, dict[str, float]] = {}
    goldens: dict[str, list[str]] = {}
    for lang in LANGS:
        lines = (src / f"{lang}.test").read_text(encoding="utf-8").splitlines()
        even = [l for i, l in enumerate(lines) if i % 2 == 0]
        odd = [l for i, l in enumerate(lines) if i % 2 == 1]
        (train_dir / f"{lang}.txt").write_text("\n".join(even) + "\n", encoding="utf-8")
        (golden_dir / f"{lang}.txt").write_text("\n".join(odd) + "\n", encoding="utf-8")
        profiles[lang] = train(even, args.top)
        goldens[lang] = odd

    out = REPO / "nutch_spark" / "ml" / "lang_profiles.json"
    out.write_text(
        json.dumps(profiles, ensure_ascii=False, sort_keys=True, indent=0),
        encoding="utf-8",
    )
    print(f"wrote {out} ({out.stat().st_size} bytes, {args.top} trigrams/lang)")

    # held-out eval: the reference test asserts per-line for trimmed
    # lines > 256 chars, plus the whole file
    total = wrong = 0
    for lang, lines in goldens.items():
        misses = []
        for line in lines:
            line = line.strip()
            if len(line) > 256:
                total += 1
                got = classify(line, profiles)
                if got != lang:
                    wrong += 1
                    misses.append((got, line[:60]))
        whole = classify("\n".join(lines), profiles)
        flag = "" if whole == lang else "  << WHOLE-FILE MISS"
        print(f"{lang}: whole-file -> {whole}{flag}; line misses: {len(misses)}")
        for got, snippet in misses[:3]:
            print(f"    -> {got}: {snippet}")
    print(f"held-out line accuracy: {total - wrong}/{total}")
    return 1 if wrong else 0


if __name__ == "__main__":
    sys.exit(main())
