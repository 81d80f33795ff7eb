"""Language-ID parity evaluation against the reference's .ngp data.

The repo's 27 language profiles are trained from the in-repo seed
corpus (tika_spark/language/corpus.py), NOT from the reference's
shipped profile data — so on real text the argmin can differ from the
reference's for close language pairs (no/da, es/gl). This tool pins
the exact deviation surface: it loads the reference's .ngp counts at
RUN time (read-only, never copied into the repo), builds a second
LanguageIdentifierModel from them, and compares the two models'
decisions on a held-out multilingual sample.

Usage:  python tools/ngp_parity.py [ref_lang_dir] [> report.md]

The sample is every sliding sentence-window of each language's seed
text (windows the profiles were NOT trained on verbatim — training
uses the full text, evaluation uses sub-spans, which is the document
shape the identifier sees in production). Agreement is reported
per-language and overall; every disagreement is listed with both
argmins so the deviations are pinned, not hand-waved.

Reference algorithm parity note: both models run the SAME scoring
code (tika_spark.language.identifier — ProfilingWriter ngrams,
union-key Euclidean distance, 0.022 certainty), so any disagreement
is attributable purely to profile DATA, which is the question this
tool answers.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tika_spark.language.corpus import SEED_TEXT  # noqa: E402
from tika_spark.language.identifier import (  # noqa: E402
    LanguageIdentifierModel, default_model)

_REF_LANG_DIR = ("/root/reference/tika-core/src/main/resources/"
                 "org/apache/tika/language")


def load_ngp(path: str) -> Counter:
    """One .ngp file → Counter of (3-gram, count); '#' comments and
    the ngram count header format per LanguageProfile(InputStream)."""
    counts: Counter = Counter()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) != 2 or not parts[1].isdigit():
                continue
            counts[parts[0]] = int(parts[1])
    return counts


def reference_model(lang_dir: str) -> LanguageIdentifierModel:
    profiles = {}
    for name in sorted(os.listdir(lang_dir)):
        if name.endswith(".ngp"):
            profiles[name[:-4]] = load_ngp(os.path.join(lang_dir, name))
    if not profiles:
        raise SystemExit(f"no .ngp files under {lang_dir}")
    return LanguageIdentifierModel(profiles)


def sample_windows(text: str, width: int = 3) -> list[str]:
    """Sliding windows of `width` sentences — held-out sub-spans of
    the seed text (the identifier's production document shape)."""
    sentences = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text)
                 if s.strip()]
    if len(sentences) <= width:
        return [" ".join(sentences)]
    return [" ".join(sentences[i:i + width])
            for i in range(len(sentences) - width + 1)]


def main() -> None:
    lang_dir = sys.argv[1] if len(sys.argv) > 1 else _REF_LANG_DIR
    ref = reference_model(lang_dir)
    ours = default_model()
    shared = sorted(set(ref.languages) & set(ours.languages))

    total = agree = 0
    rows = []
    disagreements = []
    by_width = {1: [0, 0], 2: [0, 0], 3: [0, 0]}
    for lang in shared:
        if lang not in SEED_TEXT:
            continue
        wins = n = 0
        for width in (1, 2, 3):
            for doc in sample_windows(SEED_TEXT[lang], width):
                r_lang, r_dist = ref.identify(doc)
                o_lang, o_dist = ours.identify(doc)
                n += 1
                by_width[width][1] += 1
                if r_lang == o_lang:
                    wins += 1
                    by_width[width][0] += 1
                else:
                    disagreements.append(
                        (lang, r_lang, round(r_dist, 4),
                         o_lang, round(o_dist, 4), doc[:60]))
        total += n
        agree += wins
        rows.append((lang, n, wins))

    print("# Language-ID parity vs reference .ngp profiles\n")
    print(f"Shared languages: {len(shared)}; sample: {total} windows; "
          f"agreement: {agree}/{total} "
          f"({100.0 * agree / max(total, 1):.2f}%)\n")
    print("By document length (sentence-window width):\n")
    print("| width | windows | agree |")
    print("|---|---|---|")
    for width, (w_agree, w_total) in sorted(by_width.items()):
        print(f"| {width} | {w_total} | {w_agree} "
              f"({100.0 * w_agree / max(w_total, 1):.1f}%) |")
    print("\n| lang | windows | agree |")
    print("|---|---|---|")
    for lang, n, wins in rows:
        print(f"| {lang} | {n} | {wins} |")
    if disagreements:
        print("\n## Disagreements (truth, ref-argmin@dist, "
              "ours-argmin@dist, text head)\n")
        for t, rl, rd, ol, od, head in disagreements:
            print(f"- {t}: ref={rl}@{rd} ours={ol}@{od} — “{head}…”")
    else:
        print("\nNo disagreements on the sample.")


if __name__ == "__main__":
    main()
