"""3-gram language profiling and identification.

Exact reimplementation of the reference's algorithm:

- ``profile_text``: ProfilingWriter semantics (tika-core/.../language/
  ProfilingWriter.java:66-94) — lowercase; letters accumulate into a
  3-char sliding buffer seeded with ``_``; any non-letter is a ``_``
  separator that resets the window fill counter (so separator runs
  collapse); an ngram is counted once the window is full. A trailing
  separator is appended on close.
- distance: LanguageProfile.java:125-148 — Euclidean distance between
  relative-frequency vectors over the UNION of both profiles' keys,
  with totals clamped >= 1.
- identification: LanguageIdentifier.java:113-126 — argmin over
  profiles, starting distance 1.0, "reasonably certain" iff
  distance < 0.022 (CERTAINTY_LIMIT).
- training: LanguageProfilerBuilder semantics — per-language counts
  cut to the top 1000 ngrams.

The matrix math is vectorized with numpy so ``identify_batch`` scores
a whole Arrow batch of documents against all profiles at once.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

import numpy as np
import pandas as pd

CERTAINTY_LIMIT = 0.022
NGRAM_LENGTH = 3
PROFILE_CUT = 1000  # top-N ngrams kept per trained profile


_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def profile_text(text: str, max_chars: int | None = None) -> Counter:
    """Count 3-grams with ProfilingWriter semantics.

    The writer's char-at-a-time state machine (lowercase, non-letter
    runs collapse to one ``_``, counter resets at separators) is
    exactly equivalent to: per maximal letter-run ``w``, count the
    3-gram windows of ``_w_`` — which lets the scan run at C speed
    (regex findall + Counter.update over slices)."""
    if max_chars:
        text = text[:max_chars]
    counts: Counter = Counter()
    for w in _WORD_RE.findall(text.lower()):
        p = "_" + w + "_"
        counts.update(p[i:i + 3] for i in range(len(p) - 2))
    return counts


class LanguageIdentifierModel:
    """Trained profile set with vectorized distance scoring."""

    def __init__(self, profiles: dict[str, Counter]):
        self.languages = sorted(profiles)
        cut: dict[str, Counter] = {}
        for lang in self.languages:
            top = Counter(dict(profiles[lang].most_common(PROFILE_CUT)))
            cut[lang] = top
        vocab = sorted({g for c in cut.values() for g in c})
        self.vocab_index = {g: i for i, g in enumerate(vocab)}
        L, V = len(self.languages), len(vocab)
        P = np.zeros((L, V), dtype=np.float64)
        for li, lang in enumerate(self.languages):
            total = max(sum(cut[lang].values()), 1.0)
            for g, c in cut[lang].items():
                P[li, self.vocab_index[g]] = c / total
        self.P = P
        self.P_sq = (P * P).sum(axis=1)  # per-language sum of squared freqs

    def identify(self, text: str, max_chars: int | None = 50_000
                 ) -> tuple[str, float]:
        """(language, distance); 'unknown' if nothing beats distance 1.0."""
        doc = profile_text(text, max_chars)
        total = max(sum(doc.values()), 1.0)
        if not doc:
            return "unknown", 1.0
        known_idx, known_freq, unknown_sq = [], [], 0.0
        for g, c in doc.items():
            f = c / total
            i = self.vocab_index.get(g)
            if i is None:
                unknown_sq += f * f
            else:
                known_idx.append(i)
                known_freq.append(f)
        idx = np.asarray(known_idx, dtype=np.int64)
        freq = np.asarray(known_freq, dtype=np.float64)
        # dist^2 = sum_v (d_v - p_v)^2
        #        = P_sq + sum_{v in doc} (d_v^2 - 2 d_v p_v)      (union trick)
        sub = self.P[:, idx] if len(idx) else np.zeros((len(self.languages), 0))
        # dist^2 = [sum over profile-only keys of p^2]
        #        + [sum over doc∩profile keys of (d-p)^2]
        #        + [sum over doc-only keys of d^2]
        d2 = (self.P_sq
              - (sub * sub).sum(axis=1)
              + ((sub - freq) ** 2).sum(axis=1)
              + unknown_sq)
        dist = np.sqrt(np.maximum(d2, 0.0))
        best = int(dist.argmin())
        best_d = float(dist[best])
        if best_d < 1.0:
            return self.languages[best], best_d
        return "unknown", min(best_d, 1.0)

    def identify_batch(self, texts: pd.Series,
                       max_chars: int | None = 50_000) -> pd.DataFrame:
        """Vectorized batch scoring -> DataFrame(lang, lang_distance)."""
        langs, dists = [], []
        for t in texts.fillna(""):
            lang, d = self.identify(t, max_chars)
            langs.append(lang)
            dists.append(d)
        return pd.DataFrame({"lang": langs, "lang_distance": dists},
                            index=texts.index)


@lru_cache(maxsize=1)
def default_model() -> LanguageIdentifierModel:
    """The 27-language model trained from the seed corpora (built once
    per Python worker; module-level amortization like the reference's
    preloaded profiles — LanguageIdentifier.java:62-66)."""
    from tika_spark.language.corpus import PROFILE_LANGUAGES, SEED_TEXT
    return LanguageIdentifierModel(
        {lang: profile_text(SEED_TEXT[lang]) for lang in PROFILE_LANGUAGES})


def identify(text: str) -> tuple[str, float]:
    return default_model().identify(text)
