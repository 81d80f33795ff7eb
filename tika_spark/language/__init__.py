"""Language identification — 3-gram profiles + geometric distance.

From-scratch reimplementation of the reference's language classifier
(tika-core/.../language/ProfilingWriter.java:66-94,
LanguageProfile.java:125-148, LanguageIdentifier.java:113-152): text is
lowercased, non-letters become ``_`` separators (runs collapsed), and
3-grams are counted over a sliding window seeded with ``_``; a document
profile is compared to each trained language profile by the Euclidean
distance between relative-frequency vectors over the union of their
ngram keys; argmin wins, and the identification is "reasonably certain"
iff the distance is below 0.022.

The reference ships 27 trained ``.ngp`` profile resources. We do NOT
copy them: profiles here are trained at import time from the seed
corpora in ``corpus.py`` (self-authored text), top-1000-cut exactly
like the reference's profile builder (LanguageProfilerBuilder.java).
"""

from tika_spark.language.identifier import (  # noqa: F401
    CERTAINTY_LIMIT,
    LanguageIdentifierModel,
    default_model,
    identify,
    profile_text,
)
