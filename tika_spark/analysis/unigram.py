"""Unigram-LM tokenizer training (SentencePiece-style), distributed.

The second of the two standard subword tokenizers (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates"; Kudo & Richardson 2018,
"SentencePiece"). BPE (analysis/bpe.py) grows a vocabulary bottom-up
by merge counting; the unigram LM starts from a LARGE seed vocabulary
and prunes it down under an EM-trained piece-probability model:

    P(x) = prod_i p(piece_i),   seg(w) chosen over the word lattice

Training shape (what runs where):

- The corpus never leaves the executors: one scan aggregates it to a
  (word, count) vocabulary — the same map-side-combinable reduction
  BPE training uses, tiny relative to the corpus (Heaps' law).
- The piece table (a few thousand rows) broadcasts to every E-step
  task inside the UDF closure.
- Each EM iteration = ONE mapInPandas over the word vocabulary
  (forward-backward over each word's segmentation lattice, pure
  numpy-free Python over short words) + ONE groupBy-sum of expected
  counts + an O(vocab) collect for the M-step. No iteration touches
  the raw corpus again.

Determinism: expected counts are accumulated as INTEGER micro-units
(round(E[count] * word_freq * 1e6) per word, summed as longs), so the
E-step aggregation is order-independent and the whole training run is
bit-reproducible across partitionings — the same integer-micro-unit
discipline as PageRank/perceptron training in this repo.

Simplifications vs the reference algorithm (documented, deliberate):
seed = all substrings up to ``max_piece_len`` of the frequent-word
vocabulary (SentencePiece uses a suffix-array ESA seed); pruning
drops the lowest-expected-count pieces per round (SentencePiece ranks
by likelihood loss of removing the piece); single characters are
never pruned (same as the reference, which keeps the corpus
coverable).

Reference parity: none — the reference has no tokenizer tier; this
extends the training-data pipeline alongside BPE.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tika_spark.analysis.curation import tokens

_MAX_WORD_LEN = 64       # lattice cap: longer words are truncated
_MICRO = 1_000_000


def word_counts(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — one scan, map-side combinable."""
    return (docs.select(F.explode(tokens(F.col(text_col)))
                        .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").cast("long")
                                 .alias("cnt")))


def seed_vocab(docs: DataFrame, max_piece_len: int = 4,
               top_k: int = 200, id_col: str = "doc_id",
               text_col: str = "text",
               max_chars: int = 10_000) -> DataFrame:
    """Seed pieces: the ``max_chars`` most frequent single characters,
    plus the ``top_k`` multi-char substrings (length 2..max_piece_len)
    of corpus words, weighted by word frequency. Emits (piece, count).

    Pure relational: words aggregate once; substrings are a per-row
    array explosion over the (small) word vocabulary; top-k is one
    window over piece counts. Ties break lexicographically so the
    seed is deterministic.

    ``max_chars`` is the driver-side size guarantee: the seed (and
    hence every later ``collect`` in :func:`unigram_train` — the EM
    E-step can only ever emit pieces already in the broadcast
    probability table) is at most ``max_chars + top_k`` rows, no
    matter how wide the corpus alphabet is. Adversarial crawl text
    (binary garbage, full-Unicode soup) can present ~1.1M distinct
    codepoints; words containing a dropped character simply fail
    segmentation and contribute no expected counts, the same path an
    out-of-vocabulary character already takes at encode time.
    """
    wc = word_counts(docs, id_col, text_col).withColumn(
        "word", F.substring("word", 1, _MAX_WORD_LEN))
    n = F.length("word")
    # all (start, len) substrings as a flattened per-row array
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1),
                       F.least(F.lit(max_piece_len), n - i + 1)),
            lambda ln: F.col("word").substr(i.cast("int"),
                                            ln.cast("int")))))
    pieces = (wc.select(F.explode(subs).alias("piece"), "cnt")
              .groupBy("piece").agg(F.sum("cnt").cast("long")
                                    .alias("count")))
    # distributed top-k (TakeOrderedAndProject), not a global-window
    # single partition — the piece-count table is ~|substrings| of
    # the word vocabulary and worth keeping parallel
    chars = (pieces.filter(F.length("piece") == 1)
             .orderBy(F.desc("count"), F.asc("piece"))
             .limit(max_chars))
    top = (pieces.filter(F.length("piece") >= 2)
           .orderBy(F.desc("count"), F.asc("piece")).limit(top_k))
    return chars.unionByName(top)


def _lattice_counts(word: str, probs: dict[str, float],
                    max_len: int) -> dict[str, float] | None:
    """Forward-backward expected piece counts for one word. None if
    the word cannot be segmented (a char outside the vocabulary)."""
    w = word[:_MAX_WORD_LEN]
    n = len(w)
    # edges[j] = [(i, piece, p)] ending at j
    edges: list[list] = [[] for _ in range(n + 1)]
    for i in range(n):
        for ln in range(1, min(max_len, n - i) + 1):
            p = probs.get(w[i:i + ln])
            if p:
                edges[i + ln].append((i, w[i:i + ln], p))
    fwd = [0.0] * (n + 1)
    fwd[0] = 1.0
    for j in range(1, n + 1):
        fwd[j] = sum(fwd[i] * p for i, _, p in edges[j])
    if fwd[n] <= 0.0:
        return None
    bwd = [0.0] * (n + 1)
    bwd[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for ln in range(1, min(max_len, n - i) + 1):
            p = probs.get(w[i:i + ln])
            if p:
                acc += p * bwd[i + ln]
        bwd[i] = acc
    z = fwd[n]
    out: dict[str, float] = {}
    for j in range(1, n + 1):
        for i, piece, p in edges[j]:
            e = fwd[i] * p * bwd[j] / z
            if e > 0.0:
                out[piece] = out.get(piece, 0.0) + e
    return out


def viterbi_segment(word: str, scores: dict[str, float],
                    max_len: int = 8) -> list[str] | None:
    """Best segmentation under per-piece log-scores (higher wins;
    ties prefer FEWER pieces, then the lexicographically smaller
    piece sequence). None when unsegmentable."""
    w = word[:_MAX_WORD_LEN]
    n = len(w)
    # best[i] = (score, -npieces, path) up to i
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, [])
    for j in range(1, n + 1):
        cand = None
        for ln in range(1, min(max_len, j) + 1):
            piece = w[j - ln:j]
            s = scores.get(piece)
            if s is None or best[j - ln] is None:
                continue
            ps, pn, pp = best[j - ln]
            c = (ps + s, pn - 1, pp + [piece])
            if cand is None or (c[0], c[1]) > (cand[0], cand[1]) \
                    or ((c[0], c[1]) == (cand[0], cand[1])
                        and c[2] < cand[2]):
                cand = c
        best[j] = cand
    if best[n] is None:
        return None
    return best[n][2]


def _estep(words: DataFrame, probs: dict[str, float],
           max_len: int) -> DataFrame:
    """One E-step over the word vocabulary: expected piece counts in
    integer micro-units (order-independent aggregation)."""
    spark = words.sparkSession
    bprobs = spark.sparkContext.broadcast(probs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pr = bprobs.value
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                ex = _lattice_counts(str(word), pr, max_len)
                if not ex:
                    continue
                c = int(cnt)
                for piece, e in ex.items():
                    acc[piece] = acc.get(piece, 0) \
                        + int(round(e * c * _MICRO))
            yield pd.DataFrame(
                {"piece": list(acc.keys()),
                 "c_micro": list(acc.values())},
                columns=["piece", "c_micro"])

    return (words.mapInPandas(run, schema="piece string, "
                                          "c_micro long")
            .groupBy("piece").agg(F.sum("c_micro").cast("long")
                                  .alias("c_micro")))


def unigram_train(docs: DataFrame, vocab_size: int = 64,
                  n_iters: int = 2, seed_top: int = 200,
                  max_piece_len: int = 4, prune_frac: float = 0.25,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  max_seed_chars: int = 10_000) -> DataFrame:
    """Train a unigram-LM piece vocabulary by EM + pruning rounds.

    Each round runs ``n_iters`` EM iterations, then (while the
    vocabulary is still above ``vocab_size``) drops the
    lowest-expected-count ``prune_frac`` of multi-char pieces (ties
    on count break lexicographically; single chars are never
    dropped). Emits (piece, score_micro, rank): final log-prob in
    micro units, ranked by probability desc then piece asc.
    """
    words = word_counts(docs, id_col, text_col).cache()
    # bounded collect: ≤ max_seed_chars + seed_top rows by
    # construction, and every later E-step collect is a subset of
    # this piece set (the lattice only scores broadcast pieces)
    seed = seed_vocab(docs, max_piece_len, seed_top, id_col,
                      text_col, max_chars=max_seed_chars).collect()
    counts = {r["piece"]: int(r["count"]) * _MICRO for r in seed}
    char_set = {p for p in counts if len(p) == 1}
    target = max(vocab_size, len(char_set))

    def mstep(c: dict[str, int]) -> dict[str, float]:
        total = sum(c.values())
        return {p: v / total for p, v in c.items() if v > 0}

    while True:
        probs = mstep(counts)
        for _ in range(n_iters):
            got = _estep(words, probs, max_piece_len).collect()
            counts = {r["piece"]: int(r["c_micro"]) for r in got}
            # chars can round to 0 expected count (all mass on the
            # multi-char pieces covering them) yet must survive to
            # keep every word coverable — floor them at 1 micro
            for p in char_set:
                if counts.get(p, 0) <= 0:
                    counts[p] = 1
            probs = mstep(counts)
        if len(counts) <= target:
            break
        multi = sorted(
            ((c, p) for p, c in counts.items() if len(p) > 1))
        n_drop = min(max(1, int(len(multi) * prune_frac)),
                     len(counts) - target, len(multi))
        if n_drop <= 0:
            break
        for _, p in multi[:n_drop]:
            del counts[p]
    words.unpersist()

    probs = mstep(counts)
    rows = sorted(((p, math.log(v)) for p, v in probs.items()),
                  key=lambda t: (-t[1], t[0]))
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(p, int(round(s * _MICRO)), i + 1)
         for i, (p, s) in enumerate(rows)],
        "piece string, score_micro long, rank long")


def unigram_encode(docs: DataFrame, pieces: list[tuple[str, float]],
                   max_piece_len: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Tokenize each document under a FIXED piece table (the apply
    half): Viterbi over each word, unknown characters fall back to a
    floor-scored single char. Emits (id, n_words, n_pieces, n_unk).
    Per-row work over a broadcast piece table — map-only."""
    scores = {p: float(s) for p, s in pieces}
    floor = min(scores.values(), default=0.0) - 20.0
    spark = docs.sparkSession
    b = spark.sparkContext.broadcast((scores, floor))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sc, fl = b.value
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                n_words = n_pieces = n_unk = 0
                for word in str(text or "").split():
                    n_words += 1
                    seg = viterbi_segment(word, sc, max_piece_len)
                    if seg is None:
                        # per-char fallback with floor-scored unks
                        aug = dict(sc)
                        for ch in set(word):
                            aug.setdefault(ch, fl)
                        seg = viterbi_segment(word, aug,
                                              max_piece_len) or []
                        n_unk += sum(1 for s in seg if s not in sc)
                    n_pieces += len(seg)
                rows.append((int(i), n_words, n_pieces, n_unk))
            yield pd.DataFrame(rows, columns=["id", "n_words",
                                              "n_pieces", "n_unk"])

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="id long, n_words long, n_pieces long, "
                    "n_unk long")
