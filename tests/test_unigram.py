"""Unigram-LM tokenizer training (analysis/unigram.py): seed vocab,
forward-backward E-step goldens (hand-computed), EM + pruning, and
Viterbi encode."""

import math

import pytest

from tika_spark.analysis.unigram import (_lattice_counts, seed_vocab,
                                         unigram_encode,
                                         unigram_train,
                                         viterbi_segment,
                                         word_counts)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_lattice_counts_hand_golden():
    # P(a)=2/7, P(b)=3/7, P(ab)=2/7 over word "ab":
    # segmentations [a,b] 6/49 vs [ab] 14/49 -> posterior 0.3 / 0.7
    probs = {"a": 2 / 7, "b": 3 / 7, "ab": 2 / 7}
    ex = _lattice_counts("ab", probs, 2)
    assert ex["a"] == pytest.approx(0.3)
    assert ex["b"] == pytest.approx(0.3)
    assert ex["ab"] == pytest.approx(0.7)
    # unsegmentable word (char outside vocab)
    assert _lattice_counts("ax", probs, 2) is None


def test_seed_vocab_and_word_counts(spark):
    docs = _docs(spark, ["ab ab b"])
    wc = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert wc == {"ab": 2, "b": 1}
    sv = {r.piece: r["count"]
          for r in seed_vocab(docs, max_piece_len=2).collect()}
    assert sv == {"a": 2, "b": 3, "ab": 2}


def test_unigram_train_one_iteration_golden(spark):
    # seed probs a=2/7 b=3/7 ab=2/7; E-step: a=.6 b=1.6 ab=1.4
    # -> final probs 1/6, 4/9, 7/18 (integer micro units keep this
    # exact end-to-end)
    docs = _docs(spark, ["ab ab b"])
    out = {r.piece: r for r in
           unigram_train(docs, vocab_size=10, n_iters=1,
                         seed_top=10, max_piece_len=2).collect()}
    assert out["b"].score_micro == round(math.log(4 / 9) * 1e6)
    assert out["ab"].score_micro == round(math.log(7 / 18) * 1e6)
    assert out["a"].score_micro == round(math.log(1 / 6) * 1e6)
    assert [out[p].rank for p in ("b", "ab", "a")] == [1, 2, 3]


def test_unigram_train_prunes_to_target(spark):
    docs = _docs(spark, ["the cat sat on the mat " * 4,
                         "a cat and a rat sat " * 3])
    out = unigram_train(docs, vocab_size=12, n_iters=1,
                        seed_top=40, max_piece_len=3).collect()
    pieces = {r.piece for r in out}
    chars = {c for c in "thecasonmdr "} - {" "}
    assert chars <= pieces                 # single chars never pruned
    assert len(pieces) <= max(12, len(chars)) + 3  # prune_frac steps
    # determinism: a second run is identical
    again = unigram_train(docs, vocab_size=12, n_iters=1,
                          seed_top=40, max_piece_len=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_viterbi_segment():
    scores = {"a": -1.0, "b": -1.0, "ab": -1.5}
    assert viterbi_segment("ab", scores) == ["ab"]
    assert viterbi_segment("aab", scores) == ["a", "ab"]
    # exact tie on score -> fewer pieces wins
    assert viterbi_segment("ab", {"a": -1.0, "b": -1.0,
                                  "ab": -2.0}) == ["ab"]
    assert viterbi_segment("ax", scores) is None


def test_unigram_encode(spark):
    docs = _docs(spark, ["ab ab b", "ab xq"])
    pieces = [("a", -2.0), ("b", -2.0), ("ab", -1.0)]
    out = {r.id: r for r in unigram_encode(docs, pieces).collect()}
    assert (out[0].n_words, out[0].n_pieces, out[0].n_unk) == (3, 3, 0)
    # "xq" falls back to floor-scored chars -> 2 unk pieces
    assert (out[1].n_words, out[1].n_pieces, out[1].n_unk) == (2, 3, 2)


def test_seed_vocab_char_cap_bounds_driver_rows(spark):
    # adversarial wide alphabet: 600 distinct codepoints as
    # single-char words — the driver-side seed must stay at
    # max_chars + top_k rows, keeping the most frequent chars
    wide = " ".join(chr(0x4E00 + i) for i in range(600))
    docs = _docs(spark, [wide, "aa aa aa"])
    rows = seed_vocab(docs, max_piece_len=2, top_k=5,
                      max_chars=50).collect()
    assert len(rows) <= 55
    pieces = {r.piece for r in rows}
    assert "a" in pieces          # most frequent char survives
    assert "aa" in pieces
    # training over the capped seed still converges: words whose
    # chars were dropped simply contribute no expected counts
    out = unigram_train(docs, vocab_size=8, n_iters=1, seed_top=5,
                        max_piece_len=2, max_seed_chars=50).collect()
    assert 0 < len(out) <= 55
