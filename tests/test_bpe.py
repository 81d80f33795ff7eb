"""Distributed BPE merge training (tika_spark/analysis/bpe.py) vs a
pure-Python reference trainer and the DuckDB oracle replay."""

import collections

import pytest

from tika_spark.analysis import bpe


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


def _py_bpe(texts, num_merges):
    """Reference trainer: classic word-dict BPE with the same total
    order (count desc, pair lexicographic asc)."""
    wc = collections.Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TEXTS = ["low low low lower lowest",
         "new newer newest wide wider",
         "low new wide lowest"]


class TestTrain:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
        got = [(r.left, r.right, r.pair_count)
               for r in bpe.bpe_train(df, num_merges=5)
               .orderBy("rank").collect()]
        assert got == _py_bpe(TEXTS, 5)

    def test_repeated_char_word(self, spark):
        # 'aaaa' -> greedy (a,a) merges give 'aa','aa'
        df = spark.createDataFrame([("aaaa aaaa",)], "text string")
        rows = bpe.bpe_train(df, num_merges=2).orderBy("rank").collect()
        assert (rows[0].left, rows[0].right) == ("a", "a")
        assert rows[0].pair_count == 6  # 3 adjacencies x 2 words
        # after the merge, words are [aa, aa]: pair (aa, aa) count 2
        assert (rows[1].left, rows[1].right, rows[1].pair_count) \
            == ("aa", "aa", 2)

    def test_exhausted_vocab_stops_early(self, spark):
        df = spark.createDataFrame([("ab ab",)], "text string")
        rows = bpe.bpe_train(df, num_merges=10).collect()
        assert len(rows) == 1  # after merging (a,b) no pairs remain

    def test_duckdb_oracle_replay(self, spark):
        import duckdb
        df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
        got = sorted((r.rank, r.left, r.right, r.pair_count)
                     for r in bpe.bpe_train(df, num_merges=4).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                    + ", ".join(f"('{t}')" for t in TEXTS) + ") v(text)")
        sql = bpe.bpe_oracle_sql("SELECT text FROM d", num_merges=4)
        exp = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == exp


class TestSegment:
    def test_encoder_applies_in_rank_order(self, spark):
        words = spark.createDataFrame(
            [("lowest",), ("low",), ("newest",)], "word string")
        merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
        out = {r.word: list(r.bpe_syms)
               for r in bpe.bpe_segment_words(words, merges).collect()}
        assert out["low"] == ["low"]
        assert out["lowest"] == ["low", "est"]
        assert out["newest"] == ["n", "e", "w", "est"]


class TestEncodeDocs:
    def test_chained_merges_and_counts(self, spark):
        from tika_spark.analysis.bpe import bpe_encode_docs
        merges = [("e", "r"), ("t", "h"), ("th", "e")]
        df = spark.createDataFrame(
            [(1, "the other"),        # the→1; other: o,th,er→3
             (2, "thee herder"),      # thee: the,e→2; herder: h,er,d,er→4
             (3, ""),                 # no tokens at all
             (4, "xyz")],             # nothing merges: 3 chars
            "doc_id long, text string")
        got = {r.id: r for r in bpe_encode_docs(df, merges).collect()}
        assert (got[1].n_words, got[1].n_tokens) == (2, 4)
        assert (got[2].n_words, got[2].n_tokens) == (2, 6)
        assert (got[3].n_words, got[3].n_tokens) == (0, 0)
        assert (got[4].n_words, got[4].n_tokens) == (1, 3)

    def test_rank_order_is_load_bearing(self, spark):
        from tika_spark.analysis.bpe import bpe_encode_docs
        df = spark.createDataFrame([(1, "the")],
                                   "doc_id long, text string")
        # ('th','e') before ('t','h') can never fire: 'th' does not
        # exist yet, so 'the' stays 3 symbols minus the t+h merge
        fwd = bpe_encode_docs(df, [("t", "h"), ("th", "e")]).collect()
        rev = bpe_encode_docs(df, [("th", "e"), ("t", "h")]).collect()
        assert fwd[0].n_tokens == 1
        assert rev[0].n_tokens == 2

    def test_matches_training_segmentation(self, spark):
        from tika_spark.analysis.bpe import (bpe_encode_docs,
                                             bpe_train, word_counts,
                                             bpe_segment_words)
        df = spark.createDataFrame(
            [(i, "banana bandana ban " * 3) for i in range(4)],
            "doc_id long, text string")
        merges = [(r.left, r.right) for r in
                  bpe_train(df, num_merges=3)
                  .orderBy("rank").collect()]
        enc = {r.id: r.n_tokens
               for r in bpe_encode_docs(df, merges).collect()}
        seg = {r.word: len(r.bpe_syms) for r in bpe_segment_words(
            word_counts(df), merges).collect()}
        want = 3 * (seg["banana"] + seg["bandana"] + seg["ban"])
        assert all(v == want for v in enc.values())
