"""Bloom frontier filters (tika_spark/analysis/bloom.py): relational
and bitmap forms agree; no false negatives; deterministic."""

import pytest

from tika_spark.analysis import bloom


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


M, K = 1 << 16, 5


class TestRelational:
    def test_no_false_negatives(self, spark):
        seen = spark.createDataFrame(
            [(f"http://a.ex/p{i}",) for i in range(200)], "url string")
        bits = bloom.build_bits(seen, m_bits=M, k=K)
        got = {r.url: r.maybe_seen
               for r in bloom.probe_bits(seen, bits, m_bits=M,
                                         k=K).collect()}
        assert all(got.values()) and len(got) == 200

    def test_unseen_mostly_negative(self, spark):
        seen = spark.createDataFrame(
            [(f"http://a.ex/p{i}",) for i in range(200)], "url string")
        bits = bloom.build_bits(seen, m_bits=M, k=K)
        unseen = spark.createDataFrame(
            [(f"http://b.ex/q{i}",) for i in range(200)], "url string")
        fp = sum(r.maybe_seen for r in bloom.probe_bits(
            unseen, bits, m_bits=M, k=K).collect())
        # 200 keys * 5 bits in 65536: fp rate ~ (1000/65536)^5 ~ 0
        assert fp == 0

    def test_deterministic_bit_set(self, spark):
        df = spark.createDataFrame([("u1",), ("u2",)], "url string")
        a = sorted(r.bit_index for r in
                   bloom.build_bits(df, m_bits=M, k=K).collect())
        b = sorted(r.bit_index for r in
                   bloom.build_bits(df.repartition(3), m_bits=M,
                                    k=K).collect())
        assert a == b and len(a) <= 2 * K


class TestBitmap:
    def test_forms_agree(self, spark):
        seen = spark.createDataFrame(
            [(f"http://a.ex/p{i}",) for i in range(100)], "url string")
        bits = bloom.build_bits(seen, m_bits=M, k=K)
        bm = bloom.to_bitmap(bits, m_bits=M)
        probe = spark.createDataFrame(
            [(f"http://a.ex/p{i}",) for i in range(0, 200, 7)],
            "url string")
        rel = {r.url: r.maybe_seen for r in bloom.probe_bits(
            probe, bits, m_bits=M, k=K).collect()}
        bmp = {r.url: r.maybe_seen for r in bloom.probe_bitmap(
            probe, bm, m_bits=M, k=K).collect()}
        assert rel == bmp
        assert rel["http://a.ex/p0"] is True
        assert rel["http://a.ex/p147"] is False

    def test_bitmap_popcount_matches_bits(self, spark):
        import numpy as np
        seen = spark.createDataFrame([("x",), ("y",)], "url string")
        bits = bloom.build_bits(seen, m_bits=M, k=K)
        bm = np.frombuffer(bloom.to_bitmap(bits, m_bits=M),
                           dtype=np.uint8)
        assert int(np.unpackbits(bm).sum()) == bits.count()


class TestCountMin:
    def test_never_undercounts_and_exact_when_sparse(self, spark):
        import pyspark.sql.functions as F

        from tika_spark.analysis.bloom import cms_build, cms_query
        # word frequencies: word w{i} appears i+1 times
        rows = [(f"w{i}",) for i in range(30) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "word string")
        sk = cms_build(df, "word")
        keys = spark.createDataFrame([(f"w{i}",) for i in range(30)],
                                     "word string")
        got = {r.word: r.est_count
               for r in cms_query(keys, sk, "word").collect()}
        for i in range(30):
            assert got[f"w{i}"] >= i + 1       # CMS never undercounts
        # 30 keys in 4x16384 counters: collisions vanishingly unlikely
        assert got == {f"w{i}": i + 1 for i in range(30)}

    def test_unseen_key_zero(self, spark):
        from tika_spark.analysis.bloom import cms_build, cms_query
        df = spark.createDataFrame([("a",), ("a",)], "k string")
        sk = cms_build(df, "k")
        got = cms_query(spark.createDataFrame([("zzz",)], "k string"),
                        sk, "k").collect()[0]
        assert got.est_count == 0

    def test_weighted_build(self, spark):
        from tika_spark.analysis.bloom import cms_build, cms_query
        df = spark.createDataFrame([("h1", 10), ("h1", 5), ("h2", 1)],
                                   "host string, n long")
        sk = cms_build(df, "host", weight_col="n")
        got = {r.host: r.est_count for r in cms_query(
            spark.createDataFrame([("h1",), ("h2",)], "host string"),
            sk, "host").collect()}
        assert got == {"h1": 15, "h2": 1}

    def test_partitioning_invariance(self, spark):
        from tika_spark.analysis.bloom import cms_build
        rows = [(f"k{i % 7}",) for i in range(100)]
        a = spark.createDataFrame(rows, "k string")
        sa = sorted(map(tuple, cms_build(a, "k").collect()))
        sb = sorted(map(tuple,
                        cms_build(a.repartition(9), "k").collect()))
        assert sa == sb
