"""Batch-perceptron quality classifier
(tika_spark/analysis/classifier.py): integer-exact distributed
training vs a hand-stepped NumPy replay."""

import numpy as np
import pytest

from tika_spark.analysis import classifier


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


def _numpy_perceptron(X, y, epochs):
    w = np.zeros(X.shape[1], dtype=np.int64)
    b = 0
    for _ in range(epochs):
        margin = y * (X @ w + b)
        mis = margin <= 0
        w = w + (y[mis, None] * X[mis]).sum(axis=0)
        b = b + int(y[mis].sum())
    return w, b


def _fixture(n=60, d=3, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.randint(0, 30, size=(n, d)).astype(np.int64)
    true_w = np.array([2, -3, 1])
    y = np.where(X @ true_w - 5 >= 0, 1, -1).astype(np.int64)
    return X, y


class TestTrain:
    def test_matches_numpy_replay(self, spark):
        X, y = _fixture()
        rows = [(int(i), *map(int, X[i]), int(y[i]))
                for i in range(len(X))]
        df = spark.createDataFrame(
            rows, "doc_id long, f1 long, f2 long, f3 long, y long")
        for epochs in (1, 3):
            w_df = classifier.perceptron_train(
                df, ["f1", "f2", "f3"], epochs=epochs)
            r = w_df.collect()[0]
            w_np, b_np = _numpy_perceptron(X, y, epochs)
            assert [r.w_f1, r.w_f2, r.w_f3] == list(map(int, w_np))
            assert r.b == b_np

    def test_partitioning_invariance(self, spark):
        X, y = _fixture(n=40)
        rows = [(int(i), *map(int, X[i]), int(y[i]))
                for i in range(len(X))]
        a = spark.createDataFrame(
            rows, "doc_id long, f1 long, f2 long, f3 long, y long")
        b = a.repartition(7, "f2")
        ra = classifier.perceptron_train(a, ["f1", "f2", "f3"]).collect()
        rb = classifier.perceptron_train(b, ["f1", "f2", "f3"]).collect()
        assert ra == rb

    def test_separable_converges(self, spark):
        # y = sign(f1 - f2): linearly separable through the origin
        rows = [(i, 10 + i, i, 1) for i in range(10)] + \
               [(100 + i, i, 10 + i, -1) for i in range(10)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, f1 long, f2 long, y long")
        w = classifier.perceptron_train(df, ["f1", "f2"], epochs=8)
        r = w.collect()[0]
        scores = classifier.perceptron_scores(df, w, ["f1", "f2"])
        joined = scores.join(df, "doc_id")
        acc = joined.filter("pred = y").count() / 20
        assert acc == 1.0
        assert r.w_f1 > 0 and r.w_f2 < 0


class TestScores:
    def test_margin_and_sign_convention(self, spark):
        df = spark.createDataFrame([(1, 5, 1), (2, 0, -1)],
                                   "doc_id long, f1 long, y long")
        w = spark.createDataFrame([(2, -3, 0)],
                                  "w_f1 long, b long, n_mis long")
        out = {r.doc_id: (r.margin, r.pred)
               for r in classifier.perceptron_scores(
                   df, w, ["f1"]).collect()}
        assert out == {1: (7, 1), 2: (-3, -1)}


class TestOracleSql:
    def test_duckdb_replay_matches_spark(self, spark):
        import duckdb
        X, y = _fixture(n=30)
        rows = [(int(i), *map(int, X[i]), int(y[i]))
                for i in range(len(X))]
        df = spark.createDataFrame(
            rows, "doc_id long, f1 long, f2 long, f3 long, y long")
        w = classifier.perceptron_train(df, ["f1", "f2", "f3"], epochs=2)
        got = {r.doc_id: (r.margin, r.pred)
               for r in classifier.perceptron_scores(
                   df, w, ["f1", "f2", "f3"]).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                    + ", ".join(f"({i}, {a}, {b}, {c}, {yy})"
                                for i, a, b, c, yy in rows)
                    + ") v(doc_id, f1, f2, f3, y)")
        sql = classifier.perceptron_oracle_sql(
            {"f1": "f1", "f2": "f2", "f3": "f3"}, "y",
            "SELECT * FROM t", epochs=2)
        exp = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
        assert got == exp
