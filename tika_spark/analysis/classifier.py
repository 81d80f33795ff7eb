"""Distributed-trained document quality classifier (batch perceptron).

No reference counterpart (SURVEY §2.I widening): web-corpus pipelines
gate documents with a learned quality classifier (fastText-style
linear models in CCNet/RefinedWeb/FineWeb). This module trains a
LINEAR classifier over the integer quality features
(`textstats.quality_features`) entirely as Spark aggregations — no
driver-side data, no MLlib — and in exact integer arithmetic, so
training is bit-reproducible under any partitioning/retry schedule
and a SQL oracle can replay every epoch.

Algorithm — full-batch perceptron (Rosenblatt; the batch variant sums
updates over all misclassified rows per epoch, which makes the update
order-independent and therefore distribution-safe):

    margin_i = y_i * (b + Σ_j w_j * x_ij)          (BIGINT)
    epoch:  w_j += Σ_{margin_i <= 0} y_i * x_ij
            b   += Σ_{margin_i <= 0} y_i

Labels are ±1. Features and weights are BIGINT throughout; with
|x| < 2^20 and < 2^20 misclassified rows per epoch the sums stay far
inside 64 bits. In production the labels come from a curated seed set
(human tags, LLM judgments over a sample); training cost per epoch is
one scan + one map-side-combinable aggregate over the feature table.

Scale notes: the weight state is ONE row — it rides along as a
crossJoin (broadcast-trivial), never a driver collect. Each epoch
adds one agg stage over the persisted features; for dozens of epochs
localCheckpoint() the weights row every ~10 epochs to truncate plan
growth. The feature table is persisted once by the caller.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def perceptron_train(features: DataFrame, feature_cols: list[str],
                     label_col: str = "y",
                     epochs: int = 3) -> DataFrame:
    """Train; returns a ONE-row DataFrame with columns ``w_<feature>``
    (BIGINT) for each feature, ``b`` (bias), and ``n_mis`` (the
    misclassified count entering the last update — a convergence
    signal). ``label_col`` must hold ±1."""
    spark = features.sparkSession
    wcols = [f"w_{c}" for c in feature_cols]
    weights = spark.createDataFrame(
        [tuple([0] * (len(wcols) + 2))],
        ", ".join(f"{c} long" for c in [*wcols, "b", "n_mis"]))
    for _ in range(epochs):
        joined = features.crossJoin(F.broadcast(weights))
        margin = (F.col("b") + sum(
            F.col(w) * F.col(c) for w, c in zip(wcols, feature_cols))
        ) * F.col(label_col)
        mis = joined.filter(margin <= 0)
        upd = mis.agg(
            *[F.coalesce(F.sum(F.col(label_col) * F.col(c)), F.lit(0))
              .cast("long").alias(f"d_{c}") for c in feature_cols],
            F.coalesce(F.sum(label_col), F.lit(0)).cast("long")
            .alias("d_b"),
            F.count(F.lit(1)).cast("long").alias("mis_n"))
        weights = (weights.crossJoin(F.broadcast(upd)).select(
            *[(F.col(w) + F.col(f"d_{c}")).cast("long").alias(w)
              for w, c in zip(wcols, feature_cols)],
            (F.col("b") + F.col("d_b")).cast("long").alias("b"),
            F.col("mis_n").alias("n_mis"))
            # truncate lineage: each epoch's weights reference the
            # previous epoch's twice (margin filter + update), so the
            # plan tree compounds ~2^epochs without an eager
            # localCheckpoint (the one-row state makes this free)
            .localCheckpoint(eager=True))
    return weights


def perceptron_scores(features: DataFrame, weights: DataFrame,
                      feature_cols: list[str],
                      id_col: str = "doc_id") -> DataFrame:
    """Apply a trained one-row weight table: per-doc integer margin
    (b + w·x) and the ±1 prediction (zero margin predicts +1, the
    perceptron's sign convention here). Map-only after the broadcast."""
    wcols = [f"w_{c}" for c in feature_cols]
    raw = F.col("b") + sum(F.col(w) * F.col(c)
                           for w, c in zip(wcols, feature_cols))
    return (features.crossJoin(F.broadcast(weights))
            .select(F.col(id_col),
                    raw.cast("long").alias("margin"),
                    F.when(raw >= 0, F.lit(1)).otherwise(F.lit(-1))
                    .cast("long").alias("pred")))


def perceptron_oracle_sql(feature_exprs: dict[str, str], label_expr: str,
                          source_sql: str, id_expr: str = "doc_id",
                          epochs: int = 3) -> str:
    """DuckDB replay of `perceptron_train` + `perceptron_scores`:
    unrolled epochs as CTEs over the same integer math.

    ``feature_exprs`` maps feature name → SQL expression over
    ``source_sql`` rows; ``label_expr`` must yield ±1.
    """
    names = list(feature_exprs)
    feats = ", ".join(f"({e})::BIGINT AS {n}"
                      for n, e in feature_exprs.items())
    sql = [f"WITH f AS (SELECT {id_expr} AS id, {feats}, "
           f"({label_expr})::BIGINT AS y FROM ({source_sql})), "]
    zeros = ", ".join(f"0::BIGINT AS w_{n}" for n in names)
    sql.append(f"e0 AS (SELECT {zeros}, 0::BIGINT AS b), ")
    for i in range(epochs):
        p, c = f"e{i}", f"e{i + 1}"
        dot = " + ".join(f"{p}.w_{n} * f.{n}" for n in names)
        upds = ", ".join(
            f"{p}.w_{n} + (SELECT COALESCE(SUM(f.y * f.{n}), 0) FROM f, "
            f"{p} WHERE f.y * ({p}.b + {dot}) <= 0) AS w_{n}"
            for n in names)
        sql.append(
            f"{c} AS (SELECT {upds}, "
            f"{p}.b + (SELECT COALESCE(SUM(f.y), 0) FROM f, {p} "
            f"WHERE f.y * ({p}.b + {dot}) <= 0) AS b FROM {p}), ")
    last = f"e{epochs}"
    dot = " + ".join(f"{last}.w_{n} * f.{n}" for n in names)
    return ("".join(sql)[:-2]
            + f" SELECT f.id AS {id_expr}, "
            f"({last}.b + {dot})::BIGINT AS margin, "
            f"(CASE WHEN {last}.b + {dot} >= 0 THEN 1 ELSE -1 END)"
            f"::BIGINT AS pred FROM f, {last}")
