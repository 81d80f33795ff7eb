"""tika_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of Apache Tika
(reference: tballison/tika) as a staged Spark DataFrame job:

    detect (MIME sniff) -> parse (per-format) -> block-classify
        (boilerplate) -> emit text + spans + metadata

All per-document logic runs inside Arrow-batched pandas UDFs /
``mapInPandas`` (never per-row Python UDFs); all relational glue
(routing, repartitioning, aggregation, resume anti-joins) is plain
Catalyst-optimizable DataFrame code.

Public API:
    extract(df, mode=...)          -- the staged extraction job
    tika_spark.pipeline.runner     -- checkpoint/resume batch driver
    tika_spark.analysis            -- corpus ops (dedup, ANN, curation)
    tika_spark.analysis.runner     -- corpus-op batch driver
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep `import tika_spark.mime` usable without a SparkSession
    if name == "extract":
        from tika_spark.pipeline.job import extract
        return extract
    raise AttributeError(name)
