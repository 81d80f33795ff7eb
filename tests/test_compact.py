"""Parquet small-file compaction (tika_spark/pipeline/compact.py)."""

import os
import tempfile

import pytest

from tika_spark.pipeline import compact as cp


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


def _write_fragmented(spark, path, n_rows=2000, n_files=50):
    (spark.range(n_rows).selectExpr("id", "id * 2 AS v",
                                    "concat('t', id % 7) AS tag")
     .repartition(n_files).write.mode("overwrite").parquet(path))


class TestCompact:
    def test_reduces_files_and_preserves_rows(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d)
        before = cp.dir_stats(spark, d)
        assert before["n_files"] == 50
        stats = cp.compact(spark, d, target_bytes=10**9)
        assert stats["compacted"] and stats["after_files"] == 1
        df = spark.read.parquet(d)
        assert df.count() == 2000
        assert df.selectExpr("sum(v)").collect()[0][0] == 2000 * 1999
        # temp/old dirs are gone
        assert not os.path.exists(d + "__compacting")
        assert not os.path.exists(d + "__old")

    def test_target_sizing(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d)
        total = cp.dir_stats(spark, d)["total_bytes"]
        stats = cp.compact(spark, d, target_bytes=total // 4 + 1)
        assert stats["compacted"]
        assert stats["after_files"] == 4

    def test_noop_when_already_compact(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        (spark.range(100).repartition(1)
         .write.mode("overwrite").parquet(d))
        stats = cp.compact(spark, d, target_bytes=10**9)
        assert stats["compacted"] is False
        assert stats["after_files"] == 1

    def test_hive_partitions_kept(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d, n_rows=700, n_files=20)
        # re-write hive-partitioned fragmented
        df = spark.read.parquet(d)
        (df.repartition(20).write.mode("overwrite")
         .partitionBy("tag").parquet(d))
        stats = cp.compact(spark, d, target_bytes=10**9,
                           partition_cols=["tag"])
        assert stats["compacted"]
        out = spark.read.parquet(d)
        assert out.count() == 700
        assert sorted(r.tag for r in out.select("tag").distinct()
                      .collect()) == [f"t{i}" for i in range(7)]


class TestRecover:
    """compact()'s two-rename swap window: path can vanish between
    rename(path->__old) and rename(__compacting->path)."""

    def _sum_v(self, spark, d):
        return spark.read.parquet(d).selectExpr("sum(v)").collect()[0][0]

    def test_crash_between_renames_installs_rewrite(self, spark):
        import shutil
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d, n_rows=500, n_files=10)
        want = self._sum_v(spark, d)
        # simulate: rewrite finished+verified in __compacting, original
        # moved to __old, crash before the final rename
        shutil.copytree(d, d + "__compacting")
        os.rename(d, d + "__old")
        assert not os.path.exists(d)
        assert cp.recover(spark, d) == "installed_rewrite"
        assert os.path.exists(d)
        assert not os.path.exists(d + "__old")
        assert self._sum_v(spark, d) == want

    def test_crash_after_first_rename_only_restores_old(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d, n_rows=500, n_files=10)
        want = self._sum_v(spark, d)
        os.rename(d, d + "__old")
        assert cp.recover(spark, d) == "restored_old"
        assert self._sum_v(spark, d) == want

    def test_recover_noop_and_compact_self_heals(self, spark):
        d = os.path.join(tempfile.mkdtemp(prefix="cmp_"), "t")
        _write_fragmented(spark, d, n_rows=500, n_files=10)
        assert cp.recover(spark, d) == "ok"
        assert cp.recover(spark, d + "_nonexistent") == "missing"
        # a crashed swap heals transparently on the next compact()
        os.rename(d, d + "__old")
        stats = cp.compact(spark, d, target_bytes=10**9)
        assert stats["compacted"] and stats["after_files"] == 1
        assert spark.read.parquet(d).count() == 500
