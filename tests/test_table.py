"""Snapshot-versioned table layer (pipeline/table.py): atomic
rename-commits, time travel, incremental reads, compaction, rollback,
crash-orphan vacuum, retention, and commit races."""

import json
import os

import pytest

from tika_spark.pipeline.table import SnapshotTable


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tab")


class TestBasics:
    def test_create_append_read(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 100))
        assert t.current_snapshot() == 1
        got = t.read()
        assert got.count() == 100
        assert [f.name for f in got.schema.fields] == ["doc_id",
                                                       "text"]
        assert got.agg({"doc_id": "sum"}).collect()[0][0] == 4950

    def test_time_travel(self, spark, root):
        t = SnapshotTable.create(spark, root)
        s1 = t.append(_docs(spark, 0, 50))
        s2 = t.append(_docs(spark, 50, 100))
        assert (s1, s2) == (1, 2)
        assert t.read(s1).count() == 50
        assert t.read(s2).count() == 100
        assert t.read().count() == 100

    def test_incremental(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 50))
        s1 = t.current_snapshot()
        s2 = t.append(_docs(spark, 50, 80))
        delta = t.incremental(s1, s2)
        assert delta.count() == 30
        assert delta.agg({"doc_id": "min"}).collect()[0][0] == 50

    def test_overwrite_and_rollback(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 100))
        s1 = t.current_snapshot()
        s2 = t.overwrite(_docs(spark, 0, 10))
        assert t.read().count() == 10
        s3 = t.rollback(s1)
        assert s3 == s2 + 1
        assert t.read().count() == 100          # history stays linear
        assert [s["operation"] for s in t.snapshots()] == [
            "append", "overwrite", "rollback"]

    def test_empty_read_schema(self, spark, root):
        t = SnapshotTable.create(spark, root)
        t.append(_docs(spark, 0, 0))
        got = t.read()
        assert got.count() == 0
        assert [f.name for f in got.schema.fields] == ["doc_id",
                                                       "text"]

    def test_manifest_lineage(self, spark, root):
        t = SnapshotTable.create(
            spark, root, _docs(spark, 0, 100).repartition(4))
        snap = t.snapshots()[-1]
        assert snap["n_rows"] == 100
        assert snap["n_files"] >= 2
        m = t._manifest(t.current_snapshot())
        assert sum(f["rows"] for f in m["files"]) == 100
        assert all(f["bytes"] > 0 for f in m["files"])


class TestCompaction:
    def test_compact_preserves_rows(self, spark, root):
        t = SnapshotTable.create(spark, root)
        for k in range(4):
            t.append(_docs(spark, 25 * k, 25 * (k + 1))
                     .repartition(3))
        before = t.current_snapshot()
        n_before = t.snapshots()[-1]["n_files"]
        sid = t.compact(target_bytes=1 << 30)
        assert sid == before + 1
        assert t.snapshots()[-1]["n_files"] == 1 < n_before
        assert t.read().agg({"doc_id": "sum"}).collect()[0][0] == 4950
        # readers pinned to the old snapshot are untouched
        assert t.read(before).count() == 100

    def test_compact_noop(self, spark, root):
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 10).coalesce(1))
        sid = t.current_snapshot()
        assert t.compact(target_bytes=1 << 30) == sid


class TestCrashSafety:
    def test_orphans_never_break_reads(self, spark, root):
        """A writer that crashed after moving data files but before
        the manifest rename leaves orphans — reads are unaffected and
        vacuum sweeps them without touching live files."""
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 100))
        # simulate the crash: stage files for a snapshot that never
        # commits
        t._stage_files(_docs(spark, 100, 200), snap_hint=99)
        assert t.read().count() == 100
        gone = t.vacuum()
        assert gone and all(p.startswith("data/s00000099")
                            for p in gone)
        assert t.read().count() == 100
        assert t.vacuum() == []                 # live files survive

    def test_tmp_manifest_is_invisible(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 10))
        t._write_bytes("metadata/.tmp-dead.json", b"{}")
        assert t.current_snapshot() == 1
        assert t.read().count() == 10

    def test_commit_race_retries(self, spark, root):
        """If another writer takes the next snapshot id between the
        stage and the rename, the commit retries against the new
        head instead of clobbering or failing."""
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 10))
        # a rival commits snapshot 2 out from under us
        rival = dict(t._manifest(1), snapshot_id=2, parent_id=1)
        t._write_bytes("metadata/snap-00000002.json",
                       json.dumps(rival).encode())
        sid = t.append(_docs(spark, 10, 20))
        assert sid == 3
        assert t.read().count() == 20

    def test_load_requires_table(self, spark, root):
        with pytest.raises(ValueError, match="no snapshot table"):
            SnapshotTable.load(spark, root)
        SnapshotTable.create(spark, root, _docs(spark, 0, 5))
        with pytest.raises(ValueError, match="already exists"):
            SnapshotTable.create(spark, root)


class TestRetention:
    def test_expire_then_vacuum(self, spark, root):
        t = SnapshotTable.create(spark, root)
        t.append(_docs(spark, 0, 50))
        t.overwrite(_docs(spark, 50, 60))
        t.overwrite(_docs(spark, 60, 100))
        dropped = t.expire_snapshots(keep_last=1)
        assert dropped == [1, 2]
        gone = t.vacuum()
        assert gone                              # old file sets swept
        assert t.read().count() == 40
        data_files = [f for f in os.listdir(os.path.join(root, "data"))
                      if not f.startswith((".", "_"))]
        m = t._manifest(t.current_snapshot())
        assert sorted("data/" + f for f in data_files) == sorted(
            f["path"] for f in m["files"])


class TestCheckpointTable:
    """run_checkpointed_table: checkpoint manifests AS table commits
    (the north-star layout) — interrupted runs resume from snapshot
    summaries, crashed waves leave only invisible orphans."""

    def _pages(self, spark, n=80):
        import pyspark.sql.functions as F
        return spark.range(n).select(
            F.concat(F.lit("http://h"), F.pmod("id", F.lit(7)),
                     F.lit(".test/p"), F.col("id")).alias("url"),
            F.encode(F.concat(
                F.lit("<html><head><title>T</title></head><body>"
                      "<p>body "),
                F.col("id").cast("string"),
                F.lit("</p></body></html>")), "UTF-8").alias("html"))

    def test_interrupt_then_resume_matches_one_shot(self, spark,
                                                    tmp_path):
        from tika_spark.pipeline import checkpoint as ck
        from tika_spark.pipeline.job import extract
        pages = self._pages(spark)
        root = str(tmp_path / "tab")

        s1 = ck.run_checkpointed_table(pages, root, n_buckets=8,
                                       wave_size=3, max_waves=1)
        assert s1["buckets_processed"] == 3 and not s1["complete"]
        t = SnapshotTable.load(spark, root)
        assert ck.table_done_buckets(t) == set(
            t.snapshots()[-1]["summary"]["buckets"]) | set(
            t.snapshots()[0]["summary"]["buckets"])

        s2 = ck.run_checkpointed_table(pages, root, n_buckets=8,
                                       wave_size=3)
        assert s2["buckets_done_before"] == 3
        assert s2["buckets_processed"] == 5 and s2["complete"]

        got = t.read()
        want = extract(pages, mode="text").drop("children")
        assert got.count() == want.count() == 80
        assert got.select("url").distinct().count() == 80
        a = {(r["url"], r["text"]) for r in
             got.select("url", "text").collect()}
        b = {(r["url"], r["text"]) for r in
             want.select("url", "text").collect()}
        assert a == b
        # wave stats rode the snapshot summaries
        assert sum(s["summary"]["n_rows"]
                   for s in t.snapshots()) == 80

    def test_crashed_wave_is_invisible_and_vacuumable(self, spark,
                                                      tmp_path):
        from tika_spark.pipeline import checkpoint as ck
        pages = self._pages(spark, 40)
        root = str(tmp_path / "tab")
        ck.run_checkpointed_table(pages, root, n_buckets=4,
                                  wave_size=2, max_waves=1)
        t = SnapshotTable.load(spark, root)
        n_before = t.read().count()
        # simulate a crash AFTER staging, BEFORE the snapshot commit
        t.stage(t.read())
        assert t.read().count() == n_before        # still invisible
        # the resume neither sees nor double-counts the orphans
        s = ck.run_checkpointed_table(pages, root, n_buckets=4,
                                      wave_size=2)
        assert s["complete"]
        t2 = SnapshotTable.load(spark, root)
        assert t2.read().count() == 40
        assert t2.read().select("url").distinct().count() == 40
        assert t2.vacuum()                         # orphans swept
        assert t2.read().count() == 40

    def test_rerun_is_a_noop(self, spark, tmp_path):
        from tika_spark.pipeline import checkpoint as ck
        pages = self._pages(spark, 20)
        root = str(tmp_path / "tab")
        ck.run_checkpointed_table(pages, root, n_buckets=4,
                                  wave_size=4)
        head = SnapshotTable.load(spark, root).current_snapshot()
        s = ck.run_checkpointed_table(pages, root, n_buckets=4,
                                      wave_size=4)
        assert s["buckets_processed"] == 0 and s["complete"]
        assert SnapshotTable.load(spark, root).current_snapshot() \
            == head


class TestMergeDelete:
    def test_merge_upserts(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 100))
        src = spark.range(90, 110).selectExpr(
            "id AS doc_id", "concat('new-', id) AS text")
        sid = t.merge(src, ["doc_id"])
        got = t.read(sid)
        assert got.count() == 110                      # 10 inserted
        rows = {r.doc_id: r.text for r in got.collect()}
        assert rows[95] == "new-95" and rows[105] == "new-105"
        assert rows[10] == "text-10"                   # untouched
        m = t.snapshots()[-1]
        assert m["operation"] == "merge"

    def test_merge_prunes_untouched_files(self, spark, root):
        # two appends -> two disjoint file sets; merging keys that
        # live only in the second must carry the first verbatim
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 50).coalesce(1))
        first_files = {f["path"] for f in t._manifest(1)["files"]}
        t.append(_docs(spark, 50, 100).coalesce(1))
        src = spark.range(60, 70).selectExpr(
            "id AS doc_id", "concat('new-', id) AS text")
        sid = t.merge(src, ["doc_id"])
        m = t._manifest(sid)
        paths = {f["path"] for f in m["files"]}
        assert first_files <= paths           # carried, not rewritten
        assert m["summary"]["touched_files"] == 1
        assert t.read(sid).count() == 100

    def test_merge_insert_only_and_schema_guard(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 10))
        ins = spark.range(100, 105).selectExpr(
            "id AS doc_id", "concat('text-', id) AS text")
        sid = t.merge(ins, ["doc_id"])
        assert t.read(sid).count() == 15
        assert t.snapshots()[-1]["summary"]["touched_files"] == 0
        bad = spark.range(5).selectExpr("id AS doc_id")
        with pytest.raises(ValueError):
            t.merge(bad, ["doc_id"])

    def test_delete_where(self, spark, root):
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 50).coalesce(1))
        t.append(_docs(spark, 50, 100).coalesce(1))
        from pyspark.sql import functions as F
        sid = t.delete_where(F.col("doc_id") % 10 == 0)
        got = t.read(sid)
        assert got.count() == 90
        assert got.filter("doc_id % 10 = 0").count() == 0
        # time travel still sees the deleted rows
        assert t.read(sid - 1).count() == 100

    def test_delete_null_cond_keeps_row(self, spark, root):
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [(1, "a"), (2, None)], "doc_id long, text string")
        t = SnapshotTable.create(spark, root, df)
        sid = t.delete_where(F.length("text") > 100)   # NULL for row 2
        assert t.read(sid).count() == 2


class TestFileStats:
    def test_stats_recorded_and_pruned(self, spark, root):
        # 4 disjoint id-range files -> a narrow range scans 1 file
        t = SnapshotTable.create(spark, root, stats_cols=["doc_id"])
        for lo in (0, 100, 200, 300):
            t.append(_docs(spark, lo, lo + 100).coalesce(1))
        m = t._manifest(t.current_snapshot())
        assert all("stats" in f and "doc_id" in f["stats"]
                   for f in m["files"])
        kept, total = t.prune_files("doc_id", 150, 160)
        assert total == 4 and len(kept) == 1
        got = t.read_where("doc_id", 150, 160)
        assert got.count() == 11
        assert got.agg({"doc_id": "min"}).collect()[0][0] == 150

    def test_read_where_matches_full_filter(self, spark, root):
        t = SnapshotTable.create(spark, root, stats_cols=["doc_id"])
        for lo in (0, 50):
            t.append(_docs(spark, lo, lo + 50).coalesce(1))
        a = sorted(r.doc_id for r in
                   t.read_where("doc_id", 30, 70).collect())
        b = sorted(r.doc_id for r in t.read()
                   .filter("doc_id between 30 and 70").collect())
        assert a == b

    def test_stats_survive_load_and_merge(self, spark, root):
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 100).coalesce(1),
                                 stats_cols=["doc_id"])
        t2 = SnapshotTable.load(spark, root)
        assert t2.stats_cols == ["doc_id"]
        src = spark.range(200, 210).selectExpr(
            "id AS doc_id", "concat('new-', id) AS text")
        sid = t2.merge(src, ["doc_id"])
        m = t2._manifest(sid)
        news = [f for f in m["files"] if "stats" in f]
        assert news      # merged-in files carry stats too
        kept, total = t2.prune_files("doc_id", 205, 206)
        assert len(kept) < total

    def test_no_stats_table_keeps_all_files(self, spark, root):
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 100).coalesce(1))
        kept, total = t.prune_files("doc_id", 5, 6)
        assert len(kept) == total        # conservatively unpruned
        assert t.read_where("doc_id", 5, 6).count() == 2


class TestZOrder:
    def test_zkey_interleave_exact(self, spark):
        from tika_spark.pipeline.table import zorder_key
        # x,y in [0,3], bits=2: scaled value == raw value; morton
        # interleave is x1 y1 x0 y0
        df = spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)],
            "a long, b long")
        out = {(r.a, r.b): r.zkey
               for r in zorder_key(df, ["a", "b"], bits=2).collect()}
        def morton(x, y):
            z = 0
            for b in range(2):
                z |= ((x >> b) & 1) << (2 * b + 1)
                z |= ((y >> b) & 1) << (2 * b)
            return z
        assert out == {(x, y): morton(x, y)
                       for x in range(4) for y in range(4)}
        # locality: the four quadrant corners sort into quadrants
        assert out[(0, 0)] < out[(0, 3)] < out[(3, 0)] < out[(3, 3)]

    def test_zorder_write_prunes_both_columns(self, spark, tmp_path):
        from tika_spark.pipeline.table import (SnapshotTable,
                                               zorder_key)
        df = spark.createDataFrame(
            [(i, (i * 7919) % 256, i % 256) for i in range(1024)],
            "doc_id long, a long, b long")
        z = (zorder_key(df, ["a", "b"], bits=8)
             .repartitionByRange(4, "zkey")
             .sortWithinPartitions("zkey").drop("zkey"))
        root = str(tmp_path / "ztab")
        t = SnapshotTable.create(spark, root, z,
                                 stats_cols=["a", "b"])
        ka, na = t.prune_files("a", 0, 40)
        kb, nb = t.prune_files("b", 0, 40)
        assert na == nb >= 4
        # a z-ordered layout prunes on BOTH dimensions
        assert len(ka) < na and len(kb) < nb
        # and the scans stay exact
        assert t.read_where("a", 0, 40).count() == \
            df.filter("a between 0 and 40").count()
        assert t.read_where("b", 0, 40).count() == \
            df.filter("b between 0 and 40").count()


class TestSchemaEvolution:
    def test_add_column_reads_null_then_values(self, spark, root):
        t = SnapshotTable.create(spark, root,
                                 _docs(spark, 0, 20).coalesce(1))
        sid = t.evolve_schema([("lang", "string")])
        got = t.read(sid)
        assert [f.name for f in got.schema.fields] == [
            "doc_id", "text", "lang"]
        assert got.filter("lang is null").count() == 20
        # post-evolution appends carry real values
        t.append(spark.range(20, 25).selectExpr(
            "id AS doc_id", "concat('text-', id) AS text",
            "'en' AS lang"))
        final = t.read()
        assert final.count() == 25
        assert final.filter("lang = 'en'").count() == 5
        # time travel still shows the narrow schema
        assert [f.name for f in t.read(1).schema.fields] == [
            "doc_id", "text"]

    def test_duplicate_column_rejected(self, spark, root):
        t = SnapshotTable.create(spark, root, _docs(spark, 0, 5))
        with pytest.raises(ValueError, match="exists"):
            t.evolve_schema([("text", "string")])


class TestBloomFilters:
    def test_bloom_recorded_and_point_pruned(self, spark, root):
        t = SnapshotTable.create(spark, root, bloom_cols=["text"])
        for lo in (0, 100, 200, 300):
            t.append(_docs(spark, lo, lo + 100).coalesce(1))
        m = t._manifest(t.current_snapshot())
        assert all("bloom" in f and "text" in f["bloom"]
                   for f in m["files"])
        kept, total = t.prune_files_eq("text", "text-250")
        assert total == 4 and len(kept) == 1
        rows = t.read_eq("text", "text-250").collect()
        assert len(rows) == 1 and rows[0].doc_id == 250

    def test_no_false_negatives_every_key(self, spark, root):
        t = SnapshotTable.create(spark, root, bloom_cols=["doc_id"])
        for lo in (0, 40):
            t.append(_docs(spark, lo, lo + 40).coalesce(1))
        for key in range(0, 80, 7):
            kept, _ = t.prune_files_eq("doc_id", key)
            assert kept, f"false negative for {key}"
            got = t.read_eq("doc_id", key).collect()
            assert len(got) == 1 and got[0].doc_id == key

    def test_absent_key_prunes_everything(self, spark, root):
        t = SnapshotTable.create(spark, root, bloom_cols=["doc_id"])
        t.append(_docs(spark, 0, 200).coalesce(2))
        kept, total = t.prune_files_eq("doc_id", 987654321)
        assert kept == [] and total == 2
        assert t.read_eq("doc_id", 987654321).count() == 0

    def test_bloom_cols_persist_and_survive_compact(self, spark, root):
        t = SnapshotTable.create(spark, root, bloom_cols=["doc_id"])
        for lo in (0, 50, 100, 150):
            t.append(_docs(spark, lo, lo + 50).coalesce(1))
        t2 = SnapshotTable.load(spark, root)
        assert t2.bloom_cols == ["doc_id"]
        t2.compact(target_bytes=1 << 30)   # everything into one file
        m = t2._manifest(t2.current_snapshot())
        assert all("bloom" in f and "doc_id" in f["bloom"]
                   for f in m["files"])
        rows = t2.read_eq("doc_id", 125).collect()
        assert len(rows) == 1 and rows[0].doc_id == 125

    def test_stats_and_bloom_compose(self, spark, root):
        t = SnapshotTable.create(spark, root, stats_cols=["doc_id"],
                                 bloom_cols=["doc_id"])
        for lo in (0, 100):
            t.append(_docs(spark, lo, lo + 100).coalesce(1))
        kept, total = t.prune_files_eq("doc_id", 150)
        assert total == 2 and len(kept) == 1
