"""SQLite + DBF parsers (tika_spark/dbparse.py): the reference's
jdbc/SQLite3Parser and dbf/DBFReader table-shaped output."""

from tika_spark.dbparse import extract_dbf, extract_sqlite
from tika_spark.fixtures.dbgen import make_dbf, make_sqlite


class TestSqlite:
    def test_tables_headers_rows(self):
        db = make_sqlite([
            ("docs", ["id INTEGER", "body TEXT"],
             [(1, "alpha"), (2, "beta")]),
            ("tags", ["tag TEXT"], [("x",), ("y",)])])
        r = extract_sqlite(db)
        assert r["status"] == "ok"
        assert r["text"] == ("docs\nid\tbody\n1\talpha\n2\tbeta\n"
                             "tags\ntag\nx\ny\n")
        assert r["metadata"]["Database-Tables"] == ["docs", "tags"]
        assert [s[2] for s in r["spans"]] == ["table", "table"]

    def test_deterministic_bytes(self):
        args = [("t", ["a INTEGER"], [(7,), (8,)])]
        assert make_sqlite(args) == make_sqlite(args)

    def test_blob_cells_become_children(self):
        db = make_sqlite([("files", ["name TEXT", "data BLOB"],
                           [("a.txt", b"payload")])])
        r = extract_sqlite(db)
        assert r["children"] == [("files/0/data", b"payload")]
        # blob cell renders empty in the text table
        assert r["text"] == "files\nname\tdata\na.txt\t\n"

    def test_null_and_float_cells(self):
        db = make_sqlite([("t", ["a INTEGER", "b REAL"],
                           [(None, 1.5)])])
        r = extract_sqlite(db)
        assert r["text"] == "t\na\tb\n\t1.5\n"

    def test_internal_tables_skipped(self):
        db = make_sqlite([("t", ["a INTEGER PRIMARY KEY AUTOINCREMENT",
                                 "b TEXT"], [])])
        r = extract_sqlite(db)  # sqlite_sequence must not appear
        assert r["metadata"]["Database-Tables"] == ["t"]

    def test_corrupt_is_error_row(self):
        r = extract_sqlite(b"SQLite format 3\x00" + b"x" * 100)
        assert r["status"] == "error" and r["error"]

    def test_quoted_table_name(self):
        db = make_sqlite([('we"ird', ["a TEXT"], [("v",)])])
        r = extract_sqlite(db)
        assert r["status"] == "ok"
        assert 'we"ird\na\nv\n' == r["text"]


class TestDbf:
    def test_header_and_records(self):
        dbf = make_dbf([("NAME", "C", 10), ("AGE", "N", 3)],
                       [("ann", 34), ("bo", 7)])
        r = extract_dbf(dbf)
        assert r["status"] == "ok"
        assert r["text"] == "NAME\tAGE\nann\t34\nbo\t7\n"
        assert r["metadata"]["Record-Count"] == ["2"]

    def test_deleted_records_skipped(self):
        dbf = make_dbf([("N", "C", 4)], [("a",), ("b",), ("c",)],
                       deleted={1})
        r = extract_dbf(dbf)
        assert r["text"] == "N\na\nc\n"

    def test_truncated_body_stops_clean(self):
        dbf = make_dbf([("N", "C", 6)], [("one",), ("two",)])
        r = extract_dbf(dbf[:len(dbf) - 9])  # cut into last record
        assert r["status"] == "ok"
        assert r["text"] == "N\none\n"

    def test_not_dbf_is_error_row(self):
        r = extract_dbf(b"\xffnot a dbf at all")
        assert r["status"] == "error"


def test_routes_through_pipeline_detect():
    from tika_spark.mime.detector import detect
    from tika_spark.pipeline.stages import route_for_mime
    db = make_sqlite([("t", ["a TEXT"], [("v",)])])
    assert detect(db, "x.db") == "application/x-sqlite3"
    assert route_for_mime("application/x-sqlite3") == "sqlite"
    assert route_for_mime("application/x-dbf") == "dbf"
    assert detect(make_dbf([("A", "C", 2)], [("z",)]), "t.dbf") \
        == "application/x-dbf"
