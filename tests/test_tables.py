"""HTML table mining (tika_spark/analysis/tables.py)."""

import pytest

from tika_spark.analysis.tables import html_tables, page_tables


class TestPageTables:
    def test_grid_with_thead_tbody(self):
        html = (b"<table><thead><tr><th>k</th><th>v</th></tr></thead>"
                b"<tbody><tr><td>a</td><td>1</td></tr>"
                b"<tr><td>b</td><td>2</td></tr></tbody></table>")
        got = page_tables(html)
        assert got == [(1, 1, ["k", "v"]), (1, 2, ["a", "1"]),
                       (1, 3, ["b", "2"])]

    def test_two_tables_document_order(self):
        html = (b"<p>x</p><table><tr><td>one</td></tr></table>"
                b"<div><table><tr><td>two</td></tr></table></div>")
        got = page_tables(html)
        assert got == [(1, 1, ["one"]), (2, 1, ["two"])]

    def test_nested_table_owns_its_rows(self):
        html = (b"<table><tr><td>outer"
                b"<table><tr><td>inner</td></tr></table>"
                b"</td></tr></table>")
        got = page_tables(html)
        # outer cell text excludes the nested table's text; nested
        # table is table 2
        assert got == [(1, 1, ["outer"]), (2, 1, ["inner"])]

    def test_whitespace_collapse_and_script_discard(self):
        html = (b"<table><tr><td> a \n  b <script>zz</script></td>"
                b"<td><b>bold</b> text</td></tr></table>")
        assert page_tables(html) == [(1, 1, ["a b", "bold text"])]

    def test_ragged_rows_kept_raw(self):
        html = (b"<table><tr><td>a</td><td>b</td></tr>"
                b"<tr><td>only</td></tr></table>")
        got = page_tables(html)
        assert [len(c) for _, _, c in got] == [2, 1]

    def test_no_tables(self):
        assert page_tables(b"<p>plain</p>") == []

    def test_empty_and_garbage(self):
        assert page_tables(b"") == []
        assert isinstance(page_tables(b"\xff\xfe<table><tr>"), list)


class TestDataFrameOp:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
        yield s

    def test_mapinpandas_shape(self, spark):
        pages = spark.createDataFrame(
            [(f"u{i}",
              f"<table><tr><td>r{i}</td><td>{i}</td></tr>"
              f"<tr><td>s{i}</td><td>{i + 1}</td></tr></table>"
              .encode())
             for i in range(20)],
            "url string, html binary").repartition(4)
        out = html_tables(pages)
        assert out.count() == 40
        r = {(x.url, x.row_idx): x.cells for x in out.collect()}
        assert r[("u3", 1)] == ["r3", "3"]
        assert r[("u3", 2)] == ["s3", "4"]
        assert out.schema["cells"].dataType.simpleString() \
            == "array<string>"
