"""GFM pipe-table cell extraction (reader_spark.ops.tables)."""

from pyspark.sql import Row

from reader_spark.ops.tables import table_cells


def _spans(spark, rows):
    """rows: (doc_id, text) or (doc_id, tbl, text)."""
    if len(rows[0]) == 2:
        return spark.createDataFrame(
            [Row(doc_id=d, text=t) for d, t in rows]
        )
    return spark.createDataFrame(
        [Row(doc_id=d, tbl=i, text=t) for d, i, t in rows]
    )


BASIC = "| k | v |\n| --- | --- |\n| 1 | web |\n| 2 | pdf |"


class TestTableCells:
    def test_header_and_data_rows(self, spark):
        got = {
            (r.row_idx, r.col_idx): r.cell
            for r in table_cells(_spans(spark, [(1, BASIC)])).collect()
        }
        assert got == {
            (0, 0): "k",
            (0, 1): "v",
            (1, 0): "1",
            (1, 1): "web",
            (2, 0): "2",
            (2, 1): "pdf",
        }

    def test_separator_row_skipped_only_at_line_1(self, spark):
        # a DATA cell that happens to contain '---' must not be skipped
        t = "| k |\n| --- |\n| --- dashes |"
        rows = table_cells(_spans(spark, [(1, t)])).collect()
        assert {(r.row_idx, r.cell) for r in rows} == {
            (0, "k"),
            (1, "--- dashes"),
        }

    def test_escaped_pipe_unescaped(self, spark):
        t = "| k |\n| --- |\n| a\\|b |"
        rows = table_cells(_spans(spark, [(1, t)])).collect()
        assert rows[-1].cell in ("a|b", "k")
        got = {r.cell for r in rows}
        assert got == {"k", "a|b"}

    def test_padded_empty_cell(self, spark):
        # serializer pads ragged rows: second cell of the data row empty
        t = "| k | v |\n| --- | --- |\n| a |  |"
        got = {
            (r.row_idx, r.col_idx): r.cell
            for r in table_cells(_spans(spark, [(1, t)])).collect()
        }
        assert got[(1, 0)] == "a"
        assert got[(1, 1)] == ""

    def test_multiple_tables_keyed_by_table_col(self, spark):
        t1 = "| a |\n| --- |\n| 1 |"
        t2 = "| b |\n| --- |\n| 2 |"
        out = table_cells(
            _spans(spark, [(1, 0, t1), (1, 1, t2)]), table_col="tbl"
        )
        got = {(r.tbl, r.row_idx, r.cell) for r in out.collect()}
        assert got == {(0, 0, "a"), (0, 1, "1"), (1, 0, "b"), (1, 1, "2")}

    def test_no_shuffle_plan(self, spark):
        df = table_cells(_spans(spark, [(1, BASIC)]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
