"""Notebook-to-script conversion (ops/notebooks.py): render grammar,
cell order, malformed-JSON quarantine, counts."""

import json

import pytest
from pyspark.sql import Row

from reader_spark.ops.notebooks import notebook_to_script

pytestmark = pytest.mark.spark


def _nb(cells):
    return json.dumps({"cells": cells})


@pytest.fixture(scope="module")
def notebooks(spark):
    rows = [
        Row(doc_id=1, notebook_json=_nb([
            {"cell_type": "markdown", "source": ["# Title", "prose line"]},
            {"cell_type": "code", "source": ["x = 1", "print(x)"]},
            {"cell_type": "markdown", "source": ["tail note"]},
        ])),
        Row(doc_id=2, notebook_json=_nb([])),
        Row(doc_id=3, notebook_json="not valid json {{"),
        Row(doc_id=4, notebook_json=_nb([
            {"cell_type": "raw", "source": ["raw stuff"]},
            {"cell_type": "code", "source": []},
        ])),
        Row(doc_id=5, notebook_json=json.dumps({"nbformat": 4})),
    ]
    return spark.createDataFrame(rows)


def test_render_and_order(spark, notebooks):
    got = {r["doc_id"]: r for r in notebook_to_script(notebooks).collect()}
    r = got[1]
    assert r["valid"]
    assert r["script"] == (
        "# # Title\n# prose line"
        "\n\n"
        "x = 1\nprint(x)"
        "\n\n"
        "# tail note"
    )
    assert (r["n_cells"], r["n_code_cells"], r["n_markdown_cells"]) == (
        3, 1, 2,
    )
    assert r["n_script_chars"] == len(r["script"])


def test_empty_and_nonstandard_cells(spark, notebooks):
    got = {r["doc_id"]: r for r in notebook_to_script(notebooks).collect()}
    assert got[2]["valid"] and got[2]["script"] == "" and got[2]["n_cells"] == 0
    r4 = got[4]
    # raw cells render as comments; empty code cell renders empty
    assert r4["script"] == "# raw stuff\n\n"
    assert (r4["n_code_cells"], r4["n_markdown_cells"]) == (1, 0)


def test_malformed_quarantine(spark, notebooks):
    got = {r["doc_id"]: r for r in notebook_to_script(notebooks).collect()}
    for bad in (3, 5):
        r = got[bad]
        assert not r["valid"]
        assert r["script"] is None
        assert (r["n_cells"], r["n_code_cells"], r["n_markdown_cells"],
                r["n_script_chars"]) == (0, 0, 0, 0)
