"""Relational <table> extraction (operators/tables.py): section
wrappers, th/td, implied closes, br-in-cell text, nested tables,
document-order numbering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htmlparser2_spark.operators.domquery import explode_nodes
from htmlparser2_spark.operators.tables import table_cells

HTML = (
    "<table><thead><tr><th>H1</th><th>H2</th></tr></thead><tbody>"
    "<tr><td>a<br>b</td><td><table><tr><td>inner</td></tr></table>"
    "tail</td></tr></tbody></table><table><tr><td>solo"
)


def _cells(spark, html):
    pages = spark.createDataFrame(
        [("u1", bytearray(html.encode()))], "url string, html binary"
    )
    nodes = explode_nodes(pages, with_ancestors=True)
    return {
        (r.table_idx, r.row_idx, r.col_idx): (r.cell_tag, r.cell_text)
        for r in table_cells(nodes).collect()
    }


@pytest.mark.spark
def test_table_cells_structure(spark):
    got = _cells(spark, HTML)
    assert got == {
        # outer table (document-order idx 0): thead row then tbody row
        (0, 0, 0): ("th", "H1"),
        (0, 0, 1): ("th", "H2"),
        (0, 1, 0): ("td", "a\nb"),  # <br> renders as newline
        # nested table's text contributes to the enclosing cell
        (0, 1, 1): ("td", "innertail"),
        # nested table numbers before the later top-level one
        (1, 0, 0): ("td", "inner"),
        # implied closes: unterminated <table><tr><td>solo
        (2, 0, 0): ("td", "solo"),
    }


@pytest.mark.spark
def test_table_cells_empty_and_absent(spark):
    # empty cell -> '' (left join + coalesce); tableless doc -> no rows
    got = _cells(spark, "<table><tr><td></td><td>x</td></tr></table>")
    assert got == {(0, 0, 0): ("td", ""), (0, 0, 1): ("td", "x")}
    assert _cells(spark, "<p>no tables</p>") == {}


def test_table_cells_requires_ancestors(spark_noop=None):
    import pandas as pd  # noqa: F401  (keep import-light: no session needed)

    class _Fake:
        columns = ["url", "node_id"]

    with pytest.raises(ValueError, match="with_ancestors"):
        table_cells(_Fake())
