"""DomUtils manipulation helpers over the relational nodes table
(operators/dommanip.py): mutate -> serialize -> reparse roundtrips.

Reference surface: appendChild / prependChild / append / prepend /
replaceElement (/root/reference/README.md:166-218, src/index.ts:86).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htmlparser2_spark.operators.dommanip import (
    append,
    append_child,
    prepend,
    prepend_child,
    replace_element,
    serialize_nodes,
)
from htmlparser2_spark.operators.domquery import explode_nodes

HTML = (
    '<html><body><h1>T</h1><p>one</p><style>x { }</style>'
    '<a href="u">link</a></body></html>'
)

EXPECTED = (
    '<html><body>HDR|<h1>T</h1><hr><p>one</p><nostyle></nostyle>'
    '[PRE]<a href="u">link</a><footer role="end"></footer></body></html>'
)


def _pages(spark, html=HTML, url="u1"):
    return spark.createDataFrame(
        [(url, bytearray(html.encode()))], "url string, html binary"
    )


def _mutate(nodes):
    nodes = replace_element(
        nodes, lambda n: F.col("name") == "style",
        {"type": "tag", "name": "nostyle"},
    )
    nodes = prepend_child(
        nodes, lambda n: F.col("name") == "body",
        {"type": "text", "data": "HDR|"},
    )
    nodes = append_child(
        nodes, lambda n: F.col("name") == "body",
        {"type": "tag", "name": "footer", "attrs": {"role": "end"}},
    )
    nodes = append(
        nodes, lambda n: F.col("name") == "h1", {"type": "tag", "name": "hr"}
    )
    nodes = prepend(
        nodes, lambda n: F.col("name") == "a",
        {"type": "text", "data": "[PRE]"},
    )
    return nodes


@pytest.mark.spark
def test_manip_serialize_roundtrip(spark):
    nodes = _mutate(explode_nodes(_pages(spark)))
    out = serialize_nodes(nodes).collect()
    assert len(out) == 1
    assert out[0]["manip_html"] == EXPECTED


@pytest.mark.spark
def test_manip_reparse_fixed_point(spark):
    """Serialized mutated markup reparses to a DOM that serializes
    identically (the serializer contract is a fixed point)."""
    nodes = _mutate(explode_nodes(_pages(spark)))
    rendered = serialize_nodes(nodes).collect()[0]["manip_html"]
    pages2 = _pages(spark, html=rendered)
    again = serialize_nodes(explode_nodes(pages2)).collect()[0]["manip_html"]
    assert again == rendered == EXPECTED


@pytest.mark.spark
def test_insert_orders_and_ancestors(spark):
    """prepend_child shifts existing children right; inserted rows carry
    correct ancestors when the axis column is present."""
    nodes = explode_nodes(_pages(spark), with_ancestors=True)
    body_id = (
        nodes.filter(F.col("name") == "body").collect()[0]["node_id"]
    )
    nodes = prepend_child(
        nodes, lambda n: F.col("name") == "body",
        {"type": "text", "data": "X"},
    )
    rows = {r["node_id"]: r for r in nodes.collect()}
    inserted = [
        r for r in rows.values() if r["type"] == "text" and r["data"] == "X"
    ]
    assert len(inserted) == 1
    ins = inserted[0]
    assert ins["parent_id"] == body_id
    assert ins["idx_in_parent"] == 0
    assert list(ins["ancestors"])[-1] == body_id
    h1 = next(r for r in rows.values() if r["name"] == "h1")
    assert h1["idx_in_parent"] == 1  # shifted right


@pytest.mark.spark
def test_replace_drops_subtree(spark):
    html = "<html><body><div><p>inner<b>deep</b></p></div><p>keep</p></body></html>"
    nodes = explode_nodes(_pages(spark, html=html))
    out = replace_element(
        nodes, lambda n: F.col("name") == "div",
        {"type": "tag", "name": "section"},
    )
    rendered = serialize_nodes(out).collect()[0]["manip_html"]
    assert rendered == (
        "<html><body><section></section><p>keep</p></body></html>"
    )
