"""CSS selector queries over the relational nodes table.

The reference ecosystem pairs htmlparser2's DOM with the css-select
package; here a selector compiles to DataFrame operations instead of
an in-memory tree walk:

* a **compound** (``p``, ``.cls``, ``#id``, ``[attr=v]``, ``*``) is a
  pushdown-friendly filter on the nodes table,
* the **child** combinator (``>``) is a within-document equi-join on
  ``parent_id``,
* the **descendant** combinator (whitespace) is a within-document
  equi-join plus in-row membership in the ``ancestors`` column (so the
  nodes table must be built ``with_ancestors=True``; no recursive
  closure ever runs),
* the **sibling** combinators (``+`` adjacent, ``~`` general) join on
  (document, parent, element-rank): CSS sibling relations skip
  non-element nodes, so raw ``idx_in_parent`` (which counts text and
  comment children) would be wrong — one window pass ranks element
  children per parent, then ``A + B`` is rank(B) = rank(A) + 1 and
  ``A ~ B`` is rank(B) > rank(A).

Supported grammar (the high-traffic subset)::

    selector-list := selector ( ',' selector )*           -- union
    selector      := compound ( ( '>' | ' ' | '+' | '~' ) compound )*
    compound      := [ tag | '*' ] ( '#id' | '.class' | attr-test )*
    attr-test     := '[attr]' | '[attr=v]' | '[attr^=v]' | '[attr$=v]' | '[attr*=v]'

Anything else (pseudo-classes, :nth-*) raises ``ValueError`` loudly
rather than silently matching wrong rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["css_select"]

_ELEMENT_TYPES = ("tag", "script", "style")
_TOKEN = re.compile(r"[>+~]|[^\s>+~]+")
_COMBINATORS = {">": "child", "+": "adjacent", "~": "general"}
_COMPOUND = re.compile(
    r"^(?P<tag>\*|[A-Za-z][A-Za-z0-9-]*)?(?P<rest>(?:[#.][\w-]+|\[[^\]]+\])*)$"
)
_SIMPLE = re.compile(r"[#.][\w-]+|\[[^\]]+\]")
_ATTR_TEST = re.compile(r"^([\w-]+)(?:([\^$*]?=)(.*))?$")


def _compound_pred(compound: str) -> Column:
    m = _COMPOUND.match(compound)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unsupported CSS compound: {compound!r}")
    pred = F.col("type").isin(*_ELEMENT_TYPES)
    tag = m.group("tag")
    if tag and tag != "*":
        pred = pred & (F.col("name") == tag.lower())
    for simple in _SIMPLE.findall(m.group("rest")):
        if simple.startswith("#"):
            pred = pred & (F.col("attrs")["id"] == simple[1:])
        elif simple.startswith("."):
            # class attribute is whitespace-separated tokens
            pred = pred & F.array_contains(
                F.split(F.coalesce(F.col("attrs")["class"], F.lit("")), r"\s+"),
                simple[1:],
            )
        else:
            # ~=, |=, != etc. must NOT silently compile to a garbage
            # attribute-name lookup — reject anything but the
            # supported operators explicitly.
            am = _ATTR_TEST.match(simple[1:-1].strip())
            if not am:
                raise ValueError(f"unsupported attribute test: {simple!r}")
            attr, op, value = am.group(1), am.group(2), am.group(3)
            col = F.col("attrs")[attr]
            if op is None:
                pred = pred & col.isNotNull()
                continue
            value = value.strip("\"'")
            if op == "=":
                pred = pred & (col == value)
            elif op == "^=":
                pred = pred & col.startswith(value)
            elif op == "$=":
                pred = pred & col.endswith(value)
            else:  # *=
                pred = pred & col.contains(value)
    return pred


def css_select(
    nodes: DataFrame, selector: str, *, key_col: str = "url"
) -> DataFrame:
    """Rows of ``nodes`` matching ``selector`` (distinct per element).

    Chain cost: one within-document join per combinator, each keyed on
    ``key_col`` — candidate sets shrink left-to-right, and nothing is
    quadratic in document count or corpus size. A selector list
    (comma) unions its branches and de-duplicates per element.
    """
    if "," in selector:
        parts = [p.strip() for p in selector.split(",")]
        if not all(parts):
            raise ValueError(f"unsupported CSS selector: {selector!r}")
        out = css_select(nodes, parts[0], key_col=key_col)
        for part in parts[1:]:
            out = out.unionByName(css_select(nodes, part, key_col=key_col))
        return out.drop_duplicates([key_col, "node_id"])
    tokens = _TOKEN.findall(selector)
    if not tokens or tokens[0] in _COMBINATORS or tokens[-1] in _COMBINATORS:
        raise ValueError(f"unsupported CSS selector: {selector!r}")
    ctx: DataFrame | None = None
    ranked: DataFrame | None = None
    combinator = None
    expect_compound = True
    for tok in tokens:
        if tok in _COMBINATORS:
            if expect_compound:
                raise ValueError(f"unsupported CSS selector: {selector!r}")
            combinator = _COMBINATORS[tok]
            expect_compound = True
            continue
        if ctx is None:
            ctx = nodes.filter(_compound_pred(tok))
        elif combinator in ("adjacent", "general"):
            if ranked is None:
                w = Window.partitionBy(key_col, "parent_id").orderBy(
                    "idx_in_parent"
                )
                ranked = nodes.filter(
                    F.col("type").isin(*_ELEMENT_TYPES)
                ).withColumn("__erank", F.row_number().over(w))
            anchor_info = ranked.join(
                ctx.select(key_col, "node_id").distinct(),
                [key_col, "node_id"],
            ).select(
                F.col(key_col).alias("__akey"),
                F.col("parent_id").alias("__aparent"),
                F.col("__erank").alias("__arank"),
            )
            m = ranked.filter(_compound_pred(tok))
            rank_cond = (
                F.col("__erank") == F.col("__arank") + 1
                if combinator == "adjacent"
                else F.col("__erank") > F.col("__arank")
            )
            joined = m.join(
                anchor_info,
                (F.col(key_col) == F.col("__akey"))
                & (F.col("parent_id") == F.col("__aparent"))
                & rank_cond,
            )
            ctx = joined.drop(
                "__akey", "__aparent", "__arank", "__erank"
            ).drop_duplicates([key_col, "node_id"])
        else:
            matches = nodes.filter(_compound_pred(tok))
            anchors = ctx.select(
                key_col, F.col("node_id").alias("__anchor")
            ).distinct()
            joined = matches.join(anchors, key_col)
            if combinator == "child":
                joined = joined.filter(
                    F.col("parent_id") == F.col("__anchor")
                )
            else:
                if "ancestors" not in matches.columns:
                    raise ValueError(
                        "descendant combinator needs a nodes table built "
                        "with dom_nodes_udf(with_ancestors=True)"
                    )
                joined = joined.filter(
                    F.array_contains("ancestors", F.col("__anchor"))
                )
            ctx = joined.drop("__anchor").drop_duplicates(
                [key_col, "node_id"]
            )
        combinator = "descendant"
        expect_compound = False
    return ctx
