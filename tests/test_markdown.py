"""HTML -> Markdown rendering (engine/markdown.py) rule-set pins."""

from __future__ import annotations

from htmlparser2_spark.engine.dom import DomArrayHandler
from htmlparser2_spark.engine.parser import Parser, ParserOptions
from htmlparser2_spark.engine.markdown import to_markdown


def md(html: str, **options) -> str:
    handler = DomArrayHandler(with_indices=False)
    parser = Parser(handler, ParserOptions(**options))
    parser.parse(html)
    return to_markdown(handler.nodes)


def test_headings_paragraphs_links():
    html = (
        "<html><head><title>T</title><script>skip()</script>"
        "<style>p{}</style></head><body><h1>Top</h1><h3>Sub</h3>"
        '<p>Hello <strong>bold</strong> and <em>it</em> and '
        '<code>x=1</code>.</p><a href="/u">go</a> now</body></html>'
    )
    assert md(html) == (
        "# Top\n\n### Sub\n\nHello **bold** and *it* and `x=1`.\n\n"
        "[go](/u) now"
    )


def test_whitespace_collapse_and_br():
    html = "<body><p>a\n   b<br>c   d</p></body>"
    assert md(html) == "a b\nc d"


def test_lists_nested_and_ordered():
    html = (
        "<body><ul><li>one<li>two<ul><li>two.a</ul><li>three</ul>"
        "<ol><li>first<li>second</ol></body>"
    )
    assert md(html) == (
        "- one\n- two\n  - two.a\n- three\n\n1. first\n2. second"
    )


def test_table_header_and_pipe_escape():
    html = (
        "<body><table><thead><tr><th>K</th><th>V</th></tr></thead>"
        "<tbody><tr><td>a|b</td><td>1</td></tr></tbody></table></body>"
    )
    assert md(html) == (
        "| K | V |\n| --- | --- |\n| a\\|b | 1 |"
    )


def test_pre_blockquote_hr_textarea():
    html = (
        "<body><pre>x =  1\ny = 2</pre><blockquote><p>quoted</p>"
        "</blockquote><hr><textarea>T &amp; A</textarea></body>"
    )
    assert md(html) == (
        "```\nx =  1\ny = 2\n```\n\n> quoted\n\n---\n\nT & A"
    )


def test_images_and_missing_attrs():
    assert md('<body><img src="i.png" alt="pic"><img src="j.png">'
              "<a>nohref</a></body>") == "![pic](i.png)![](j.png)nohref"


def test_transparent_containers_and_comments():
    html = (
        "<body><div><section><p>inner</p></section></div>"
        "<!-- c --><?pi x><div>tail</div></body>"
    )
    assert md(html) == "inner\n\ntail"


def test_no_body_renders_whole_document():
    assert md("<h2>frag</h2><p>text</p>") == "## frag\n\ntext"


def test_empty_and_garbage():
    assert md("") == ""
    assert md("<body><script>only()</script></body>") == ""


def test_inline_edge_whitespace_reemitted():
    # whitespace just inside a wrapper separates words OUTSIDE the
    # markers; markdown emphasis forbids spaces inside them
    assert md("<body><p>foo<strong> bar </strong>baz</p></body>") == (
        "foo **bar** baz"
    )
    assert md("<body><p>x<em>y</em>z</p></body>") == "x*y*z"
    assert md('<body><p>go<a href="/u"> here </a>now</p></body>') == (
        "go [here](/u) now"
    )
    assert md("<body><p>a<code> c </code>b</p></body>") == "a `c` b"
    # empty wrappers vanish entirely
    assert md("<body><p>a<strong>  </strong>b</p></body>") == "a b"


def test_nul_in_text_is_not_a_break():
    # NUL is valid parsed text; it must not alias the <br> sentinel
    assert md("<body><p>a\x00b</p></body>") == "ab"
    assert md("<body><p>a\x00b<br>c</p></body>") == "ab\nc"
    assert md("<body><textarea>a\x00b</textarea></body>") == "ab"


def test_page_variant_shapes():
    # the exact shapes q_markdown's oracle predicts (sources/pages.py)
    v0 = (
        '<!DOCTYPE html><html lang="en"><head><title>Doc 3</title>'
        "<script>var x = 1 < 2;</script><style>p { color: red }</style>"
        '</head><body><h1>Doc 3</h1><!-- src:web --><p class="c3">tx</p>'
        '<a href="https://example.com/doc/3">more</a></body></html>'
    )
    assert md(v0) == "# Doc 3\n\ntx\n\n[more](https://example.com/doc/3)"
    v1 = (
        "<html><body><ul><li>Doc 1<li>tx</ul>"
        '<p>A &amp; B &lt;tag&gt; &#33;<br><img src="i1.png"></body></html>'
    )
    assert md(v1) == "- Doc 1\n- tx\n\nA & B <tag> !\n![](i1.png)"
    v2 = (
        "<html><body><table><tr><td>Doc 2<tr><td>tx</table>"
        "<textarea>T &amp; A</textarea><?bogus 2><div>tail</div></body></html>"
    )
    assert md(v2) == "| Doc 2 |\n| --- |\n| tx |\n\nT & A\n\ntail"
