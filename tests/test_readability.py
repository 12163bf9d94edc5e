"""Main-content DOM-heuristic extraction (engine-defined contract)."""

from __future__ import annotations

from htmlparser2_spark.engine.readability import main_content

PAGE = """<html><head><title>Site</title><script>nav()</script></head><body>
<div id="nav"><ul>
<li><a href="/">Home</a><li><a href="/about">About</a><li><a href="/contact">Contact</a>
<li><a href="/blog">Blog</a><li><a href="/shop">Shop</a></ul></div>
<div id="content"><article>
<p>The quick brown fox jumps over the lazy dog in this long main body of
prose which clearly dominates the page by raw character count and has
almost no links at all, just one <a href="/ref">reference</a> to cite.</p>
<p>A second paragraph continues the article with further substantial
content so the density heuristic has plenty of signal to work with.</p>
</article></div>
<div id="footer"><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a> |
<a href="/imprint">Imprint</a></div>
</body></html>"""


def test_selects_article_over_nav_and_footer():
    text = main_content(PAGE)
    assert "quick brown fox" in text
    assert "second paragraph" in text
    assert "Home" not in text  # nav boilerplate excluded
    assert "Privacy" not in text  # footer boilerplate excluded
    assert "nav()" not in text  # script never included


def test_link_dominated_page_still_returns_something():
    page = '<body><div><a href="x">one link</a> tiny</div></body>'
    assert "tiny" in main_content(page)


def test_empty_and_textless():
    assert main_content("") == ""
    assert main_content("<div><img src=x></div>") == ""


def test_whitespace_normalized():
    page = "<body><div><p>a\n   b\t c</p></div></body>"
    assert main_content(page) == "a b c"


def test_pages_v0_winner_flips_on_doc_id_digits():
    """The q_main_content oracle's v0 branch: <body> out-scores the <p>
    only when the doc-id string exceeds 3 digits (score difference is
    Dlen - 3; ties break toward the deeper node). Pinned here because
    the sf0.01 gate corpus (doc_id <= 499) only exercises the <p> arm."""

    def v0(i: int, t: str) -> str:
        return (
            f'<!DOCTYPE html><html lang="en"><head><title>Doc {i}</title>'
            "<script>var x = 1 < 2;</script><style>p { color: red }</style>"
            f"</head><body><h1>Doc {i}</h1><!-- src:web -->"
            f'<p class="c{i % 7}">{t}</p>'
            f'<a href="https://example.com/doc/{i}">more</a></body></html>'
        )

    text = "some sentence with several words in it"
    for i in (0, 9, 99, 999):
        assert main_content(v0(i, text)) == text
    for i in (1000, 4999, 123456):
        assert main_content(v0(i, text)) == f"Doc {i} {text} more"
