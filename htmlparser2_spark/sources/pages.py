"""Deterministic Common-Crawl-style ``pages`` table synthesis.

Builds the BASELINE.json input_hint table ``(url string, warc_ts
timestamp, html binary, text string, lang string)`` from the driver's
``documents.parquet`` — no external data. Every column is generated with
ANSI SQL expressions shared (via a tiny dialect substitution) between
Spark and DuckDB, so the correctness oracle can reproduce both the input
AND the expected extraction in pure SQL.

Three page variants (``doc_id % 3``) systematically cover the reference's
behavior space (FIXTURES.md §1): raw-text script/style bodies, implied
closes (``li``, table sections), void elements, RCDATA ``textarea``,
comments + bogus comments, and entities — while keeping the expected
DomUtils ``textContent`` an exact SQL string concatenation. The ``text``
column carries that expected extraction, so the per-row invariant is
``extract_text(html) == text`` byte-for-byte.

Hosts are deterministically skewed (40% of docs on host0) to exercise
salting/AQE at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "page_exprs",
    "build_pages",
    "oracle_pages_cte",
    "N_VARIANTS",
]

N_VARIANTS = 3

_IDS = "CAST(doc_id AS STRING)"
_ETEXT = "replace(replace(text, '&', '&amp;'), '<', '&lt;')"

# Per-variant page markup and its expected textContent, as SQL string
# expressions over (doc_id, text, lang, source).
_V0_PAGE = (
    "'<!DOCTYPE html><html lang=\"' || lang || '\"><head><title>Doc ' || {ids} || "
    "'</title><script>var x = 1 < 2;</script><style>p { color: red }</style></head>"
    "<body><h1>Doc ' || {ids} || '</h1><!-- src:' || source || ' --><p class=\"c' || "
    "CAST(doc_id % 7 AS STRING) || '\">' || {etext} || "
    "'</p><a href=\"https://example.com/doc/' || {ids} || '\">more</a></body></html>'"
)
_V0_TEXT = (
    "'Doc ' || {ids} || 'var x = 1 < 2;' || 'p { color: red }' || "
    "'Doc ' || {ids} || text || 'more'"
)

_V1_PAGE = (
    "'<html><body><ul><li>Doc ' || {ids} || '<li>' || {etext} || "
    "'</ul><p>A &amp; B &lt;tag&gt; &#33;<br><img src=\"i' || {ids} || "
    "'.png\"></body></html>'"
)
_V1_TEXT = "'Doc ' || {ids} || text || 'A & B <tag> !'"

_V2_PAGE = (
    "'<html><body><table><tr><td>Doc ' || {ids} || '<tr><td>' || {etext} || "
    "'</table><textarea>T &amp; A</textarea><?bogus ' || {ids} || "
    "'><div>tail</div></body></html>'"
)
_V2_TEXT = "'Doc ' || {ids} || text || 'T & A' || 'tail'"


def _fmt(template: str) -> str:
    # The markup contains literal { } (CSS), so format via replace.
    return template.replace("{ids}", _IDS).replace("{etext}", _ETEXT)


def page_exprs(dialect: str) -> dict[str, str]:
    """SQL expressions for the pages columns in 'spark' or 'duckdb'."""
    page = (
        f"CASE doc_id % 3 WHEN 0 THEN {_fmt(_V0_PAGE)} "
        f"WHEN 1 THEN {_fmt(_V1_PAGE)} ELSE {_fmt(_V2_PAGE)} END"
    )
    expected = (
        f"CASE doc_id % 3 WHEN 0 THEN {_fmt(_V0_TEXT)} "
        f"WHEN 1 THEN {_fmt(_V1_TEXT)} ELSE {_fmt(_V2_TEXT)} END"
    )
    if dialect == "spark":
        ts = "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)"
        html = f"encode({page}, 'utf-8')"
    elif dialect == "duckdb":
        ts = "TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND"
        html = f"encode({page})"
    else:
        raise ValueError(dialect)
    url = (
        "'https://host' || CAST(CASE WHEN doc_id % 5 < 2 THEN 0 "
        "ELSE doc_id % 41 END AS STRING) || '.example/doc/' || "
        f"{_IDS}"
    )
    return {
        "doc_id": "doc_id",
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": expected,
        "lang": "lang",
        "page_str": page,
    }


def build_pages(
    spark: SparkSession, sf_dir: str, *, with_doc_id: bool = False
) -> DataFrame:
    """Pages DataFrame from ``{sf_dir}/documents.parquet``.

    Column pruning note: only (doc_id, text, lang, source) are read from
    parquet; generation is all Catalyst expressions (no UDF), so the scan
    stays fully pushed down and codegen'd.
    """
    e = page_exprs("spark")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = [
        f"{e['url']} AS url",
        f"{e['warc_ts']} AS warc_ts",
        f"{e['html']} AS html",
        f"{e['text']} AS text",
        "lang",
    ]
    if with_doc_id:
        cols.insert(0, "doc_id")
    return docs.selectExpr(*cols)


def oracle_pages_cte() -> str:
    """DuckDB CTE producing the identical pages table (plus doc_id and the
    decoded page string for oracle-side inspection)."""
    e = page_exprs("duckdb")
    return (
        "pages AS (SELECT doc_id, "
        f"{e['url']} AS url, {e['warc_ts']} AS warc_ts, "
        f"{e['page_str']} AS page_str, {e['text']} AS text, lang "
        "FROM documents)"
    )
