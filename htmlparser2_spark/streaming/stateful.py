"""Custom stateful streaming operators (applyInPandasWithState).

The crawl-pipeline classic: first-seen-wins URL dedup across micro-
batches. State is keyed by url; re-crawled pages in later batches are
dropped. This is the stateful-operator pattern the reference's
incremental `write()` chunks imply at table scale (new snapshots may
re-deliver documents; exactly-once extraction needs cross-batch
memory).

Scale notes: state lives in the state store partitioned by key hash, so
the operator shuffles only (key, fingerprint) — not the html payload —
when ``project_payload`` trims columns first. A per-host variant
(rolling byte budgets) uses the same shape with host as the key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["dedup_first_seen", "dedup_content_first_seen", "host_budget"]

_DEDUP_OUT = StructType(
    [
        StructField("url", StringType()),
        StructField("first_warc_ts", TimestampType()),
        StructField("n_occurrences", LongType()),
    ]
)
_DEDUP_STATE = StructType([StructField("seen", LongType())])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state):
    (url,) = key
    seen = state.get[0] if state.exists else 0
    first_ts = None
    count = 0
    for pdf in pdfs:
        count += len(pdf)
        ts = pdf["warc_ts"].min()
        if first_ts is None or ts < first_ts:
            first_ts = ts
    total = seen + count
    state.update((total,))
    if seen == 0 and count > 0:
        # First time this url is observed: emit one row.
        yield pd.DataFrame(
            {"url": [url], "first_warc_ts": [first_ts], "n_occurrences": [total]}
        )


def dedup_first_seen(pages_stream: DataFrame) -> DataFrame:
    """Streaming first-seen URL dedup: emits each url exactly once (on
    the micro-batch where it first appears), with cross-batch state."""
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


_CONTENT_OUT = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("url", StringType()),
        StructField("first_warc_ts", TimestampType()),
        StructField("n_occurrences", LongType()),
    ]
)
_CONTENT_STATE = StructType([StructField("seen", LongType())])


def _content_dedup_fn(key, pdfs: Iterator[pd.DataFrame], state):
    (fp,) = key
    seen = state.get[0] if state.exists else 0
    count = 0
    first_ts = None
    first_url = None
    for pdf in pdfs:
        count += len(pdf)
        i = pdf["warc_ts"].idxmin()
        ts = pdf["warc_ts"].loc[i]
        if first_ts is None or ts < first_ts:
            first_ts, first_url = ts, pdf["url"].loc[i]
    state.update((seen + count,))
    if seen == 0 and count > 0:
        yield pd.DataFrame(
            {
                "fingerprint": [fp],
                "url": [first_url],
                "first_warc_ts": [first_ts],
                "n_occurrences": [seen + count],
            }
        )


def dedup_content_first_seen(
    pages_stream: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Streaming first-seen CONTENT dedup: keyed by ``md5(text_col)``
    instead of url, so re-crawled urls with unchanged content AND
    cross-host mirrors collapse to one emitted row (the earliest
    ``warc_ts`` observation wins and carries its url). The batch
    analogue is ``operators/dedup.exact_dedup``; this is its
    exactly-once incremental form — the key is a 32-char fingerprint,
    so cross-batch state and the shuffle stay fingerprint-sized no
    matter how large the page payloads are."""
    from pyspark.sql import functions as F

    keyed = pages_stream.select(
        F.md5(F.col(text_col).cast("string")).alias("fingerprint"),
        "url",
        "warc_ts",
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _content_dedup_fn,
        outputStructType=_CONTENT_OUT,
        stateStructType=_CONTENT_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


_BUDGET_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("docs_total", LongType()),
        StructField("bytes_total", LongType()),
        StructField("over_budget", LongType()),
    ]
)
_BUDGET_STATE = StructType(
    [StructField("docs", LongType()), StructField("bytes", LongType())]
)


def _budget_fn_factory(byte_budget: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        (host,) = key
        docs, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            docs += len(pdf)
            total += int(pdf["html_bytes"].sum())
        state.update((docs, total))
        yield pd.DataFrame(
            {
                "host": [host],
                "docs_total": [docs],
                "bytes_total": [total],
                "over_budget": [1 if total > byte_budget else 0],
            }
        )

    return fn


def host_budget(pages_stream: DataFrame, *, byte_budget: int = 1 << 30) -> DataFrame:
    """Per-host rolling ingest budget: running doc/byte totals per host
    with an over-budget flag (crawl politeness / quota enforcement)."""
    from pyspark.sql import functions as F

    with_host = pages_stream.select(
        F.regexp_extract("url", r"https://([^.]+)\.", 1).alias("host"),
        F.length("html").cast("long").alias("html_bytes"),
    )
    return with_host.groupBy("host").applyInPandasWithState(
        _budget_fn_factory(byte_budget),
        outputStructType=_BUDGET_OUT,
        stateStructType=_BUDGET_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
