"""PDF / layout-parse plumbing over binary payload columns.

The north rule lists "PDF/layout parse" alongside HTML extraction. No
PDF codec ships in this container, so the decode step is a clearly
marked deterministic stub behind the same mapInPandas contract the HTML
path uses — swap ``_extract_pdf_text_stub`` for pdfminer/pypdf and every
schema, batch shape, and downstream operator stays unchanged.

The layout model is the real contract: a PDF parses into *spans*
``(page_no, span_idx, kind, text, x0, y0, x1, y1)``; document text is
the reading-order concatenation of text spans — the analogue of the
DOM adjacency array for paged media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["SPAN_SCHEMA", "pdf_spans", "pdf_text"]

SPAN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("page_no", IntegerType()),
        StructField("span_idx", IntegerType()),
        StructField("kind", StringType()),  # text | image | rule
        StructField("text", StringType()),
        StructField("x0", DoubleType()),
        StructField("y0", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
    ]
)


def _extract_pdf_text_stub(payload: bytes) -> list[dict]:
    """STUB layout parser: deterministic fake spans from the payload.

    Production implementation: pdfminer.six's LTTextLine iteration (or
    pypdf page.extract_text) emitting one span per line with its bbox.
    Raises ValueError on an invalid header exactly like a real parser.
    """
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    digest = hashlib.sha256(payload).hexdigest()
    n_pages = 1 + payload[-1] % 3
    spans = []
    for page in range(n_pages):
        for idx in range(2):
            spans.append(
                {
                    "page_no": page,
                    "span_idx": idx,
                    "kind": "text",
                    "text": f"p{page}s{idx}:{digest[:8]}",
                    "x0": 72.0,
                    "y0": 700.0 - 14 * idx,
                    "x1": 540.0,
                    "y1": 714.0 - 14 * idx,
                }
            )
    return spans


def pdf_spans(df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Explode PDF payloads into layout spans (mapInPandas, Arrow batches).

    Invalid payloads yield zero spans (observable as missing doc_ids)
    rather than failing the task.
    """

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {f.name: [] for f in SPAN_SCHEMA.fields}
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    spans = _extract_pdf_text_stub(bytes(payload or b""))
                except ValueError:
                    continue
                for span in spans:
                    rows["doc_id"].append(doc_id)
                    for k, v in span.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(worker, SPAN_SCHEMA)


def pdf_text(spans: DataFrame) -> DataFrame:
    """Reading-order text per document: page ascending, then top-down
    (descending y), then span order — pure DataFrame ops."""
    from pyspark.sql import functions as F

    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                "page_no",
                (-F.col("y0")).alias("neg_y"),
                "span_idx",
                "text",
            )
        )
    )
    return (
        spans.filter(F.col("kind") == "text")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n", F.transform(ordered, lambda s: s["text"])
            ).alias("text")
        )
    )
