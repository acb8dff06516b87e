"""HTML table converter — the reference's ``converter: html`` task
(``internal/pkg/pipeline/task/converter/html.go``): each ``<table>`` row
becomes a record, cells keyed by the slugged header row.

Spark-first mapping: parsing is a per-record transform over an opaque
string column, so it runs as an Arrow-batched ``mapInPandas`` kernel on
the STDLIB ``html.parser`` (no lxml/bs4 dependency — the sandbox and many
cluster images ship neither). One input row (an HTML document) explodes
into N output rows (table cells as a map column), the same UDTF shape as
``operators/text.split_explode``.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from caterpillar_spark.sources.xlsx import _slug


class _TableParser(HTMLParser):
    """Collect table rows as lists of cell texts (first table row with
    <th> — or the first row — is the header, like the reference)."""

    def __init__(self):
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.tables.append([])
        elif tag == "tr" and self.tables:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None:
            self._row.append(" ".join("".join(self._cell).split()))
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self.tables:
                self.tables[-1].append(self._row)
            self._row = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def _records(doc: str) -> list[dict[str, str]]:
    p = _TableParser()
    p.feed(doc or "")
    out = []
    for t_idx, rows in enumerate(p.tables):
        if not rows:
            continue
        header = [_slug(h) for h in rows[0]]
        for r_idx, row in enumerate(rows[1:]):
            cells = {
                header[i] if i < len(header) else f"col{i}": v
                for i, v in enumerate(row)
            }
            out.append({"table_idx": t_idx, "row_idx": r_idx, "cells": cells})
    return out


HTML_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("table_idx", T.IntegerType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("cells", T.MapType(T.StringType(), T.StringType())),
    ]
)


def html_table_records(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Explode each document's HTML tables into records:
    ``(doc_id, table_idx, row_idx, cells: map<slugged_header, text>)``."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, doc in zip(pdf[id_col], pdf[html_col]):
                for rec in _records(doc):
                    rows.append({"doc_id": did, **rec})
            yield pd.DataFrame(
                rows, columns=[f.name for f in HTML_RECORD_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, schema=HTML_RECORD_SCHEMA)
