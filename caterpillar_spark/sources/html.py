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


class _TreeParser(HTMLParser):
    """Build the reference converter's recursive node shape:
    ``{tag, attributes, text, children}`` (``task/converter/html.go:24-87``:
    direct text only, children as element nodes, attributes as a map).
    Deliberate divergence: sibling text segments join with a single space
    (the reference concatenates trimmed segments bare — "y"+"z"="yz",
    which corrupts word boundaries for the text-analysis operators
    downstream)."""

    VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
            "embed", "source", "track", "wbr"}

    def __init__(self):
        super().__init__()
        self.root = {"tag": "", "attributes": {}, "text": "", "children": []}
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = {
            "tag": tag,
            "attributes": {k: (v or "") for k, v in attrs},
            "text": "",
            "children": [],
        }
        self._stack[-1]["children"].append(node)
        if tag not in self.VOID:
            self._stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i]["tag"] == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        d = data.strip()
        if d:
            cur = self._stack[-1]
            cur["text"] = (cur["text"] + " " + d).strip() if cur["text"] else d


def html_dom_tree(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    container: str | None = None,
) -> DataFrame:
    """Reference-shape html conversion: each document becomes one JSON
    string of the recursive ``{tag, attributes, text, children}`` tree
    (``converter: html``). ``container`` selects subtrees by tag name (the
    reference's XPath ``container``, tag-match form) and emits one record
    per match with its ``node_index``."""
    import json

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("node_index", T.IntegerType()),
            T.StructField("tree", T.StringType()),
        ]
    )

    def trees(doc: str) -> list[str]:
        p = _TreeParser()
        p.feed(doc or "")
        if container is None:
            kids = p.root["children"]
            return [json.dumps(kids[0] if len(kids) == 1 else p.root["children"])]
        out = []

        def walk(n):
            if n["tag"] == container:
                out.append(json.dumps(n))
            for c in n["children"]:
                walk(c)

        walk(p.root)
        return out

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, doc in zip(pdf[id_col], pdf[html_col]):
                for i, t in enumerate(trees(doc)):
                    rows.append({"doc_id": did, "node_index": i, "tree": t})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(kernel, schema=schema)


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
