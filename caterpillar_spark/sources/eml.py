"""EML (RFC-5322 email) converter — the reference's ``converter: eml``
task (``internal/pkg/pipeline/task/converter/eml.go``): one email file ->
one record with headers, text body, and attachment metadata.

Stdlib ``email`` module inside an Arrow-batched ``mapInPandas`` kernel —
no external dependency; emails are opaque ``binary`` payloads upstream
(the same posture as ``operators/multimodal``).
"""

from __future__ import annotations

from collections.abc import Iterator
from email import message_from_bytes, policy

from pyspark.sql import DataFrame
from pyspark.sql import types as T

EML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("subject", T.StringType()),
        T.StructField("from_addr", T.StringType()),
        T.StructField("to_addr", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("body_text", T.StringType()),
        T.StructField("n_attachments", T.IntegerType()),
        T.StructField("attachment_names", T.ArrayType(T.StringType())),
    ]
)


def _parse(raw: bytes) -> dict:
    msg = message_from_bytes(raw or b"", policy=policy.default)
    body = msg.get_body(preferencelist=("plain", "html"))
    atts = [
        a.get_filename() or "" for a in msg.iter_attachments()
    ]
    return {
        "subject": msg.get("Subject"),
        "from_addr": msg.get("From"),
        "to_addr": msg.get("To"),
        "date": msg.get("Date"),
        "body_text": body.get_content().strip() if body is not None else None,
        "n_attachments": len(atts),
        "attachment_names": atts,
    }


def parse_eml(df: DataFrame, raw_col: str = "raw", id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, raw: binary)`` -> one parsed record per email."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, raw in zip(pdf[id_col], pdf[raw_col]):
                rows.append({"doc_id": did, **_parse(raw)})
            yield pd.DataFrame(
                rows, columns=[f.name for f in EML_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, schema=EML_SCHEMA)
