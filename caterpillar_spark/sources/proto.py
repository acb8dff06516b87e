"""Protobuf decode — the reference's ``converter: protobuf``
(``task/converter/protobuf.go:39-131``: dynamic message via descriptor set
→ JSON). Spark form: ``from_protobuf`` (Spark 3.4+) with a descriptor-set
file — JVM-side, columnar, no Python.

Gated: the sandbox ships the PySpark wrapper but not necessarily the
``spark-protobuf`` runtime jar; ``decode_protobuf`` raises a clear error if
the jar is absent (add ``--packages org.apache.spark:spark-protobuf_2.13``
on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_protobuf(
    data_col: Column | str, message_name: str, desc_file_path: str
) -> Column:
    from pyspark.sql.protobuf.functions import from_protobuf

    col = F.col(data_col) if isinstance(data_col, str) else data_col
    try:
        return from_protobuf(col, message_name, descFilePath=desc_file_path)
    except Exception as e:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "spark-protobuf runtime jar not on the classpath; launch with "
            "--packages org.apache.spark:spark-protobuf_2.13:<spark-version>"
        ) from e
