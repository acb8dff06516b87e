"""Excel ingestion — the reference's most-used converter after CSV
(``internal/pkg/pipeline/task/converter/xlsx.go:24-124``: sheet selection,
header-row slugging, per-cell string coercion).

Spark has no Excel datasource; the file format itself is a zip of XML that
cannot be split, so the idiomatic mapping is driver-side ``pandas.read_excel``
per file (xlsx files are human-scale — the 100 TB path is parquet/CSV) and a
Spark DataFrame out. Import-gated: the pandas Excel engine (openpyxl/xlrd)
is not in every runtime; absence raises a clean actionable error rather
than an ImportError deep in pandas.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _slug(name: object) -> str:
    """Header slugging, same contract as the csv reader: lowercase,
    non-alnum runs -> single underscore (xlsx.go header normalization)."""
    s = re.sub(r"[^0-9a-zA-Z]+", "_", str(name).strip().lower()).strip("_")
    return s or "col"


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: int | str = 0,
    header: bool = True,
    all_strings: bool = True,
) -> DataFrame:
    """Read one Excel sheet into a DataFrame.

    ``all_strings`` mirrors the reference's converter, which emits every
    cell as a string record field and leaves typing to downstream tasks
    (``xlsx.go:86-104``) — numeric coercion surprises are the top Excel
    ingestion bug, so string-first is the safe contract.
    """
    # probe the RIGHT engine for the format BEFORE the file open (pandas
    # checks the path first, which would mask the missing engine): .xls is
    # the legacy BIFF format and needs xlrd, everything else openpyxl
    engine = "xlrd" if str(path).lower().endswith(".xls") else "openpyxl"
    try:
        __import__(engine)
    except ImportError as e:
        raise RuntimeError(
            f"read_excel needs the pandas Excel engine '{engine}' for "
            f"{path!r} (pip install {engine} on the driver); this runtime "
            "does not ship one"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(
        path, sheet_name=sheet, header=0 if header else None, dtype=object
    )
    if header:
        cols, seen = [], {}
        for c in pdf.columns:
            base = _slug(c)
            n = seen.get(base, 0)
            seen[base] = n + 1
            cols.append(base if n == 0 else f"{base}_{n}")
        pdf.columns = cols
    else:
        pdf.columns = [f"c{i}" for i in range(len(pdf.columns))]
    if all_strings:
        pdf = pdf.astype("string")
        pdf = pdf.where(pdf.notna(), None)
    return spark.createDataFrame(pdf)
