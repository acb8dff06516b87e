"""Archive unpack — the reference's ``archive`` task
(``task/archive/archive.go:86-103``, ``zip.go:21-106``, ``tar.go:21-109``):
one archive file → one record per member, with member name/size metadata.

Spark form: ``binaryFile`` read → Arrow-batched ``mapInPandas`` over the
stdlib ``zipfile``/``tarfile`` — vectorized at the file granularity (each
archive is one row; members explode 1→N, the UDTF shape). Pack (N→1) is
out of core scope like the reference's upload-side extras (SURVEY.md §7.6).

Scale note: archives are driver-opaque blobs; partition count = file count,
so a directory of many small archives parallelizes naturally. A single
giant archive is inherently serial — same as the reference.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive_path", T.StringType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("member_size", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _iter_zip(path: str, blob: bytes):
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        for info in z.infolist():
            if info.is_dir():
                continue
            yield path, info.filename, info.file_size, z.read(info)


def _iter_tar(path: str, blob: bytes):
    # tarfile sniffs gzip/bz2/xz from the stream ("r:*")
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as t:
        for m in t.getmembers():
            if not m.isfile():
                continue
            f = t.extractfile(m)
            yield path, m.name, m.size, f.read() if f else b""


def unpack_archives(
    spark: SparkSession, path_glob: str, fmt: str = "auto"
) -> DataFrame:
    """Read archives by glob and explode members into rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                kind = fmt
                if kind == "auto":
                    kind = "zip" if p.endswith(".zip") else "tar"
                it = _iter_zip(p, bytes(blob)) if kind == "zip" else _iter_tar(
                    p, bytes(blob)
                )
                rows.extend(it)
            yield pd.DataFrame(
                rows,
                columns=["archive_path", "member_name", "member_size", "content"],
            )

    blobs = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return blobs.mapInPandas(kernel, schema=MEMBER_SCHEMA)
