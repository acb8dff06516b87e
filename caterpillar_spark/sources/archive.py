"""Archive unpack — the reference's ``archive`` task
(``task/archive/archive.go:86-103``, ``zip.go:21-106``, ``tar.go:21-109``):
one archive file → one record per member, with member name/size metadata.

Spark form: ``binaryFile`` read → Arrow-batched ``mapInPandas`` over the
stdlib ``zipfile``/``tarfile`` — vectorized at the file granularity (each
archive is one row; members explode 1→N, the UDTF shape). The PACK
direction (``archive.go:86-103`` N records → one archive, member names
from context) is :func:`pack_archives`: a grouped N→1 aggregation via
``applyInPandas`` — one archive blob per group, built in memory per
executor.

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


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("archive", T.BinaryType()),
    ]
)


def pack_archives(
    df: DataFrame,
    group_col: str,
    name_col: str,
    payload_col: str,
    fmt: str = "zip",
) -> DataFrame:
    """N records → one archive blob per group (the reference's archive
    pack task: member names come from record context, here the
    ``name_col``). ``fmt``: ``zip`` | ``tar`` | ``tar.gz``.

    Members are written in ``name_col`` order so the blob is
    deterministic for a given group content; zip entries carry a fixed
    epoch timestamp for the same reason (archives built on different days
    must still be byte-comparable)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(name_col, kind="mergesort")
        buf = io.BytesIO()
        if fmt == "zip":
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                for name, payload in zip(pdf[name_col], pdf[payload_col]):
                    info = zipfile.ZipInfo(str(name), date_time=(1980, 1, 1, 0, 0, 0))
                    z.writestr(info, bytes(payload))
        elif fmt in ("tar", "tar.gz"):
            mode = "w:gz" if fmt == "tar.gz" else "w"
            with tarfile.open(fileobj=buf, mode=mode) as t:
                for name, payload in zip(pdf[name_col], pdf[payload_col]):
                    data = bytes(payload)
                    ti = tarfile.TarInfo(str(name))
                    ti.size = len(data)
                    ti.mtime = 0
                    t.addfile(ti, io.BytesIO(data))
        else:
            raise ValueError(f"unsupported archive format: {fmt!r}")
        return pd.DataFrame(
            {
                "group_key": [str(pdf[group_col].iloc[0])],
                "fmt": [fmt],
                "n_members": [len(pdf)],
                "archive": [buf.getvalue()],
            }
        )

    return df.groupBy(group_col).applyInPandas(build, schema=PACKED_SCHEMA)
