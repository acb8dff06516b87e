from __future__ import annotations

import io
import tarfile
import zipfile

from caterpillar_spark.sources.archive import unpack_archives


def test_unpack_zip(spark, tmp_path):
    zp = tmp_path / "planets.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("mercury.txt", "small")
        z.writestr("venus.txt", "hot")
        z.writestr("dir/", "")  # directory entries skipped
    out = unpack_archives(spark, str(zp))
    rows = {r["member_name"]: bytes(r["content"]) for r in out.collect()}
    assert rows == {"mercury.txt": b"small", "venus.txt": b"hot"}


def test_unpack_tar_gz(spark, tmp_path):
    tp = tmp_path / "planets.tar.gz"
    with tarfile.open(tp, "w:gz") as t:
        for name, data in [("earth.txt", b"blue"), ("mars.txt", b"red")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    out = unpack_archives(spark, str(tp))
    rows = {r["member_name"]: bytes(r["content"]) for r in out.collect()}
    assert rows == {"earth.txt": b"blue", "mars.txt": b"red"}
    sizes = {r["member_name"]: r["member_size"] for r in out.collect()}
    assert sizes == {"earth.txt": 4, "mars.txt": 3}
