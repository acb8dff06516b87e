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


def test_pack_archives_roundtrip(spark, tmp_path):
    """Pack N records -> one archive per group, deterministically; unpack
    recovers the members byte-for-byte (the reference's pack direction)."""
    import io
    import zipfile

    from caterpillar_spark.sources.archive import pack_archives

    rows = [
        ("g1", "b.txt", b"bravo"),
        ("g1", "a.txt", b"alpha"),
        ("g2", "c.txt", b"charlie"),
    ]
    df = spark.createDataFrame(rows, "grp string, name string, payload binary")
    packed = {
        r["group_key"]: r
        for r in pack_archives(df, "grp", "name", "payload", fmt="zip").collect()
    }
    assert packed["g1"]["n_members"] == 2 and packed["g2"]["n_members"] == 1
    with zipfile.ZipFile(io.BytesIO(bytes(packed["g1"]["archive"]))) as z:
        assert z.namelist() == ["a.txt", "b.txt"]  # name-ordered
        assert z.read("a.txt") == b"alpha" and z.read("b.txt") == b"bravo"
    # determinism: same content -> same bytes
    again = {
        r["group_key"]: bytes(r["archive"])
        for r in pack_archives(df, "grp", "name", "payload", fmt="zip").collect()
    }
    assert again["g1"] == bytes(packed["g1"]["archive"])
    # tar.gz form unpacks too
    tar_packed = pack_archives(df, "grp", "name", "payload", fmt="tar.gz").collect()
    import tarfile

    blob = bytes([r for r in tar_packed if r["group_key"] == "g1"][0]["archive"])
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as t:
        assert sorted(m.name for m in t.getmembers()) == ["a.txt", "b.txt"]
