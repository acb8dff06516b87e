"""Converter/function parity additions: xpath (Hive JVM UDF), html table
records (stdlib parser kernel), eml parsing, translate, RSA signing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_xpath_scalar_and_array(spark):
    from caterpillar_spark.operators.text import xpath_extract

    df = spark.createDataFrame(
        [(1, "<r><a>x</a><a>y</a><b>7</b></r>"), (2, "<r><b>8</b></r>")],
        ["id", "xml"],
    )
    scalar = xpath_extract(df, "xml", {"b": "/r/b"})
    assert {(r["id"], r["b"]) for r in scalar.collect()} == {(1, "7"), (2, "8")}
    arr = xpath_extract(df, "xml", {"a": "/r/a/text()"}, as_array=True)
    got = {r["id"]: list(r["a"]) for r in arr.collect()}
    assert got == {1: ["x", "y"], 2: []}
    # one-record-per-match shape (the reference's emit semantics)
    exploded = arr.select("id", F.explode("a").alias("v"))
    assert {(r["id"], r["v"]) for r in exploded.collect()} == {(1, "x"), (1, "y")}


def test_html_table_records(spark):
    from caterpillar_spark.sources.html import html_table_records

    doc = """
    <html><body>
      <p>noise</p>
      <table>
        <tr><th>Order ID</th><th>Unit Price!</th></tr>
        <tr><td>1</td><td> 9.50 </td></tr>
        <tr><td>2</td><td>3</td></tr>
      </table>
      <table><tr><td>headerless</td></tr></table>
    </body></html>
    """
    df = spark.createDataFrame([(7, doc)], ["doc_id", "html"])
    rows = sorted(
        (r["table_idx"], r["row_idx"], dict(r["cells"]))
        for r in html_table_records(df).collect()
    )
    assert rows == [
        (0, 0, {"order_id": "1", "unit_price": "9.50"}),
        (0, 1, {"order_id": "2", "unit_price": "3"}),
    ]


def test_html_dom_tree_reference_shape(spark):
    """converter:html parity: recursive {tag, attributes, text, children}
    nodes, container selection with node_index."""
    import json

    from caterpillar_spark.sources.html import html_dom_tree

    doc = '<div id="a">hi<span>x</span></div><div id="b">y<br>z</div>'
    df = spark.createDataFrame([(1, doc)], ["doc_id", "html"])
    rows = html_dom_tree(df, container="div").collect()
    assert [r["node_index"] for r in rows] == [0, 1]
    t0 = json.loads(rows[0]["tree"])
    assert t0["tag"] == "div" and t0["attributes"] == {"id": "a"}
    assert t0["text"] == "hi"
    assert [c["tag"] for c in t0["children"]] == ["span"]
    t1 = json.loads(rows[1]["tree"])
    assert t1["text"] == "y z"  # void tag <br> must not swallow siblings
    assert [c["tag"] for c in t1["children"]] == ["br"]


def test_eml_parse(spark):
    from caterpillar_spark.sources.eml import parse_eml

    raw = (
        b"Subject: hello\r\nFrom: a@x.com\r\nTo: b@y.com\r\n"
        b"Date: Mon, 1 Jan 2024 00:00:00 +0000\r\n"
        b"MIME-Version: 1.0\r\nContent-Type: multipart/mixed; boundary=B\r\n"
        b"\r\n--B\r\nContent-Type: text/plain\r\n\r\nthe body\r\n"
        b"--B\r\nContent-Type: application/octet-stream\r\n"
        b'Content-Disposition: attachment; filename="f.bin"\r\n\r\nxx\r\n--B--\r\n'
    )
    df = spark.createDataFrame([(1, raw)], ["doc_id", "raw"])
    r = parse_eml(df).collect()[0]
    assert r["subject"] == "hello"
    assert r["from_addr"] == "a@x.com"
    assert r["body_text"] == "the body"
    assert r["n_attachments"] == 1
    assert list(r["attachment_names"]) == ["f.bin"]


def test_translate(spark):
    from caterpillar_spark.functions import translate

    df = spark.createDataFrame([("hello aeiou",)], ["s"])
    assert (
        df.select(translate("s", "aeiou", "AEIOU").alias("t")).collect()[0]["t"]
        == "hEllO AEIOU"
    )


def test_translate_text_injectable_client(spark):
    """AWS-Translate-shaped enrichment: stub default, injectable client,
    None pass-through (parity with jq translate, translate.go)."""
    from caterpillar_spark.functions import translate_text

    df = spark.createDataFrame([("hola",), (None,)], ["s"])
    got = {
        r["s"]: r["t"]
        for r in df.select(
            "s", translate_text("s", "es", "en").alias("t")
        ).collect()
    }
    assert got == {"hola": "[en] hola", None: None}

    class Upper:
        def translate(self, text, source_lang, target_lang):
            return f"{source_lang}->{target_lang}:{text.upper()}"

    got2 = df.select(
        "s", translate_text("s", "es", "en", client_factory=Upper).alias("t")
    ).collect()
    assert {r["t"] for r in got2} == {"es->en:HOLA", None}


def test_translate_text_distinct_factories_same_qualname(spark):
    """ADVICE r3: the per-worker client cache is keyed by a content
    fingerprint of the pickled factory, not just its qualname — two
    same-named closures over different configs (endpoints, credentials,
    tags) must each get their OWN client, even in a reused worker."""
    from caterpillar_spark.functions import translate_text

    def make_factory(tag):
        class Client:
            def translate(self, text, source_lang, target_lang):
                return f"{tag}:{text}"

        return Client

    fa, fb = make_factory("A"), make_factory("B")
    assert fa.__qualname__ == fb.__qualname__  # the collision ADVICE describes
    df = spark.createDataFrame([("x",)], ["s"])
    ta = df.select(
        translate_text("s", "es", "en", client_factory=fa).alias("t")
    ).collect()[0]["t"]
    tb = df.select(
        translate_text("s", "es", "en", client_factory=fb).alias("t")
    ).collect()[0]["t"]
    assert (ta, tb) == ("A:x", "B:x")


def test_rsa_signing_verifies(spark):
    """Signatures must verify against the public key and be deterministic
    (PKCS#1 v1.5, like Go's SignPKCS1v15 in the reference's crypto fns)."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    from caterpillar_spark.functions import rsa_sha256, rsa_sha512

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    df = spark.createDataFrame([("msg-a",), ("msg-b",), (None,)], ["m"])
    out = {
        r["m"]: r["sig"]
        for r in df.select(
            "m",
            rsa_sha256(F.lit(pem), F.col("m")).alias("sig"),
            rsa_sha512(F.lit(pem), F.col("m")).alias("sig512"),
        ).collect()
    }
    assert out[None] is None
    pub = key.public_key()
    for m in ("msg-a", "msg-b"):
        pub.verify(  # raises InvalidSignature on mismatch
            bytes.fromhex(out[m]),
            m.encode(),
            padding.PKCS1v15(),
            hashes.SHA256(),
        )
    # deterministic: re-signing yields identical hex
    again = {
        r["m"]: r["sig"]
        for r in df.select(
            "m", rsa_sha256(F.lit(pem), F.col("m")).alias("sig")
        ).collect()
    }
    assert again == out


def test_translate_text_client_built_once_per_worker(spark):
    """ADVICE r2: the client must be constructed once per python worker
    process, not once per Arrow batch — multiple partitions and repeated
    actions through the same factory may not re-run it in a reused
    worker."""
    import os

    from pyspark.sql import functions as F

    from caterpillar_spark.functions import translate_text

    path = "/tmp/caterpillar_translate_count.txt"
    if os.path.exists(path):
        os.unlink(path)

    class _CountingClient:
        """Appends its construction (worker pid) to a shared file so the
        test can observe how many times the factory ran. Defined inside
        the test so cloudpickle ships it by value (local[*] workers can't
        import the test module)."""

        def __init__(self):
            import os as _os

            with open("/tmp/caterpillar_translate_count.txt", "a") as f:
                f.write(f"{_os.getpid()}\n")

        def translate(self, text, source_lang, target_lang):
            return text.upper()
    df = (
        spark.range(2000)
        .repartition(8)
        .select(F.concat(F.lit("t"), F.col("id")).alias("s"))
    )
    col = translate_text("s", "es", "en", client_factory=_CountingClient)
    out = df.select(col.alias("t"))
    # count() would prune the UDF column; aggregate over it instead
    out.agg(F.max("t")).collect()
    out.agg(F.max("t")).collect()  # reused workers must NOT rebuild
    pids = open(path).read().split()
    assert len(pids) == len(set(pids)), (
        f"client constructed {len(pids)} times across "
        f"{len(set(pids))} worker processes"
    )
