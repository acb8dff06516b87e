"""Connector surface: HTTP pagination (next-page-context loop), Excel
reader (import-gated), and the SQS-semantics queue double driving the
exactly-once sink under competing consumers and redelivery."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from caterpillar_spark.sources.http import paginate
from caterpillar_spark.sources.queue import InMemoryQueue

# ---------------------------------------------------------------- http
PAGES = {
    None: {"items": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], "next": "p2"},
    "p2": {"items": [{"id": 3, "v": "c"}], "next": "p3"},
    "p3": {"items": [{"id": 4, "v": "d"}], "next": None},
}


def test_paginate_follows_next_context(spark):
    df = paginate(
        spark,
        fetch_fn=lambda ctx: PAGES[ctx],
        records_fn=lambda r: r["items"],
        next_context_fn=lambda r: r["next"],
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
        ),
    )
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_paginate_detects_cycle(spark):
    with pytest.raises(RuntimeError, match="did not terminate"):
        paginate(
            spark,
            fetch_fn=lambda ctx: {"items": [], "next": "loop"},
            records_fn=lambda r: r["items"],
            next_context_fn=lambda r: r["next"],
            max_pages=10,
        )


# -------------------------------------------------------- retry/backoff
# with_retries mirrors task/http/retry.go: 429 honors Retry-After,
# transport errors sleep retry_delay, exhaustion re-raises. Injected
# sleep records every backoff without actually sleeping.


class _Flaky:
    """fetch_fn double: raises / returns scripted responses in order."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, ctx=None):
        self.calls += 1
        step = self.script.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def test_retry_recovers_from_transient_failure():
    from caterpillar_spark.sources.http import with_retries

    slept = []
    fn = _Flaky([ConnectionError("boom"), ConnectionError("boom"), {"ok": 1}])
    wrapped = with_retries(fn, max_retries=3, retry_delay=1.5, sleep_fn=slept.append)
    assert wrapped() == {"ok": 1}
    assert fn.calls == 3
    assert slept == [1.5, 1.5]  # flat retry_delay for transport errors


def test_retry_429_honors_retry_after_header():
    from caterpillar_spark.sources.http import with_retries

    slept = []
    resp_429 = {"status": 429, "headers": {"Retry-After": "7"}, "body": None}
    resp_ok = {"status": 200, "headers": {}, "body": "done"}
    fn = _Flaky([resp_429, resp_ok])
    wrapped = with_retries(
        fn,
        max_retries=3,
        status_fn=lambda r: r["status"],
        headers_fn=lambda r: r["headers"],
        sleep_fn=slept.append,
    )
    assert wrapped()["body"] == "done"
    assert slept == [7.0]  # header value, not exponential


def test_retry_429_without_header_backs_off_exponentially():
    from caterpillar_spark.sources.http import with_retries

    slept = []
    r429 = {"status": 429, "headers": {}}
    ok = {"status": 200, "headers": {}}
    fn = _Flaky([r429, r429, ok])
    wrapped = with_retries(
        fn,
        max_retries=3,
        status_fn=lambda r: r["status"],
        headers_fn=lambda r: r["headers"],
        sleep_fn=slept.append,
    )
    wrapped()
    assert slept == [2.0, 4.0]  # 2**attempt, attempt = 1, 2


def test_retry_429_unparseable_header_retries_immediately():
    from caterpillar_spark.sources.http import with_retries

    slept = []
    r429 = {"status": 429, "headers": {"Retry-After": "Wed, 21 Oct"}}
    ok = {"status": 200, "headers": {}}
    fn = _Flaky([r429, ok])
    wrapped = with_retries(
        fn,
        max_retries=3,
        status_fn=lambda r: r["status"],
        headers_fn=lambda r: r["headers"],
        sleep_fn=slept.append,
    )
    wrapped()
    assert slept == []  # ref parity: present-but-unparseable -> no sleep


def test_retry_exhaustion_raises_last_error():
    from caterpillar_spark.sources.http import with_retries

    slept = []
    fn = _Flaky([OSError("a"), OSError("b"), OSError("c")])
    wrapped = with_retries(fn, max_retries=3, sleep_fn=slept.append)
    with pytest.raises(OSError, match="c"):
        wrapped()
    assert fn.calls == 3
    assert len(slept) == 2  # no backoff after the final attempt

    bad = {"status": 500, "headers": {}}
    fn2 = _Flaky([bad, bad, bad])
    slept.clear()
    wrapped2 = with_retries(
        fn2, max_retries=3, status_fn=lambda r: r["status"], sleep_fn=slept.append
    )
    with pytest.raises(RuntimeError, match="unexpected http response code"):
        wrapped2()
    assert fn2.calls == 3


def test_retry_rejects_nonpositive_max_retries():
    """ADVICE r4: max_retries=0 used to fall through to `raise None`."""
    from caterpillar_spark.sources.http import with_retries

    for bad in (0, -1):
        with pytest.raises(ValueError, match="max_retries"):
            with_retries(lambda: None, max_retries=bad)


# ---------------------------------------------------------------- oauth
# oauth.py mirrors task/http/oauth{,1,2}.go: Bearer attach + refresh,
# JWT-bearer token grant, OAuth1 HMAC-SHA256 request signing.


class _AuthedFetch:
    """fetch_fn double recording the authorization kwarg per call and
    returning scripted statuses."""

    def __init__(self, statuses):
        self.statuses = list(statuses)
        self.auths = []

    def __call__(self, ctx=None, authorization=None):
        self.auths.append(authorization)
        return {"status": self.statuses.pop(0), "ctx": ctx}


def test_oauth_fetch_attaches_and_caches_bearer_token():
    from caterpillar_spark.sources.oauth import oauth_fetch

    tokens = iter(["tok-1", "tok-2"])
    calls = []

    def token_fn():
        t = next(tokens)
        calls.append(t)
        return t

    fetch = _AuthedFetch([200, 200, 200])
    wrapped = oauth_fetch(fetch, token_fn, status_fn=lambda r: r["status"])
    for _ in range(3):
        assert wrapped("u")["status"] == 200
    # one token fetch serves all three requests
    assert calls == ["tok-1"]
    assert fetch.auths == ["Bearer tok-1"] * 3


def test_oauth_fetch_refreshes_on_expiry():
    from caterpillar_spark.sources.oauth import oauth_fetch

    clock = {"t": 100.0}
    issued = []

    def token_fn():
        issued.append(clock["t"])
        return (f"tok@{clock['t']}", clock["t"] + 60)  # 60s lifetime

    fetch = _AuthedFetch([200] * 4)
    wrapped = oauth_fetch(
        fetch, token_fn, status_fn=lambda r: r["status"], now_fn=lambda: clock["t"]
    )
    wrapped()
    clock["t"] = 130.0  # still valid
    wrapped()
    clock["t"] = 161.0  # past expires_at=160
    wrapped()
    wrapped()
    assert issued == [100.0, 161.0]
    assert fetch.auths == [
        "Bearer tok@100.0",
        "Bearer tok@100.0",
        "Bearer tok@161.0",
        "Bearer tok@161.0",
    ]


def test_oauth_fetch_refreshes_once_on_401():
    from caterpillar_spark.sources.oauth import oauth_fetch

    tokens = iter(["stale", "fresh", "never"])
    fetch = _AuthedFetch([401, 200])
    wrapped = oauth_fetch(fetch, lambda: next(tokens), status_fn=lambda r: r["status"])
    assert wrapped()["status"] == 200
    assert fetch.auths == ["Bearer stale", "Bearer fresh"]

    # a second consecutive 401 is returned, not looped
    fetch2 = _AuthedFetch([401, 401])
    tokens2 = iter(["a", "b", "c"])
    wrapped2 = oauth_fetch(fetch2, lambda: next(tokens2), status_fn=lambda r: r["status"])
    assert wrapped2()["status"] == 401
    assert fetch2.auths == ["Bearer a", "Bearer b"]


def test_oauth_fetch_composes_with_retries():
    """with_retries OUTSIDE oauth_fetch: a transient 500 retries through
    the auth path; a 401 mid-retry refreshes the token."""
    from caterpillar_spark.sources.http import with_retries
    from caterpillar_spark.sources.oauth import oauth_fetch

    tokens = iter(["t1", "t2"])
    fetch = _AuthedFetch([500, 401, 200])
    authed = oauth_fetch(fetch, lambda: next(tokens), status_fn=lambda r: r["status"])
    slept = []
    wrapped = with_retries(
        authed,
        max_retries=3,
        status_fn=lambda r: r["status"],
        expected_statuses=(200,),
        sleep_fn=slept.append,
    )
    assert wrapped()["status"] == 200
    # call 1: 500 (unexpected -> backoff); call 2: 401 -> in-wrapper
    # refresh -> call 3: 200
    assert fetch.auths == ["Bearer t1", "Bearer t1", "Bearer t2"]
    assert len(slept) == 1


@pytest.fixture(scope="module")
def rsa_keypair():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    return pem, key.public_key()


def test_jwt_bearer_token_flow(rsa_keypair):
    """oauth2.go parity: RS256 assertion with iss/sub/aud/iat/exp/scope
    claims, form-POSTed to the injectable token endpoint; access_token +
    expires_in drive the cache."""
    import base64 as b64
    import json as js

    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    from caterpillar_spark.sources.oauth import jwt_bearer_token_fn

    pem, pub = rsa_keypair
    posts = []

    def post_fn(url, data, headers):
        posts.append((url, data, headers))
        return {"access_token": "granted", "expires_in": 120}

    token_fn = jwt_bearer_token_fn(
        post_fn,
        "https://auth.example/token",
        pem,
        issuer="iss-x",
        subject="sub-y",
        audience="aud-z",
        scope=["read", "write"],
        now_fn=lambda: 1_000_000.0,
    )
    tok, expires_at = token_fn()
    assert tok == "granted"
    assert expires_at == 1_000_000.0 + 120
    url, data, headers = posts[0]
    assert url == "https://auth.example/token"
    assert data["grant_type"].endswith("jwt-bearer")
    assert headers["Content-Type"] == "application/x-www-form-urlencoded"
    h, c, sig = data["assertion"].split(".")

    def unb64(s):
        return b64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

    assert js.loads(unb64(h)) == {"alg": "RS256", "typ": "JWT"}
    claims = js.loads(unb64(c))
    assert claims == {
        "iss": "iss-x",
        "sub": "sub-y",
        "aud": "aud-z",
        "iat": 1_000_000,
        "exp": 1_000_000 + 1800,
        "scope": "read write",
    }
    # signature verifies against the public key (raises on mismatch)
    pub.verify(
        unb64(sig), f"{h}.{c}".encode(), padding.PKCS1v15(), hashes.SHA256()
    )


def test_oauth1_header_signature_deterministic_and_correct():
    """oauth1.go parity: recompute the base string + HMAC independently
    and assert the header carries exactly that signature."""
    import base64 as b64
    import hashlib
    import hmac as hm
    import urllib.parse as up

    from caterpillar_spark.sources.oauth import oauth1_header

    hdr = oauth1_header(
        "GET",
        "HTTPS://API.Example.com/v1/items?b=2&a=1 x",
        consumer_key="ck",
        consumer_secret="cs",
        token="tk",
        token_secret="ts",
        realm="r1",
        nonce_fn=lambda: "fixed-nonce",
        timestamp_fn=lambda: 1_700_000_000,
    )
    assert hdr == oauth1_header(  # deterministic under injected nonce/ts
        "GET",
        "HTTPS://API.Example.com/v1/items?b=2&a=1 x",
        consumer_key="ck",
        consumer_secret="cs",
        token="tk",
        token_secret="ts",
        realm="r1",
        nonce_fn=lambda: "fixed-nonce",
        timestamp_fn=lambda: 1_700_000_000,
    )
    assert hdr.startswith("OAuth ")
    assert 'realm="r1"' in hdr and 'oauth_nonce="fixed-nonce"' in hdr
    # independent reconstruction (reference semantics: lowercased
    # scheme/host, query stripped from base url, sorted k=enc(v) params,
    # RAW-secret signing key, query-escaped base64 signature)
    params = sorted(
        [
            "oauth_consumer_key=ck",
            "oauth_signature_method=HMAC-SHA256",
            "oauth_timestamp=1700000000",
            "oauth_token=tk",
            "oauth_version=1.0",
            "oauth_nonce=fixed-nonce",
            "a=1%20x",
            "b=2",
        ]
    )
    base = "&".join(
        [
            "GET",
            up.quote("https://api.example.com/v1/items", safe="-._~"),
            up.quote("&".join(params), safe="-._~"),
        ]
    )
    digest = hm.new(b"cs&ts", base.encode(), hashlib.sha256).digest()
    expected_sig = up.quote_plus(b64.b64encode(digest).decode())
    assert f'oauth_signature="{expected_sig}"' in hdr


def test_oauth1_query_plus_decodes_as_space_like_reference():
    """Pin the documented endpoint-query semantics (ADVICE r5): a raw '+'
    in the query signs as a space — parity with Go url.ParseQuery in
    oauth1.go:75 — while %2B signs as a literal plus. Callers must supply
    RFC 3986 percent-encoded queries."""
    from caterpillar_spark.sources.oauth import oauth1_header

    kw = dict(
        consumer_key="ck", consumer_secret="cs", token="tk", token_secret="ts",
        nonce_fn=lambda: "n", timestamp_fn=lambda: 1_700_000_000,
    )
    raw_plus = oauth1_header("GET", "https://h/p?q=a+b", **kw)
    space = oauth1_header("GET", "https://h/p?q=a%20b", **kw)
    literal = oauth1_header("GET", "https://h/p?q=a%2Bb", **kw)
    assert raw_plus == space  # '+' means space, as in the reference
    assert literal != space  # %2B survives as a literal plus


def test_paginate_with_retry_wrapper(spark):
    """The retry= kwarg wires with_retries into the pagination loop."""
    flaky_pages = _Flaky(
        [
            ConnectionError("cold start"),
            PAGES[None],
            PAGES["p2"],
            ConnectionError("mid-chain blip"),
            PAGES["p3"],
        ]
    )

    def fetch(ctx):
        return flaky_pages(ctx)

    slept = []
    df = paginate(
        spark,
        fetch_fn=fetch,
        records_fn=lambda r: r["items"],
        next_context_fn=lambda r: r["next"],
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
        ),
        retry={"max_retries": 3, "retry_delay": 0.5, "sleep_fn": slept.append},
    )
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert slept == [0.5, 0.5]


# ---------------------------------------------------------------- xlsx
def test_read_excel_or_clean_gate(spark, tmp_path):
    from caterpillar_spark.sources.xlsx import read_excel

    try:
        import openpyxl  # noqa: F401

        have_engine = True
    except ImportError:
        have_engine = False

    path = str(tmp_path / "t.xlsx")
    if not have_engine:
        with pytest.raises(RuntimeError, match="Excel engine"):
            read_excel(spark, path)
        return
    import pandas as pd

    pd.DataFrame(
        {"Order ID": [1, 2], "Unit Price!": [1.5, None]}
    ).to_excel(path, index=False)
    df = read_excel(spark, path)
    assert df.columns == ["order_id", "unit_price"]
    got = sorted((r["order_id"], r["unit_price"]) for r in df.collect())
    assert got == [("1", "1.5"), ("2", None)]


# ---------------------------------------------------------- http_server
def test_webhook_spool_feeds_file_source(spark, tmp_path):
    """Push ingestion -> spool dir -> Spark reads it like any log segment
    (the http_server source mapped onto the pull-based file stream)."""
    import json
    import urllib.request

    from caterpillar_spark.sources.http_server import WebhookSpool

    spool = WebhookSpool(str(tmp_path / "spool")).start()
    try:
        host, port = spool.address
        for i in range(3):
            body = json.dumps({"id": i, "v": f"rec{i}"}).encode()
            req = urllib.request.Request(
                f"http://{host}:{port}/ingest", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 202
        assert spool.received == 3
    finally:
        spool.stop()
    # no partials on disk, arrival-ordered names
    import os

    names = sorted(os.listdir(str(tmp_path / "spool")))
    assert len(names) == 3 and not any(n.endswith(".tmp") for n in names)
    df = spark.read.json(str(tmp_path / "spool"))
    assert sorted((r["id"], r["v"]) for r in df.collect()) == [
        (0, "rec0"),
        (1, "rec1"),
        (2, "rec2"),
    ]


def _post(url, body=b"{}", headers=None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, method="POST")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        import urllib.request as _ur

        with _ur.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_webhook_auth_api_key(tmp_path):
    """api-key middleware parity (server/auth.go:23-34): every configured
    header must match exactly; rejects get 401 + JSON denial and spool
    nothing."""
    from caterpillar_spark.sources.http_server import AuthBehavior, WebhookSpool

    auth = AuthBehavior("api-key", headers={"X-Api-Key": "s3cret"})
    spool = WebhookSpool(str(tmp_path / "s"), auth=auth).start()
    try:
        host, port = spool.address
        url = f"http://{host}:{port}/ingest"
        code, body = _post(url)  # missing header
        assert code == 401 and b"access denied" in body
        code, _ = _post(url, headers={"X-Api-Key": "wrong"})
        assert code == 401
        code, _ = _post(url, headers={"X-Api-Key": "s3cret"})
        assert code == 202
        assert spool.received == 1 and spool.denied == 2
    finally:
        spool.stop()
    import os

    assert len(os.listdir(str(tmp_path / "s"))) == 1


def test_webhook_auth_ip_whitelist(tmp_path):
    """ip-whitelist parity (auth.go:36-53 + getClientIP 104-125): the first
    X-Forwarded-For entry wins; without it the socket peer is checked."""
    from caterpillar_spark.sources.http_server import AuthBehavior, WebhookSpool

    auth = AuthBehavior("ip-whitelist", whitelist_ips=("10.0.0.7", "127.0.0.1"))
    spool = WebhookSpool(str(tmp_path / "s"), auth=auth).start()
    try:
        host, port = spool.address
        url = f"http://{host}:{port}/ingest"
        code, _ = _post(url)  # peer is 127.0.0.1 -> allowed
        assert code == 202
        code, _ = _post(url, headers={"X-Forwarded-For": "10.0.0.7, 1.2.3.4"})
        assert code == 202  # first XFF entry is the client
        code, _ = _post(url, headers={"X-Forwarded-For": "8.8.8.8"})
        assert code == 401  # XFF overrides the (allowed) peer
    finally:
        spool.stop()

    import pytest

    deny_all = AuthBehavior("ip-whitelist")
    spool2 = WebhookSpool(str(tmp_path / "s2"), auth=deny_all).start()
    try:
        host, port = spool2.address
        code, _ = _post(f"http://{host}:{port}/ingest")
        assert code == 401
    finally:
        spool2.stop()
    with pytest.raises(ValueError, match="unknown behavior"):
        AuthBehavior("bearer")


def test_webhook_auth_basic(tmp_path):
    """basic-auth parity (auth.go:55-73 + extractBasicAuth 76-102)."""
    import base64

    from caterpillar_spark.sources.http_server import AuthBehavior, WebhookSpool

    auth = AuthBehavior("basic-auth", username="alice", password="pw:with:colons")
    spool = WebhookSpool(str(tmp_path / "s"), auth=auth).start()
    try:
        host, port = spool.address
        url = f"http://{host}:{port}/ingest"

        def basic(u, p):
            tok = base64.b64encode(f"{u}:{p}".encode()).decode()
            return {"Authorization": f"Basic {tok}"}

        assert _post(url)[0] == 401  # no header
        assert _post(url, headers={"Authorization": "Bearer x"})[0] == 401
        assert _post(url, headers={"Authorization": "Basic !!!"})[0] == 401
        assert _post(url, headers={"Authorization": "Basic dXNlcg=="})[0] == 401  # no colon
        assert _post(url, headers=basic("alice", "nope"))[0] == 401
        assert _post(url, headers=basic("bob", "pw:with:colons"))[0] == 401
        # password itself may contain colons (SplitN(.., 2) parity)
        assert _post(url, headers=basic("alice", "pw:with:colons"))[0] == 202
        assert spool.received == 1
    finally:
        spool.stop()


# ------------------------------------------------------------ kafka parse
def test_kafka_parse_layer_without_broker(spark):
    """The kafka source's parse layer on kafka-SHAPED data: JSON values
    against the pinned schema, broker partition backfills lineage,
    malformed JSON nulls out (quarantine's job, not a crash)."""
    import json

    from caterpillar_spark.sources.kafka import parse_changelog_json

    rows = [
        (
            json.dumps(
                {"lsn": 1, "op": "I", "conv_id": "c0", "turn_idx": 0,
                 "role": "user", "text": "hi", "source_partition": 7}
            ).encode(),
            0,
        ),
        (
            json.dumps(
                {"lsn": 2, "op": "U", "conv_id": "c0", "turn_idx": 0,
                 "role": "user", "text": "hi2"}
            ).encode(),
            3,
        ),
        (b"not json at all", 1),
    ]
    raw = spark.createDataFrame(rows, "value binary, partition int")
    got = {r["lsn"]: r for r in parse_changelog_json(raw).collect()}
    assert got[1]["source_partition"] == 7  # payload wins
    assert got[2]["source_partition"] == 3  # broker partition backfills
    assert got[2]["text"] == "hi2"
    assert None in got and got[None]["op"] is None  # malformed -> nulls


# ---------------------------------------------------------------- queue
def test_queue_at_least_once_and_competing_consumers():
    q = InMemoryQueue()
    for i in range(4):
        q.send({"n": i})
    # two competing consumers receive DISJOINT sets
    a = q.receive(max_messages=2, visibility_timeout=100)
    b = q.receive(max_messages=2, visibility_timeout=2)
    assert {m["n"] for _, m in a}.isdisjoint({m["n"] for _, m in b})
    assert len(a) == len(b) == 2
    # consumer B "crashes" (no ack): its messages reappear after timeout
    for receipt, _ in a:
        assert q.ack(receipt)
    redelivered = []
    for _ in range(5):
        redelivered += q.receive(max_messages=2, visibility_timeout=100)
    assert {m["n"] for _, m in redelivered} == {m["n"] for _, m in b}
    for receipt, _ in redelivered:
        q.ack(receipt)
    assert q.pending() == 0
    assert not q.ack((999, 1))  # unknown receipt is a no-op


def test_queue_stale_receipt_rejected():
    """A slow (not crashed) consumer's late ack must not delete a message
    another consumer is currently processing (per-delivery receipts, like
    SQS receipt handles)."""
    q = InMemoryQueue()
    q.send({"n": 0})
    (r_a, _), = q.receive(max_messages=1, visibility_timeout=1)
    # timeout lapses; consumer B receives the redelivery
    (r_b, _), = q.receive(max_messages=1, visibility_timeout=100)
    assert not q.ack(r_a)  # stale: rejected
    assert q.pending() == 1  # B's message untouched
    assert q.ack(r_b)
    assert q.pending() == 0


def test_queue_redelivery_is_exactly_once_through_ledger(spark, tmp_path):
    """The queue is at-least-once BY DESIGN (crash before ack =>
    redelivery); the snapshot ledger turns it into exactly-once: the
    redelivered batch's LSN range is already applied, so the merge no-ops
    and the final state matches the send-once oracle."""
    from caterpillar_spark.cdc import apply_changes
    from caterpillar_spark.sinks.snapshot_table import SnapshotTable

    payload = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    event = T.StructType(
        [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
        + list(payload.fields)
    )
    ts = dt.datetime(2024, 1, 1)

    def batch_df(msgs):
        return spark.createDataFrame(
            [
                (m["lsn"], m["op"], m["conv"], 0, "user", m["text"], None, ts)
                for _, m in msgs
            ],
            event,
        )

    q = InMemoryQueue()
    for lsn in range(6):
        q.send(
            {"lsn": lsn, "op": "I" if lsn < 3 else "U",
             "conv": f"c{lsn % 3}", "text": f"t{lsn}"}
        )
    tbl = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4).create(payload)

    # consumer 1 processes batch [0..2] but CRASHES BEFORE ACK
    m1 = q.receive(max_messages=3, visibility_timeout=2)
    apply_changes(batch_df(m1), tbl, batch_id=0)

    # consumer 2 drains everything (incl. the redelivered batch), acking
    applied, skipped = 0, 0
    for _ in range(10):
        msgs = q.receive(max_messages=3, visibility_timeout=100)
        if not msgs:
            break
        res = apply_changes(batch_df(msgs), tbl, batch_id=1 + applied + skipped)
        if res.snapshot_version == -1:
            skipped += 1
        else:
            applied += 1
        for receipt, _ in msgs:
            q.ack(receipt)
    assert skipped >= 1, "redelivered batch must be ledger-skipped"
    got = sorted((r["conv_id"], r["text"]) for r in tbl.read().collect())
    assert got == [("c0", "t3"), ("c1", "t4"), ("c2", "t5")]


def test_webhook_auth_edge_cases_unit():
    """r6 ADVICE parity edges: an empty first X-Forwarded-For entry falls
    back to the socket peer (getClientIP, auth.go:104-125), and non-ASCII
    credentials compare constant-time without raising (the reference
    compares plain strings and never errors; a TypeError here would 500
    instead of 401)."""
    import base64

    from caterpillar_spark.sources.http_server import AuthBehavior

    ipauth = AuthBehavior("ip-whitelist", whitelist_ips=("10.0.0.7",))
    # ", 10.0.0.7": first entry empty -> socket peer is the client
    assert ipauth.allows({"X-Forwarded-For": ", 10.0.0.7"}, "10.0.0.7")
    assert not ipauth.allows({"X-Forwarded-For": ", 10.0.0.7"}, "8.8.8.8")

    basic = AuthBehavior("basic-auth", username="ülrich", password="päss")
    tok = base64.b64encode("ülrich:päss".encode()).decode()
    assert basic.allows({"Authorization": f"Basic {tok}"}, "127.0.0.1")
    bad = base64.b64encode("ülrich:wröng".encode()).decode()
    assert not basic.allows({"Authorization": f"Basic {bad}"}, "127.0.0.1")

    key = AuthBehavior("api-key", headers={"X-Api-Key": "ключ"})
    assert key.allows({"X-Api-Key": "ключ"}, "127.0.0.1")
    assert not key.allows({"X-Api-Key": "wrong"}, "127.0.0.1")
