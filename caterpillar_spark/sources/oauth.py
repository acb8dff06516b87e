"""Executable OAuth helpers for the HTTP source — the reference's two
auth behaviors (``internal/pkg/pipeline/task/http/oauth.go:12-26``):

- OAuth 2.0 JWT-bearer (``oauth2.go:25-66``): build an RS256-signed JWT
  assertion from (issuer, subject, audience, scope, private key), POST it
  form-encoded to the token endpoint, attach the returned access token as
  ``Authorization: Bearer <token>``. Here the token POST is injectable
  (:func:`jwt_bearer_token_fn`) and the Bearer attach/refresh is
  :func:`oauth_fetch` — which, unlike the reference (a fresh token per
  request), caches the token until expiry or a 401.
- OAuth 1.0 HMAC-SHA256 request signing (``oauth1.go:66-123``):
  :func:`oauth1_header` builds the ``Authorization: OAuth ...`` header
  with the reference's exact base-string construction — including its two
  deliberate RFC 5849 deviations, kept for parity: the signing key joins
  the RAW secrets (no percent-encoding), and the base64 signature is
  query-escaped ('+' for space, via ``quote_plus``). Nonce and timestamp
  are injectable so tests (and replay audits) are deterministic.

Everything composes with :func:`~caterpillar_spark.sources.http.with_retries`
(wrap the oauth_fetch result) and drops into ``paginate`` /
``fetch_distributed`` as the injected ``fetch_fn`` — auth stays a property
of the client, never of the pagination loop.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.parse
from collections.abc import Callable, Sequence
from typing import Any


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def jwt_bearer_assertion(
    private_key_pem: str | bytes,
    issuer: str,
    subject: str,
    audience: str,
    scope: Sequence[str] = (),
    now: int | None = None,
    expiration: int = 30 * 60,
) -> str:
    """RS256 JWT assertion with the reference's claim set
    (``oauth2.go:getJWT``: iss/sub/aud/iat/exp + space-joined scope,
    30-minute expiry). ``now`` is injectable for deterministic tests."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    if now is None:
        now = int(time.time())
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {
        "iss": issuer,
        "sub": subject,
        "aud": audience,
        "iat": now,
        "exp": now + expiration,
        "scope": " ".join(scope),
    }
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    )
    pem = private_key_pem if isinstance(private_key_pem, bytes) else private_key_pem.encode()
    key = serialization.load_pem_private_key(pem, password=None)
    sig = key.sign(signing_input.encode(), padding.PKCS1v15(), hashes.SHA256())
    return signing_input + "." + _b64url(sig)


def jwt_bearer_token_fn(
    post_fn: Callable[[str, dict, dict], Any],
    token_uri: str,
    private_key_pem: str | bytes,
    issuer: str,
    subject: str,
    audience: str,
    scope: Sequence[str] = (),
    grant_type: str = "urn:ietf:params:oauth:grant-type:jwt-bearer",
    expiration: int = 30 * 60,
    now_fn: Callable[[], float] = time.time,
) -> Callable[[], tuple[str, float]]:
    """Build a ``token_fn`` for :func:`oauth_fetch` implementing the
    OAuth2 JWT-bearer grant (``oauth2.go:getOauthToken``): form-encode
    ``{assertion, grant_type}``, POST to ``token_uri`` via the injectable
    ``post_fn(url, form_data, headers) -> response dict/str`` and read
    ``access_token`` (plus ``expires_in`` when the server sends one; the
    assertion's own expiry bounds the cache otherwise)."""

    def token_fn() -> tuple[str, float]:
        now = int(now_fn())
        assertion = jwt_bearer_assertion(
            private_key_pem, issuer, subject, audience, scope, now, expiration
        )
        resp = post_fn(
            token_uri,
            {"assertion": assertion, "grant_type": grant_type},
            {"Content-Type": "application/x-www-form-urlencoded"},
        )
        body = json.loads(resp) if isinstance(resp, (str, bytes)) else resp
        expires_at = now + float(body.get("expires_in", expiration))
        return str(body["access_token"]), expires_at

    return token_fn


def oauth_fetch(
    fetch_fn: Callable[..., Any],
    token_fn: Callable[[], str | tuple[str, float]],
    status_fn: Callable[[Any], int] | None = None,
    unauthorized_statuses: Sequence[int] = (401,),
    now_fn: Callable[[], float] = time.time,
) -> Callable[..., Any]:
    """Bearer-auth wrapper around an injected fetch.

    ``token_fn()`` returns either a token string or ``(token,
    expires_at_epoch)``. The wrapper caches the token and passes it to
    ``fetch_fn`` as the ``authorization`` keyword (value ``"Bearer
    <token>"``) — the fetch kernel owns turning that into a real header,
    keeping this transport-agnostic. Refresh happens when the cached
    token is past expiry, or — when ``status_fn`` is given — when a
    response comes back 401 (one refresh + one retry per call; a second
    401 returns to the caller, so a broken credential can't loop).

    Compose with retries OUTSIDE this wrapper::

        fetch = with_retries(oauth_fetch(raw_fetch, token_fn,
                                         status_fn=...), max_retries=3,
                             status_fn=..., expected_statuses=(200,))

    so transient failures re-enter the auth path and a mid-retry token
    expiry still refreshes.
    """
    state: dict[str, Any] = {"token": None, "expires_at": None}

    def _current_token(force: bool = False) -> str:
        expired = (
            state["expires_at"] is not None
            and now_fn() >= state["expires_at"]
        )
        if force or expired or state["token"] is None:
            got = token_fn()
            if isinstance(got, tuple):
                state["token"], state["expires_at"] = got[0], got[1]
            else:
                state["token"], state["expires_at"] = got, None
        return state["token"]

    def wrapped(*args: Any, **kwargs: Any) -> Any:
        resp = fetch_fn(
            *args, authorization=f"Bearer {_current_token()}", **kwargs
        )
        if status_fn is not None and status_fn(resp) in unauthorized_statuses:
            resp = fetch_fn(
                *args,
                authorization=f"Bearer {_current_token(force=True)}",
                **kwargs,
            )
        return resp

    return wrapped


def _percent_encode(s: str) -> str:
    """RFC 3986 2.3 unreserved set only (``oauth1.go:percentEncode``)."""
    return urllib.parse.quote(s, safe="-._~")


def oauth1_header(
    method: str,
    endpoint: str,
    consumer_key: str,
    consumer_secret: str,
    token: str,
    token_secret: str,
    signature_method: str = "HMAC-SHA256",
    version: str = "1.0",
    realm: str | None = None,
    nonce_fn: Callable[[], str] | None = None,
    timestamp_fn: Callable[[], int] | None = None,
) -> str:
    """``Authorization`` header value for OAuth 1.0 HMAC-SHA256 request
    signing, reproducing ``oauth1.go:66-123`` exactly:

    - base string = METHOD & enc(lowercased scheme+host, query stripped)
      & enc(sorted "k=enc(v)" of oauth params + url query params);
    - signing key = consumer_secret + '&' + token_secret with the RAW
      secrets (the reference skips RFC 5849's percent-encoding here —
      kept verbatim so signatures agree with the reference against the
      same server config);
    - signature = query-escaped base64(HMAC-SHA256(key, base));
    - header parts are emitted SORTED (the reference iterates a Go map,
      i.e. random order — servers parse the header as a set, so a
      deterministic order is compatible and testable).

    ``nonce_fn``/``timestamp_fn`` inject determinism; defaults use
    ``secrets``/wall-clock like the reference.

    Endpoint-query caveat (ADVICE r5): the query is parsed with
    ``parse_qsl``, which decodes ``+`` as a space and percent-decodes
    values before they are re-encoded into the base string. That is
    deliberate parity — the reference's ``parsedURL.Query()`` (Go
    ``url.ParseQuery``) does exactly the same — but it means the
    ``endpoint`` query must be RFC 3986 percent-encoded: write a literal
    plus as ``%2B``, never ``+``. A raw ``+`` signs as a space on both
    sides, matching the reference against the same server config.
    """
    if nonce_fn is None:
        import secrets

        def nonce_fn() -> str:  # 24 urlsafe chars, as oauth1.go:getNonce
            return base64.urlsafe_b64encode(secrets.token_bytes(24)).decode()[:24]

    ts = int(timestamp_fn() if timestamp_fn else time.time())
    parsed = urllib.parse.urlsplit(endpoint)
    base_url = urllib.parse.urlunsplit(
        (parsed.scheme.lower(), parsed.netloc.lower(), parsed.path, "", "")
    )
    oauth_params = {
        "oauth_consumer_key": consumer_key,
        "oauth_signature_method": signature_method,
        "oauth_timestamp": str(ts),
        "oauth_token": token,
        "oauth_version": version,
        "oauth_nonce": nonce_fn(),
    }
    parameters = [f"{k}={_percent_encode(v)}" for k, v in oauth_params.items()]
    for k, v in urllib.parse.parse_qsl(parsed.query, keep_blank_values=True):
        parameters.append(f"{k}={_percent_encode(v)}")
    parameters.sort()
    base_string = "&".join(
        [
            method,
            _percent_encode(base_url),
            _percent_encode("&".join(parameters)),
        ]
    )
    digest = hmac.new(
        (consumer_secret + "&" + token_secret).encode(),
        base_string.encode(),
        hashlib.sha256,
    ).digest()
    signature = urllib.parse.quote_plus(base64.b64encode(digest).decode())
    parts = [f'{k}="{v}"' for k, v in oauth_params.items()]
    parts.append(f'oauth_signature="{signature}"')
    if realm:
        parts.append(f'realm="{realm}"')
    return "OAuth " + ",".join(sorted(parts))
