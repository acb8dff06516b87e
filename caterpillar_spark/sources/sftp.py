"""SFTP source/sink driver helpers — the reference's remote-file connector
(``internal/pkg/pipeline/task/sftp/sftp.go:93-112``,
``task/sftp/operations.go:22-158``).

Spark-first mapping: SFTP is a single-session protocol — the reference
itself runs one client connection and loops files through it — so the
transfer is driver-side work, exactly like ``http.paginate``. The Spark
boundary is a local STAGING DIRECTORY: ``fetch_sftp`` downloads matching
remote files into it and the caller hands the directory to
``read_files``/``spark.read`` (which parallelizes parsing across
executors); ``put_sftp`` uploads already-materialized local files (e.g. a
``write_files`` output dir) back out. On a real cluster the staging dir
is shared storage (S3/NFS mount); here it is any local path.

The transport is INJECTABLE (same pattern as ``translate_text`` and
``paginate``): any object with the four-method surface below works, so
the logic is fully testable without a network. ``paramiko_transport``
adapts the real library when it is installed (it is not in this sandbox
— import-gated with a clear error, per the repo dependency policy).

Transport protocol::

    walk(base)      -> iterable of (posix_path, is_dir) under base
    read(path)      -> bytes
    write(path, b)  -> None (create/overwrite; flush errors must raise)
    mkdirs(path)    -> None (mkdir -p semantics)
"""

from __future__ import annotations

import os
import posixpath
import re
import time
from collections.abc import Callable, Iterable

from caterpillar_spark.sources.files import _slugify

__all__ = ["fetch_sftp", "put_sftp", "paramiko_transport"]


def _glob_base(pattern: str) -> str:
    """Static directory prefix of a glob (walk root) — everything before
    the first component containing a metacharacter."""
    parts = pattern.split("/")
    static = []
    for p in parts[:-1]:
        if re.search(r"[*?\[]", p):
            break
        static.append(p)
    return "/".join(static) or ("/" if pattern.startswith("/") else ".")


def _match(pattern: str, path: str) -> bool:
    """Doublestar-style match: ``**`` spans path separators, ``*``/``?``
    do not (the reference uses github.com/bmatcuk/doublestar,
    ``operations.go:108-135``)."""
    rx = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                rx.append(".*")
                i += 2
                if i < n and pattern[i] == "/":
                    i += 1  # '**/' also matches zero directories
                continue
            rx.append("[^/]*")
        elif c == "?":
            rx.append("[^/]")
        elif c == "[":
            # fnmatch-style class scan: a ']' right after the (possibly
            # negated) '[' is a literal member, not the terminator
            k = i + 1
            if k < n and pattern[k] in ("!", "^"):
                k += 1
            if k < n and pattern[k] == "]":
                k += 1
            j = pattern.find("]", k)
            if j == -1:
                rx.append(re.escape(c))
            else:
                body = pattern[i + 1 : j]
                # doublestar negation is '[!abc]' (also accepts '^'); in a
                # Python regex '!' would be a literal member and silently
                # select the OPPOSITE file set (ADVICE r3)
                if body[:1] in ("!", "^"):
                    # the negated set must still exclude '/': doublestar
                    # classes never match the path separator, but a bare
                    # regex [^y] would (ADVICE r4)
                    body = "^/" + body[1:]
                rx.append("[" + body + "]")
                i = j
        else:
            rx.append(re.escape(c))
        i += 1
    return re.fullmatch("".join(rx), path) is not None


def _retry(op: str, fn: Callable, max_retries: int, retry_delay: float):
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception as e:  # transient transport errors retry
            last = e
            if attempt + 1 < max_retries:
                time.sleep(retry_delay)
    raise RuntimeError(f"sftp {op} failed after {max_retries} attempts: {last}")


def fetch_sftp(
    transport,
    pattern: str,
    staging_dir: str,
    max_retries: int = 3,
    retry_delay: float = 1.0,
) -> list[str]:
    """Download remote file(s) matching ``pattern`` (a plain path or a
    doublestar glob) into ``staging_dir``; returns the local paths.

    Parity with the reference source path (``operations.go:80-135``):
    - a glob walks the static base directory and matches files only;
    - matching NO files is an error (missing file / dead glob);
    - each staged file is named by its slugified remote base name — the
      same value the reference stamps into record context as
      ``CATERPILLAR_FILE_NAME_WRITE`` for downstream sinks to template;
    - per-file transfers retry ``max_retries`` times.

    Name collisions after slugification (e.g. ``a.csv`` and ``a_csv``)
    get a numeric suffix rather than silently overwriting.
    """
    matches = []
    if re.search(r"[*?\[]", pattern):
        for path, is_dir in transport.walk(_glob_base(pattern)):
            if not is_dir and _match(pattern, path):
                matches.append(path)
    else:
        matches.append(pattern)
        # a plain path must exist — surface the read error below
    if not matches:
        raise FileNotFoundError(f"no files found at {pattern!r}")

    os.makedirs(staging_dir, exist_ok=True)
    out, used = [], set()
    for remote in sorted(matches):
        data = _retry(
            f"download {remote}",
            lambda r=remote: transport.read(r),
            max_retries,
            retry_delay,
        )
        name = _slugify(posixpath.basename(remote))
        local = os.path.join(staging_dir, name)
        k = 1
        while local in used:
            local = os.path.join(staging_dir, f"{name}_{k}")
            k += 1
        used.add(local)
        with open(local, "wb") as f:
            f.write(data)
        out.append(local)
    return out


def put_sftp(
    transport,
    files: Iterable[str | tuple[str, bytes]],
    remote_dir: str,
    max_retries: int = 3,
    retry_delay: float = 1.0,
) -> list[str]:
    """Upload files to ``remote_dir``; returns the remote paths written.

    ``files``: local paths, or ``(name, bytes)`` pairs for in-memory
    payloads. Parity with the reference sink path
    (``operations.go:44-76``): parent directories are created mkdir-p
    style, each upload retries, and write/flush errors raise (the
    reference checks ``Close()`` because SFTP surfaces out-of-space
    there — our transport contract requires ``write`` to do the same).
    """
    written = []
    for item in files:
        if isinstance(item, tuple):
            name, data = item
        else:
            name = os.path.basename(item)
            with open(item, "rb") as f:
                data = f.read()
        remote = posixpath.join(remote_dir, name)
        parent = posixpath.dirname(remote)

        def _up(remote=remote, parent=parent, data=data):
            if parent and parent != ".":
                transport.mkdirs(parent)
            transport.write(remote, data)

        _retry(f"upload {remote}", _up, max_retries, retry_delay)
        written.append(remote)
    return written


def paramiko_transport(
    host: str,
    username: str,
    port: int = 22,
    password: str | None = None,
    private_key_path: str | None = None,
    known_hosts_path: str | None = None,
    timeout: float = 30.0,
):
    """Adapt a real paramiko SFTP session to the transport protocol.

    Mirrors the reference's connection rules (``sftp.go:36-58,117-145``):
    exactly one of password / private key; host-key verification is
    REQUIRED (a known_hosts file — never auto-accept). Import-gated:
    paramiko is not installed in this sandbox, so this raises a clear
    error there while the protocol (and everything above it) stays
    testable with a fake.
    """
    try:
        import paramiko
    except ImportError as e:  # pragma: no cover - gated dependency
        raise RuntimeError(
            "paramiko is not installed; pass a custom transport object "
            "(see module docstring for the 4-method protocol)"
        ) from e
    if bool(password) == bool(private_key_path):
        raise ValueError("exactly one of password/private_key_path required")
    if not known_hosts_path:
        raise ValueError(
            "known_hosts_path is required (host-key verification is "
            "mandatory, as in the reference; no auto-accept)"
        )
    ssh = paramiko.SSHClient()
    ssh.load_host_keys(known_hosts_path)
    ssh.set_missing_host_key_policy(paramiko.RejectPolicy())
    kwargs: dict = {"username": username, "timeout": timeout, "port": port}
    if password:
        kwargs["password"] = password
    else:
        kwargs["key_filename"] = private_key_path
    ssh.connect(host, **kwargs)
    sftp = ssh.open_sftp()

    class _Paramiko:
        def walk(self, base):
            stack = [base]
            while stack:
                d = stack.pop()
                for attr in sftp.listdir_attr(d):
                    p = posixpath.join(d, attr.filename)
                    import stat as _stat

                    is_dir = _stat.S_ISDIR(attr.st_mode)
                    yield p, is_dir
                    if is_dir:
                        stack.append(p)

        def read(self, path):
            with sftp.open(path, "rb") as f:
                return f.read()

        def write(self, path, data):
            with sftp.open(path, "wb") as f:
                f.write(data)

        def mkdirs(self, path):
            parts = path.strip("/").split("/")
            cur = "/" if path.startswith("/") else ""
            for p in parts:
                cur = posixpath.join(cur, p) if cur else p
                try:
                    sftp.mkdir(cur)
                except OSError:
                    pass  # exists

        def close(self):
            sftp.close()
            ssh.close()

    return _Paramiko()
