"""SFTP driver helper (fake transport) and the external-job poll helper —
the last two reference connectors (sftp.go / heimdall.go), plus the
RDD-free pagination schema inference they share the injectable-client
pattern with."""

from __future__ import annotations

import posixpath

import pytest

from caterpillar_spark.sources.poll import (
    JobFailed,
    JobTimeout,
    submit_and_poll,
)
from caterpillar_spark.sources.sftp import _match, fetch_sftp, put_sftp


class FakeTransport:
    """In-memory remote FS implementing the 4-method transport protocol."""

    def __init__(self, files: dict[str, bytes], fail_first: int = 0):
        self.files = dict(files)
        self.dirs: set[str] = set()
        self.fail_remaining = fail_first
        self.read_calls = 0

    def walk(self, base):
        seen_dirs = set()
        prefix = base.rstrip("/") + "/" if base not in (".", "/") else ""
        for p in sorted(self.files):
            if prefix and not p.startswith(prefix):
                continue
            d = posixpath.dirname(p)
            while d and d not in seen_dirs:
                seen_dirs.add(d)
                yield d, True
                d = posixpath.dirname(d)
            yield p, False

    def read(self, path):
        self.read_calls += 1
        if self.fail_remaining > 0:
            self.fail_remaining -= 1
            raise OSError("transient network error")
        if path not in self.files:
            raise FileNotFoundError(path)
        return self.files[path]

    def write(self, path, data):
        if posixpath.dirname(path) not in self.dirs:
            raise OSError(f"no such dir {posixpath.dirname(path)}")
        self.files[path] = data

    def mkdirs(self, path):
        parts = path.strip("/").split("/")
        cur = "/" if path.startswith("/") else ""
        for p in parts:
            cur = posixpath.join(cur, p) if cur else p
            self.dirs.add(cur)


REMOTE = {
    "data/in/a.csv": b"1,2\n",
    "data/in/B File.csv": b"3,4\n",
    "data/in/sub/c.csv": b"5,6\n",
    "data/other/d.txt": b"x",
}


def test_fetch_sftp_glob_and_slug(tmp_path):
    t = FakeTransport(REMOTE)
    got = fetch_sftp(t, "data/in/*.csv", str(tmp_path / "st"))
    names = sorted(p.rsplit("/", 1)[1] for p in got)
    # '*' must not span '/': sub/c.csv excluded; names slugified
    assert names == ["a_csv", "b_file_csv"]
    assert open(got[0], "rb").read() in (b"1,2\n", b"3,4\n")


def test_fetch_sftp_doublestar_spans_dirs(tmp_path):
    t = FakeTransport(REMOTE)
    got = fetch_sftp(t, "data/**/*.csv", str(tmp_path / "st"))
    assert len(got) == 3


def test_fetch_sftp_plain_path_and_missing(tmp_path):
    t = FakeTransport(REMOTE)
    got = fetch_sftp(t, "data/other/d.txt", str(tmp_path / "st"))
    assert open(got[0], "rb").read() == b"x"
    # a dead glob is an error, as in the reference (operations.go:128-130)
    with pytest.raises(FileNotFoundError):
        fetch_sftp(t, "data/in/*.json", str(tmp_path / "st2"))
    # a missing plain file surfaces through the retry wrapper
    with pytest.raises(RuntimeError, match="failed after"):
        fetch_sftp(t, "data/in/nope.csv", str(tmp_path / "st3"),
                   max_retries=2, retry_delay=0)


def test_fetch_sftp_retries_transient(tmp_path):
    t = FakeTransport(REMOTE, fail_first=2)
    got = fetch_sftp(t, "data/other/d.txt", str(tmp_path / "st"),
                     max_retries=3, retry_delay=0)
    assert open(got[0], "rb").read() == b"x"
    assert t.read_calls == 3  # 2 failures + 1 success


def test_fetch_sftp_slug_collision(tmp_path):
    t = FakeTransport({"in/a.csv": b"1", "in/a csv": b"2"})
    got = fetch_sftp(t, "in/*", str(tmp_path / "st"))
    assert len(got) == len(set(got)) == 2
    assert sorted(open(p, "rb").read() for p in got) == [b"1", b"2"]


def test_put_sftp_mkdirp_and_bytes(tmp_path):
    t = FakeTransport({})
    local = tmp_path / "out.parquet"
    local.write_bytes(b"PAR1")
    written = put_sftp(t, [str(local), ("inline.json", b"{}")],
                       "up/loads/today")
    assert written == ["up/loads/today/out.parquet",
                      "up/loads/today/inline.json"]
    assert t.files["up/loads/today/out.parquet"] == b"PAR1"
    assert t.files["up/loads/today/inline.json"] == b"{}"
    assert "up/loads/today" in t.dirs  # mkdir -p happened


def test_doublestar_match_rules():
    assert _match("a/*.csv", "a/x.csv")
    assert not _match("a/*.csv", "a/b/x.csv")
    assert _match("a/**/*.csv", "a/b/c/x.csv")
    assert _match("a/**/*.csv", "a/x.csv")  # ** matches zero dirs
    assert _match("a/file?.txt", "a/file1.txt")
    assert not _match("a/file?.txt", "a/file/x.txt")
    # character classes, incl. doublestar's [!...] negation (ADVICE r3:
    # '!' must become regex '^', not a literal member)
    assert _match("a/file[0-3].txt", "a/file2.txt")
    assert not _match("a/file[0-3].txt", "a/file7.txt")
    assert _match("a/file[!0-3].txt", "a/file7.txt")
    assert not _match("a/file[!0-3].txt", "a/file2.txt")  # the old bug:
    # pre-fix, '[!0-3]' was a literal class {'!','0'..'3'} and matched '2'
    assert _match("a/file[^0-3].txt", "a/file7.txt")  # '^' alias
    assert _match("a/x[]].txt", "a/x].txt")  # leading ']' is literal
    # ADVICE r4: a negated class must still exclude the path separator —
    # doublestar classes never match '/', so 'a/x[!y]z' must NOT match
    # the three-segment path 'a/x/z'
    assert not _match("a/x[!y]z", "a/x/z")
    assert _match("a/x[!y]z", "a/xQz")


# ------------------------------------------------------------------ poll
class FakeJobAPI:
    def __init__(self, statuses, sync=False, submit_status="RUNNING"):
        self.statuses = list(statuses)
        self.sync = sync
        self.submit_status = submit_status
        self.polls = 0

    def submit(self):
        return {
            "id": "job-1",
            "status": self.submit_status,
            "is_sync": self.sync,
            "result": {"rows": 7} if self.sync else None,
        }

    def status(self, job_id):
        assert job_id == "job-1"
        self.polls += 1
        return self.statuses[min(self.polls - 1, len(self.statuses) - 1)]

    def result(self, job_id):
        return {"rows": 42}


def test_poll_succeeds_after_running():
    api = FakeJobAPI(["RUNNING", "RUNNING", "SUCCEEDED"])
    out = submit_and_poll(api.submit, api.status, api.result,
                          timeout=100, poll_interval=1, sleep=lambda s: None)
    assert out == {"rows": 42}
    assert api.polls == 3


def test_poll_sync_short_circuit():
    api = FakeJobAPI([], sync=True)
    out = submit_and_poll(api.submit, api.status, api.result,
                          sleep=lambda s: None)
    assert out == {"rows": 7}
    assert api.polls == 0


def test_poll_failed_raises():
    api = FakeJobAPI(["RUNNING", "FAILED"])
    with pytest.raises(JobFailed, match="job-1"):
        submit_and_poll(api.submit, api.status, api.result,
                        timeout=100, poll_interval=1, sleep=lambda s: None)
    # failure AT submit raises without polling
    api2 = FakeJobAPI([], submit_status="FAILED")
    with pytest.raises(JobFailed):
        submit_and_poll(api2.submit, api2.status, api2.result,
                        sleep=lambda s: None)
    assert api2.polls == 0


def test_poll_timeout():
    api = FakeJobAPI(["RUNNING"])
    tick = {"t": 0.0}

    def clock():
        return tick["t"]

    def sleep(s):
        tick["t"] += s

    with pytest.raises(JobTimeout):
        submit_and_poll(api.submit, api.status, api.result,
                        timeout=30, poll_interval=10, sleep=sleep, clock=clock)
    assert api.polls == 3  # polls at t=10,20,30; then the deadline check


def test_poll_no_result_wanted():
    api = FakeJobAPI(["SUCCEEDED"])
    out = submit_and_poll(api.submit, api.status, result_fn=None,
                          get_result=False, timeout=10, poll_interval=1,
                          sleep=lambda s: None)
    assert out is None


# ----------------------------------------------- paginate without schema
def test_paginate_infers_schema_rdd_free(spark):
    """VERDICT r2 #4: the no-schema tail must not touch RDD APIs; inferred
    schema must union fields across pages and widen long->double."""
    from caterpillar_spark.sources.http import paginate

    pages = {
        None: {"items": [{"id": 1, "v": "a", "score": 1}], "next": "p2"},
        "p2": {"items": [{"id": 2, "extra": True, "score": 2.5}],
               "next": None},
    }
    df = paginate(
        spark,
        fetch_fn=lambda ctx: pages[ctx],
        records_fn=lambda r: r["items"],
        next_context_fn=lambda r: r["next"],
    )
    kinds = dict(df.dtypes)
    assert kinds["id"] == "bigint"
    assert kinds["score"] == "double"  # widened across pages
    assert kinds["extra"] == "boolean"
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["v"] == "a" and rows[1]["extra"] is None
    assert rows[2]["score"] == 2.5
