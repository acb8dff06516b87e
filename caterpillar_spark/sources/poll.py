"""External-orchestrator job polling — the reference's ``heimdall`` task
generalized (``internal/pkg/pipeline/task/heimdall/heimdall.go:58-87,
105-162``): submit a job to an external service, poll its status until a
terminal state, fetch the result.

Spark-first mapping: submission/polling is inherently serial driver-side
control flow (one job, one status endpoint — the reference is a
single-process loop too); the RESULT is what enters Spark, via
``paginate``-style record lists or a path the caller ``spark.read``s.
The three API calls are injected callables, so the logic tests without a
network and adapts to any orchestrator (the reference's Heimdall API is
proprietary infrastructure — this keeps the generic shape only).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

__all__ = ["submit_and_poll", "JobFailed", "JobTimeout"]

#: states treated as terminal, matching the reference's status switch
SUCCEEDED = "SUCCEEDED"
FAILED = "FAILED"


class JobFailed(RuntimeError):
    """The external job reached FAILED (heimdall.go:154-155)."""


class JobTimeout(TimeoutError):
    """No terminal state within the timeout (heimdall.go:161)."""


def submit_and_poll(
    submit_fn: Callable[[], dict],
    status_fn: Callable[[str], str],
    result_fn: Callable[[str], Any] | None = None,
    timeout: float = 3600.0,
    poll_interval: float = 10.0,
    get_result: bool = True,
    sleep=time.sleep,
    clock=time.monotonic,
) -> Any:
    """Submit one job and poll it to completion.

    - ``submit_fn() -> {"id": ..., "status": ..., "is_sync": bool,
      "result": ...}`` — POST the job (reference ``submitJob``). A
      synchronous response returns its inline result immediately; a
      FAILED response raises immediately.
    - ``status_fn(job_id) -> status`` — GET current status; any value
      other than SUCCEEDED/FAILED means still running.
    - ``result_fn(job_id) -> result`` — GET the result after SUCCEEDED
      (optional when ``get_result=False``).

    Raises :class:`JobFailed` on FAILED, :class:`JobTimeout` after
    ``timeout`` seconds without a terminal state. ``sleep``/``clock`` are
    injectable for tests (no real waiting).
    """
    resp = submit_fn()
    job_id = resp.get("id")
    if resp.get("status") == FAILED:
        raise JobFailed(f"job id {job_id} failed at submit")
    if resp.get("is_sync"):
        return resp.get("result") if get_result else None

    deadline = clock() + timeout
    while clock() < deadline:
        sleep(poll_interval)
        status = status_fn(job_id)
        if status == SUCCEEDED:
            if not get_result:
                return None
            if result_fn is None:
                raise ValueError("get_result=True requires result_fn")
            return result_fn(job_id)
        if status == FAILED:
            raise JobFailed(f"job id {job_id} failed")
        # else: still running, keep polling
    raise JobTimeout(f"job {job_id} timed out after {timeout}s")
