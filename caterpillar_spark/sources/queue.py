"""In-memory message queue with SQS delivery semantics — a test double
that makes the reference's queue contract executable in the sandbox
(``internal/pkg/pipeline/task/sqs/sqs.go:158-188``): at-least-once
delivery, per-message visibility timeout, competing consumers, and
DELETE-AFTER-PROCESSING acks (the reference deletes the SQS message only
after the record made it through the pipeline — crash before ack =>
redelivery).

Combined with the snapshot ledger this demonstrates the engine's
exactly-once claim end to end: the QUEUE is at-least-once (duplicates on
consumer crash are by design), and the SINK's atomic offsets+data commit
deduplicates them — the upgrade over the reference's at-least-once rule.

The clock is injectable so visibility-timeout tests are deterministic
(no sleeps, no wall-clock flake).
"""

from __future__ import annotations

import heapq
import itertools
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class _Msg:
    msg_id: int
    body: object
    visible_at: float = 0.0
    deliveries: int = 0


@dataclass
class InMemoryQueue:
    """SQS-semantics queue: ``send`` / ``receive`` / ``ack``.

    ``receive`` hides delivered messages for ``visibility_timeout`` ticks;
    a consumer that crashes before ``ack`` loses nothing — the message
    reappears for any competing consumer after the timeout.
    """

    clock: Callable[[], float] = field(default=None)  # type: ignore[assignment]
    _heap: list[tuple[float, int, _Msg]] = field(default_factory=list)
    _inflight: dict[int, _Msg] = field(default_factory=dict)
    _ids: "itertools.count[int]" = field(default_factory=itertools.count)
    _now: float = 0.0

    def __post_init__(self):
        if self.clock is None:
            self.clock = self._tick  # logical clock: 1 tick per receive()

    def _tick(self) -> float:
        return self._now

    def send(self, body: object) -> int:
        mid = next(self._ids)
        heapq.heappush(self._heap, (0.0, mid, _Msg(mid, body)))
        return mid

    def receive(
        self, max_messages: int = 10, visibility_timeout: float = 30.0
    ) -> list[tuple[tuple[int, int], object]]:
        """Up to ``max_messages`` currently-visible messages as
        ``(receipt, body)``; each becomes invisible for the timeout.
        Competing consumers calling concurrently receive DISJOINT sets —
        that is the SQS contract this double exists to model. The receipt
        is PER DELIVERY (``(msg_id, delivery_n)``, like SQS receipt
        handles): once the visibility timeout lapses and another consumer
        receives the message, the earlier receipt is stale and its late
        ack is rejected — a slow consumer cannot delete a message someone
        else is processing."""
        self._now += 1.0
        now = self.clock()
        out: list[tuple[tuple[int, int], object]] = []
        requeue: list[tuple[float, int, _Msg]] = []
        while self._heap and len(out) < max_messages:
            visible_at, mid, msg = heapq.heappop(self._heap)
            if visible_at > now:
                requeue.append((visible_at, mid, msg))
                break
            msg.deliveries += 1
            msg.visible_at = now + visibility_timeout
            self._inflight[mid] = msg
            heapq.heappush(self._heap, (msg.visible_at, mid, msg))
            out.append(((mid, msg.deliveries), msg.body))
        for item in requeue:
            heapq.heappush(self._heap, item)
        return out

    def ack(self, receipt: tuple[int, int]) -> bool:
        """Delete after processing (sqs.go DeleteMessage): idempotent;
        returns False for an unknown, already-acked, or STALE receipt
        (the message was redelivered since this receipt was issued)."""
        try:
            mid, delivery = receipt
        except (TypeError, ValueError):
            return False
        msg = self._inflight.get(mid)
        if msg is None or msg.deliveries != delivery:
            return False
        del self._inflight[mid]
        # lazily dropped from the heap on next pop
        self._heap = [(v, m, x) for v, m, x in self._heap if m != mid]
        heapq.heapify(self._heap)
        return True

    def pending(self) -> int:
        """Messages not yet acked (visible or in flight)."""
        return len(self._heap)
