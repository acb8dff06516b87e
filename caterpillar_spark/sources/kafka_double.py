"""In-memory Kafka broker double — makes the reference's kafka task
semantics executable in the broker-less sandbox, the same move
``sources/queue.py`` makes for SQS.

Contract modeled (``task/kafka/kafka.go``):

- standalone mode (no ``group_id``): direct-assign all partitions at the
  beginning and NEVER commit (``kafka.go:210,234-236,288-293``) — every
  run is a full replay;
- group mode: resume from the group's committed offsets;
  ``auto_offset_reset`` earliest/latest decides the start when no offset
  is stored (``kafka.go:52``); offsets are STORED only after the record
  was delivered downstream (``kafka.go:288-293``,
  ``enable.auto.offset.store=false``) and persist on ``commit()`` — crash
  before commit ⇒ redelivery, the at-least-once rule the snapshot ledger
  upgrades to exactly-once;
- ``max_records`` read bound (``kafka.go:296-299``);
- keyless produce round-robins partitions (``PartitionAny``,
  ``kafka.go:173``); keyed produce hashes the key so one key's history
  stays ordered within a partition;
- idempotent producer (``kafka.go:56`` ``Idempotent``): per
  (producer, partition) sequence numbers; a retried flush of the same
  batch appends nothing;
- transactions + ``isolation.level=read_committed`` (``kafka.go:407``):
  records of an open transaction are invisible, an aborted transaction's
  records stay invisible forever, and — as in a real broker — a
  read_committed consumer cannot read PAST the first open transaction's
  offset (the LSO rule), even for later non-transactional records.

``topic_to_dataframe`` bridges a topic into the kafka-shaped DataFrame
(key/value/topic/partition/offset/timestamp) that
``kafka.parse_changelog_json`` consumes, which is what lets tests drive
the full produce → read_committed → parse → snapshot-merge path without a
broker. The broker itself is a test double: driver-side, metadata-scale
state only — production traffic uses ``stream_kafka_changelog`` against a
real cluster.
"""

from __future__ import annotations

import itertools
import zlib
from dataclasses import dataclass, field


@dataclass
class _Rec:
    offset: int
    key: bytes | None
    value: bytes
    timestamp: int
    txn: str | None = None  # transactional_id, None = non-transactional


class KafkaError(RuntimeError):
    pass


class LogBroker:
    """Topics → fixed partition lists of append-only logs, plus the
    broker-side group-offset and transaction-state tables."""

    def __init__(self) -> None:
        self._topics: dict[str, list[list[_Rec]]] = {}
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        # txn TOKEN -> open|committed|aborted. Tokens are per-session
        # ("id#epoch"): reusing a transactional_id opens a NEW token, so a
        # previously committed session's records stay visible.
        self._txn_state: dict[str, str] = {}
        self._txn_epoch: dict[str, int] = {}
        self._producer_seq: dict[tuple[int, str, int], int] = {}
        self._producer_ids = itertools.count(1)
        self._clock = itertools.count(1_000)  # deterministic timestamps

    # -- admin ----------------------------------------------------------

    def create_topic(self, topic: str, partitions: int = 3) -> None:
        if partitions < 1:
            raise KafkaError("partitions must be >= 1")
        self._topics.setdefault(topic, [[] for _ in range(partitions)])

    def partitions(self, topic: str) -> int:
        self._require(topic)
        return len(self._topics[topic])

    def end_offsets(self, topic: str) -> list[int]:
        self._require(topic)
        return [len(p) for p in self._topics[topic]]

    def _require(self, topic: str) -> None:
        if topic not in self._topics:
            raise KafkaError(f"unknown topic {topic!r}")

    # -- produce ----------------------------------------------------------

    def producer(
        self, *, idempotent: bool = False, transactional_id: str | None = None
    ) -> "Producer":
        return Producer(self, next(self._producer_ids), idempotent, transactional_id)

    def _append(
        self,
        topic: str,
        partition: int,
        key: bytes | None,
        value: bytes,
        txn: str | None,
    ) -> int:
        self._require(topic)
        log = self._topics[topic][partition]
        rec = _Rec(len(log), key, value, next(self._clock), txn)
        log.append(rec)
        return rec.offset

    # -- consume ----------------------------------------------------------

    def committed(self, group_id: str, topic: str, partition: int) -> int | None:
        return self._group_offsets.get((group_id, topic, partition))

    def _txn_visible(self, rec: _Rec) -> bool:
        return rec.txn is None or self._txn_state.get(rec.txn) == "committed"

    def _lso(self, topic: str, partition: int) -> int:
        """Last stable offset: first offset of a still-OPEN transaction
        (read_committed consumers stop there), else the log end."""
        log = self._topics[topic][partition]
        for rec in log:
            if rec.txn is not None and self._txn_state.get(rec.txn) == "open":
                return rec.offset
        return len(log)

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_records: int,
        isolation: str = "read_committed",
    ) -> list[_Rec]:
        """Records from ``offset`` on, honoring isolation. Aborted-txn
        records are filtered (never surfaced) in read_committed; in
        read_uncommitted everything appended is visible."""
        self._require(topic)
        log = self._topics[topic][partition]
        end = self._lso(topic, partition) if isolation == "read_committed" else len(log)
        out: list[_Rec] = []
        for rec in log[offset:end]:
            if isolation == "read_committed" and not self._txn_visible(rec):
                continue
            out.append(rec)
            if len(out) >= max_records:
                break
        return out


class Producer:
    """Batching producer: ``send`` buffers, ``flush`` appends. With
    ``idempotent=True`` every buffered record carries a (producer,
    partition) sequence number and the broker drops already-seen
    sequences — calling ``flush`` again after a simulated delivery-report
    loss (the retry path) appends nothing new."""

    def __init__(
        self,
        broker: LogBroker,
        pid: int,
        idempotent: bool,
        transactional_id: str | None,
    ) -> None:
        self._b = broker
        self._pid = pid
        self._idempotent = idempotent or transactional_id is not None
        self._txn = transactional_id
        self._rr = 0
        self._batch: list[tuple[str, int, bytes | None, bytes, int]] = []
        self._seq: dict[tuple[str, int], int] = {}
        if transactional_id is not None:
            epoch = broker._txn_epoch.get(transactional_id, -1)
            if epoch >= 0 and broker._txn_state.get(f"{transactional_id}#{epoch}") == "open":
                raise KafkaError(f"transaction {transactional_id!r} already open")
            epoch += 1
            broker._txn_epoch[transactional_id] = epoch
            self._txn = f"{transactional_id}#{epoch}"
            broker._txn_state[self._txn] = "open"

    def _route(self, topic: str, key: bytes | None) -> int:
        n = self._b.partitions(topic)
        if key is None:
            self._rr += 1
            return self._rr % n
        return zlib.crc32(key) % n

    def send(self, topic: str, value: bytes, key: bytes | None = None) -> int:
        """Buffer one record; returns the chosen partition."""
        part = self._route(topic, key)
        seq = self._seq.get((topic, part), 0)
        self._seq[(topic, part)] = seq + 1
        self._batch.append((topic, part, key, value, seq))
        return part

    def flush(self) -> int:
        """Append the buffered batch; returns records actually appended
        (idempotent duplicates excluded). The buffer is kept until
        ``ack_flush`` so a lost delivery report can re-``flush`` safely."""
        appended = 0
        for topic, part, key, value, seq in self._batch:
            if self._idempotent:
                k = (self._pid, topic, part)
                last = self._b._producer_seq.get(k, -1)
                if seq <= last:
                    continue  # duplicate of an already-appended record
                self._b._producer_seq[k] = seq
            self._b._append(topic, part, key, value, self._txn)
            appended += 1
        return appended

    def ack_flush(self) -> None:
        """Delivery reports arrived: drop the buffered batch."""
        self._batch.clear()

    def commit_txn(self) -> None:
        if self._txn is None:
            raise KafkaError("producer is not transactional")
        if self._b._txn_state.get(self._txn) != "open":
            raise KafkaError(f"transaction {self._txn!r} is not open")
        self._b._txn_state[self._txn] = "committed"

    def abort_txn(self) -> None:
        if self._txn is None:
            raise KafkaError("producer is not transactional")
        if self._b._txn_state.get(self._txn) != "open":
            raise KafkaError(f"transaction {self._txn!r} is not open")
        self._b._txn_state[self._txn] = "aborted"


class Consumer:
    """``poll`` → deliver → ``store_offsets`` → ``commit``, the
    store-offset-after-delivery discipline. Standalone mode
    (``group_id=None``) always starts at the beginning and refuses to
    commit (``kafka.go:288-293``)."""

    def __init__(
        self,
        broker: LogBroker,
        topic: str,
        group_id: str | None = None,
        *,
        isolation: str = "read_committed",
        auto_offset_reset: str = "earliest",
        max_records: int = 0,
    ) -> None:
        if isolation not in ("read_committed", "read_uncommitted"):
            raise KafkaError(f"unknown isolation {isolation!r}")
        if auto_offset_reset not in ("earliest", "latest"):
            raise KafkaError(f"unknown auto_offset_reset {auto_offset_reset!r}")
        broker._require(topic)
        self._b = broker
        self._topic = topic
        self._group = group_id
        self._isolation = isolation
        self._max_records = max_records
        self._read = 0
        self._pos: dict[int, int] = {}
        self._stored: dict[int, int] = {}
        ends = broker.end_offsets(topic)
        for p in range(broker.partitions(topic)):
            if group_id is None:
                self._pos[p] = 0  # full replay, every run
            else:
                committed = broker.committed(group_id, topic, p)
                if committed is not None:
                    self._pos[p] = committed
                else:
                    self._pos[p] = 0 if auto_offset_reset == "earliest" else ends[p]

    def poll(self, max_records: int = 100) -> list[dict]:
        """Up to ``max_records`` records across partitions (round-robin),
        as kafka-shaped dicts. Advances the in-memory position only — the
        group offset moves on ``store_offsets`` + ``commit``."""
        out: list[dict] = []
        budget = max_records
        if self._max_records:
            budget = min(budget, self._max_records - self._read)
        for p in sorted(self._pos):
            if budget <= 0:
                break
            recs = self._b.fetch(self._topic, p, self._pos[p], budget, self._isolation)
            for rec in recs:
                out.append(
                    {
                        "key": rec.key,
                        "value": rec.value,
                        "topic": self._topic,
                        "partition": p,
                        "offset": rec.offset,
                        "timestamp": rec.timestamp,
                    }
                )
            if recs:
                self._pos[p] = recs[-1].offset + 1
                budget -= len(recs)
        self._read += len(out)
        return out

    def store_offsets(self) -> None:
        """Mark everything polled so far as delivered (StoreMessage after
        SendData, ``kafka.go:288-293``)."""
        if self._group is None:
            raise KafkaError("standalone consumers never store offsets")
        self._stored.update(self._pos)

    def commit(self) -> None:
        """Persist stored offsets to the broker (the auto-commit of STORED
        offsets). Positions polled but not stored are NOT committed."""
        if self._group is None:
            raise KafkaError("standalone consumers never commit")
        for p, off in self._stored.items():
            self._b._group_offsets[(self._group, self._topic, p)] = off


# -- Spark bridge --------------------------------------------------------

KAFKA_DF_SCHEMA_FIELDS = (
    ("key", "binary"),
    ("value", "binary"),
    ("topic", "string"),
    ("partition", "int"),
    ("offset", "long"),
    ("timestamp", "long"),
)


def topic_to_dataframe(
    spark,
    broker: LogBroker,
    topic: str,
    *,
    isolation: str = "read_committed",
    group_id: str | None = None,
):
    """Snapshot a topic into the kafka-shaped DataFrame
    ``parse_changelog_json`` consumes. Test-double bridge: the rows pass
    through the driver (fine for the double's metadata-scale corpora);
    production reads use ``stream_kafka_changelog``."""
    from pyspark.sql import types as T

    consumer = Consumer(broker, topic, group_id, isolation=isolation)
    rows = consumer.poll(max_records=sum(broker.end_offsets(topic)) + 1)
    schema = T.StructType(
        [
            T.StructField("key", T.BinaryType(), True),
            T.StructField("value", T.BinaryType(), True),
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("timestamp", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(
        [
            (r["key"], r["value"], r["topic"], r["partition"], r["offset"], r["timestamp"])
            for r in rows
        ],
        schema,
    )
