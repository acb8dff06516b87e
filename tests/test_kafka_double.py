"""Kafka broker-double semantics — the contract rows modeled from
``task/kafka/kafka.go`` (standalone never-commit, store-after-delivery,
max_records, idempotent producer, transactions + read_committed LSO)."""

from __future__ import annotations

import json

import pytest

from caterpillar_spark.sources.kafka_double import (
    Consumer,
    KafkaError,
    LogBroker,
    Producer,
    topic_to_dataframe,
)


def _fill(broker: LogBroker, topic: str, n: int, *, keyed: bool = True) -> None:
    p = broker.producer()
    for i in range(n):
        key = f"k{i % 4}".encode() if keyed else None
        p.send(topic, f"v{i}".encode(), key=key)
    p.flush()
    p.ack_flush()


def test_keyed_produce_keeps_key_ordered_within_partition():
    b = LogBroker()
    b.create_topic("t", partitions=3)
    _fill(b, "t", 40, keyed=True)
    c = Consumer(b, "t", group_id=None)
    recs = c.poll(max_records=100)
    assert len(recs) == 40
    # one key never straddles partitions, and its values arrive in send order
    by_key: dict[bytes, list] = {}
    for r in recs:
        by_key.setdefault(r["key"], []).append(r)
    for key, rows in by_key.items():
        assert len({r["partition"] for r in rows}) == 1
        vals = [int(r["value"][1:]) for r in rows]
        assert vals == sorted(vals)


def test_keyless_produce_round_robins_all_partitions():
    b = LogBroker()
    b.create_topic("t", partitions=3)
    _fill(b, "t", 30, keyed=False)
    assert all(n > 0 for n in b.end_offsets("t"))


def test_standalone_full_replay_and_never_commits():
    b = LogBroker()
    b.create_topic("t", partitions=2)
    _fill(b, "t", 10)
    c1 = Consumer(b, "t", group_id=None)
    assert len(c1.poll(max_records=100)) == 10
    with pytest.raises(KafkaError, match="standalone"):
        c1.store_offsets()
    with pytest.raises(KafkaError, match="standalone"):
        c1.commit()
    # a second standalone run replays everything from the beginning
    c2 = Consumer(b, "t", group_id=None)
    assert len(c2.poll(max_records=100)) == 10


def test_group_store_after_delivery_crash_redelivers():
    b = LogBroker()
    b.create_topic("t", partitions=2)
    _fill(b, "t", 8)
    # poll but "crash" before store+commit -> nothing persisted
    c1 = Consumer(b, "t", group_id="g")
    assert len(c1.poll(max_records=100)) == 8
    del c1
    c2 = Consumer(b, "t", group_id="g")
    assert len(c2.poll(max_records=100)) == 8  # full redelivery
    c2.store_offsets()
    c2.commit()
    # after commit the group resumes past everything
    _fill(b, "t", 3)
    c3 = Consumer(b, "t", group_id="g")
    assert len(c3.poll(max_records=100)) == 3


def test_poll_without_store_does_not_commit():
    b = LogBroker()
    b.create_topic("t", partitions=1)
    _fill(b, "t", 5)
    c = Consumer(b, "t", group_id="g")
    c.poll(max_records=2)
    c.store_offsets()  # stores position after 2
    c.poll(max_records=100)  # 3 more delivered but NOT stored
    c.commit()
    c2 = Consumer(b, "t", group_id="g")
    assert len(c2.poll(max_records=100)) == 3  # the unstored tail redelivers


def test_auto_offset_reset_latest_skips_history():
    b = LogBroker()
    b.create_topic("t", partitions=2)
    _fill(b, "t", 6)
    c = Consumer(b, "t", group_id="g2", auto_offset_reset="latest")
    assert c.poll(max_records=100) == []
    _fill(b, "t", 4)
    assert len(c.poll(max_records=100)) == 4


def test_max_records_read_bound():
    b = LogBroker()
    b.create_topic("t", partitions=1)
    _fill(b, "t", 10)
    c = Consumer(b, "t", group_id=None, max_records=4)
    assert len(c.poll(max_records=3)) == 3
    assert len(c.poll(max_records=100)) == 1  # bound hit
    assert c.poll(max_records=100) == []


def test_idempotent_producer_retry_appends_nothing():
    b = LogBroker()
    b.create_topic("t", partitions=2)
    p = b.producer(idempotent=True)
    for i in range(6):
        p.send("t", f"v{i}".encode(), key=b"k")
    assert p.flush() == 6
    # delivery report lost -> retry the same batch
    assert p.flush() == 0
    p.ack_flush()
    assert sum(b.end_offsets("t")) == 6
    # a NON-idempotent producer retrying the same batch duplicates
    b2 = LogBroker()
    b2.create_topic("t", partitions=1)
    p2 = b2.producer()
    p2.send("t", b"v", key=b"k")
    p2.flush()
    p2.flush()
    assert sum(b2.end_offsets("t")) == 2


def test_transaction_commit_abort_visibility():
    b = LogBroker()
    b.create_topic("t", partitions=1)
    pc = b.producer(transactional_id="tx-commit")
    pc.send("t", b"committed")
    pc.flush()
    pa = b.producer(transactional_id="tx-abort")
    pa.send("t", b"aborted")
    pa.flush()
    pc.commit_txn()
    pa.abort_txn()
    committed = [r["value"] for r in Consumer(b, "t").poll(max_records=10)]
    assert committed == [b"committed"]  # aborted filtered forever
    everything = [
        r["value"]
        for r in Consumer(b, "t", isolation="read_uncommitted").poll(max_records=10)
    ]
    assert everything == [b"committed", b"aborted"]


def test_read_committed_stops_at_open_transaction_lso():
    b = LogBroker()
    b.create_topic("t", partitions=1)
    popen = b.producer(transactional_id="tx-open")
    popen.send("t", b"open")
    popen.flush()
    # a later NON-transactional record sits past the open txn
    _fill(b, "t", 1)
    assert Consumer(b, "t").poll(max_records=10) == []  # LSO blocks both
    popen.commit_txn()
    vals = [r["value"] for r in Consumer(b, "t").poll(max_records=10)]
    assert vals == [b"open", b"v0"]


def test_transactional_id_reuse_gets_fresh_epoch():
    b = LogBroker()
    b.create_topic("t", partitions=1)
    p1 = b.producer(transactional_id="tx")
    p1.send("t", b"first")
    p1.flush()
    p1.commit_txn()
    # reusing the id must NOT reopen (and so hide) the committed session
    p2 = b.producer(transactional_id="tx")
    p2.send("t", b"second")
    p2.flush()
    vals = [r["value"] for r in Consumer(b, "t").poll(max_records=10)]
    assert vals == [b"first"]  # second still open
    p2.commit_txn()
    vals = [r["value"] for r in Consumer(b, "t").poll(max_records=10)]
    assert vals == [b"first", b"second"]
    # double-open of the same id while one session is open is an error
    p3 = b.producer(transactional_id="tx2")
    with pytest.raises(KafkaError, match="already open"):
        Producer(b, 99, True, "tx2")
    del p3


def test_validation_errors():
    b = LogBroker()
    with pytest.raises(KafkaError):
        b.partitions("missing")
    b.create_topic("t", partitions=1)
    with pytest.raises(KafkaError):
        Consumer(b, "t", isolation="weird")
    with pytest.raises(KafkaError):
        Consumer(b, "t", auto_offset_reset="middle")
    with pytest.raises(KafkaError):
        b.create_topic("bad", partitions=0)
    p = b.producer()
    with pytest.raises(KafkaError, match="not transactional"):
        p.commit_txn()


def test_topic_to_dataframe_bridge_spark(spark):
    from caterpillar_spark.sources.kafka import parse_changelog_json

    b = LogBroker()
    b.create_topic("changelog", partitions=2)
    p = b.producer(transactional_id="cdc")
    for i in range(6):
        evt = {
            "conv_id": f"c{i % 2}",
            "turn_idx": i,
            "lsn": 100 + i,
            "op": "upsert",
            "text": f"msg {i}",
        }
        p.send("changelog", json.dumps(evt).encode(), key=evt["conv_id"].encode())
    p.flush()
    # open transaction: the bridge (read_committed) must see nothing
    assert topic_to_dataframe(spark, b, "changelog").count() == 0
    p.commit_txn()
    df = topic_to_dataframe(spark, b, "changelog")
    assert df.count() == 6
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
    ]
    parsed = parse_changelog_json(df)
    rows = {(r.conv_id, r.turn_idx): r for r in parsed.collect()}
    assert len(rows) == 6
    assert rows[("c1", 5)].lsn == 105
    # broker partition id backfills source_partition lineage
    assert all(r.source_partition is not None for r in rows.values())
