"""A/B the auto CoW-vs-MoR crossover constant (``delta_threshold``) with
measurement instead of judgement (VERDICT r4 next-round #6).

Workload: an incremental replay — many small batches against a growing
table, the regime where the constant actually decides anything (a
table-sized batch always takes CoW's pre-reduced fast path; a tiny batch
against a huge table is where delta mode pays). Grid:

    delta_threshold in {1, 3, 10}  x  maintain_every in {off, 4}

Per config, a FRESH table replays the same pre-generated chunked
changelog; we record wall seconds, bytes written to the table's data dir
(immutable files => on-disk bytes == written bytes == write
amplification), delta-vs-CoW batch counts, and a timed full read at the
end (MoR backlogs pay at read time — the cost threshold trades against).

Each pass runs the 6 configs sequentially in one warmed JVM; set
DELTA_AB_PASSES>1 to repeat the grid (passes interleave configs across
time, so a host-drift window cannot be attributed to one config — take
per-config medians across passes). The DECISION metrics — bytes written
and delta-vs-CoW route counts — are deterministic byte/route counts that
host drift cannot perturb; only wall seconds are timing-sensitive. Run on
a quiet host (pkill SparkSubmit first). Appends one JSON line per run to
BENCH/delta_ab.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from caterpillar_spark.generator import GeneratorSpec, write_changelog_chunks  # noqa: E402
from caterpillar_spark.cdc import replay_chunks  # noqa: E402
from caterpillar_spark.session import get_spark  # noqa: E402
from caterpillar_spark.sinks.snapshot_table import SnapshotTable  # noqa: E402
from bench import PAYLOAD  # noqa: E402


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def run_config(spark, chunks, work, threshold, maintain_every) -> dict:
    from caterpillar_spark.cdc import segment_footer_stats

    tbl = SnapshotTable(spark, work, n_buckets=32).create(PAYLOAD)
    t0 = time.time()
    n_delta = n_cow = 0
    schema = spark.read.parquet(chunks[-1]).schema
    for i, path in enumerate(chunks):
        st = segment_footer_stats(path)
        events = spark.read.schema(schema).parquet(path)
        before_deltas = sum(len(v) for v in tbl.snapshot().deltas.values())
        tbl.merge(
            events.drop("source_partition"),
            batch_id=i,
            offset_range=(st[0], st[1]),
            mode="auto",
            delta_threshold=threshold,
        )
        after_deltas = sum(len(v) for v in tbl.snapshot().deltas.values())
        if after_deltas > before_deltas:
            n_delta += 1
        else:
            n_cow += 1
        if maintain_every and (i + 1) % maintain_every == 0:
            tbl.maintain()
    replay_s = time.time() - t0
    snap = tbl.snapshot()
    n_delta_files = sum(len(v) for v in snap.deltas.values())
    t1 = time.time()
    rows = tbl.read().count()
    read_s = time.time() - t1
    return {
        "threshold": threshold,
        "maintain_every": maintain_every,
        "replay_sec": round(replay_s, 2),
        "read_sec": round(read_s, 2),
        "rows": rows,
        "data_bytes": _dir_bytes(os.path.join(work, "data")),
        "delta_batches": n_delta,
        "cow_batches": n_cow,
        "delta_files_left": n_delta_files,
        "versions": tbl.current_version(),
    }


def main() -> None:
    n_events = int(os.environ.get("DELTA_AB_EVENTS", "3000000"))
    n_chunks = int(os.environ.get("DELTA_AB_CHUNKS", "30"))
    spark = get_spark("delta-ab", cores=16, shuffle_partitions=32)
    base = f"/tmp/delta_ab_{os.getpid()}"
    spec = GeneratorSpec(
        n_events=n_events,
        n_convs=max(1000, n_events // 100),
        turns_per_conv=10,
        seed=42,
        n_source_partitions=32,
    )
    chunks = write_changelog_chunks(spark, spec, f"{base}/log", n_chunks=n_chunks)
    # JVM/C2 warm-up on the merge path (fresh JVMs run it ~4x slow)
    warm = f"{base}/warm"
    replay_chunks(spark, chunks[:3], SnapshotTable(spark, warm, n_buckets=32).create(PAYLOAD))
    shutil.rmtree(warm, ignore_errors=True)

    grid = [
        (t, m) for m in (None, 4) for t in (1.0, 3.0, 10.0)
    ]
    passes = int(os.environ.get("DELTA_AB_PASSES", "1"))
    results = []
    for p in range(passes):
        for t, m in grid:
            work = f"{base}/p{p}_t{t}_m{m}"
            r = run_config(spark, chunks, work, t, m)
            shutil.rmtree(work, ignore_errors=True)
            r["pass"] = p
            results.append(r)
            print(json.dumps(r), flush=True)
    out = {
        "events": n_events,
        "chunks": n_chunks,
        "batch_rows": n_events // n_chunks,
        "passes": passes,
        "results": results,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/delta_ab.json", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
