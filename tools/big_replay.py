"""10^8-event pinned replay record (VERDICT r2 next-round #7): measure —
not assert — that the driver-serial merge phases amortize at large
batches. Captures the per-batch plan/write/stats breakdown the sink
emits under SPARK_GRAFT_MERGE_TIMING and reports the serial share
(everything outside the distributed write job) of replay wall time.

Usage: python tools/big_replay.py [--events 100000000] [--chunks 4]
       [--cores 16]
Appends one JSON record to BENCH/big_replay.json.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


class _Tee(io.TextIOBase):
    """Capture [merge-timing] lines while passing everything through."""

    def __init__(self, real):
        self.real = real
        self.captured: list[str] = []

    def write(self, s):
        if "[merge-timing]" in s:
            self.captured.append(s)
        return self.real.write(s)

    def flush(self):
        self.real.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--no-tmpfs", dest="tmpfs", action="store_false")
    args = ap.parse_args()

    os.sched_setaffinity(0, set(range(args.cores)))
    os.chdir("/root/repo")
    os.environ["SPARK_GRAFT_MERGE_TIMING"] = "1"

    from caterpillar_spark.session import get_spark

    extra = {}
    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/caterpillar_scaling/spark_local"
    batch_rows = args.events // args.chunks
    shuffle_parts = max(16, batch_rows // 600_000)
    spark = get_spark(
        "big-replay", cores=args.cores, shuffle_partitions=shuffle_parts,
        extra_conf=extra,
    )
    import bench

    if args.tmpfs:
        bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"

    # C2 warm-up (untimed) then input generation (cached, untimed)
    for _ in range(3):
        bench.run_cdc_bench(spark, 2_000_000, 2)
    t_gen0 = time.time()
    bench.cdc_events_dir(spark, args.events, args.chunks)
    gen_sec = round(time.time() - t_gen0, 1)

    tee = _Tee(sys.stderr)
    with contextlib.redirect_stderr(tee):
        res = bench.run_cdc_bench(spark, args.events, args.chunks)

    phases = []
    for line in tee.captured:
        m = re.search(
            r"b(\d+) plan=([\d.]+)s write=([\d.]+)s stats=([\d.]+)s", line
        )
        if m:
            phases.append(
                {
                    "batch": int(m.group(1)),
                    "plan_sec": float(m.group(2)),
                    "write_sec": float(m.group(3)),
                    "stats_sec": float(m.group(4)),
                }
            )
    serial = sum(p["plan_sec"] + p["stats_sec"] for p in phases)
    record = {
        "events": args.events,
        "chunks": args.chunks,
        "cores": args.cores,
        "pinned": True,
        "tmpfs": args.tmpfs,
        "seconds": res["seconds"],
        "events_per_sec": res["events_per_sec"],
        "final_rows": res["final_rows"],
        "gen_seconds_untimed": gen_sec,
        "merge_phases": phases,
        "serial_sec_total": round(serial, 2),
        "serial_share": round(serial / res["seconds"], 4),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(record))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/big_replay.json", "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
