"""A/B: does shuffle-partition count explain the large-level efficiency
loss? 16 partitions on 8 cores = exactly 2 waves — one straggler gates
the stage; more, smaller partitions smooth packing. Interleaved A/B/A/B
in one pinned warm JVM (spark.sql.shuffle.partitions is a runtime conf).

Usage: python tools/shuffle_ab.py [--cores 8] [--events 10000000]
       [--parts 16 48]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--parts", type=int, nargs="+", default=[16, 48])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import os

    os.sched_setaffinity(0, set(range(args.cores)))
    os.chdir("/root/repo")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
    os.environ["SPARK_GRAFT_BENCH_CACHE"] = "/tmp/caterpillar_bench"

    from caterpillar_spark.session import get_spark

    spark = get_spark(
        "shuffle-ab",
        cores=args.cores,
        shuffle_partitions=args.parts[0],
        extra_conf={
            "spark.local.dir": "/dev/shm/caterpillar_scaling/spark_local"
        },
    )
    import bench

    bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"
    for _ in range(4):
        r = bench.run_cdc_bench(spark, max(1_000_000, args.events // 5), 2)
    results: dict[int, list[float]] = {p: [] for p in args.parts}
    for rep in range(args.reps):
        for p in args.parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            res = bench.run_cdc_bench(spark, args.events, args.chunks)
            results[p].append(res["events_per_sec"])
            print(f"rep {rep} parts={p}: {res['seconds']}s "
                  f"{res['events_per_sec']:.0f} ev/s", flush=True)
    print(json.dumps({str(p): v for p, v in results.items()}))


if __name__ == "__main__":
    main()
