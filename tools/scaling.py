"""Single scaling-bench run: CDC replay at a given parallelism.

The sandbox has no multi-node cluster, so the north rule's two-cluster-size
criterion is evidenced by running the IDENTICAL job at two local
parallelism levels (local[8] vs local[32]) on the same pre-generated input
(BASELINE.md "Sandbox scaling evidence"). One process per level — a JVM
can't change master after start.

Usage: python tools/scaling.py --cores 8 --events 20000000 --chunks 2 --runs 2
Prints one JSON line per run; the last line is the warm (steady-state) run.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from caterpillar_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--tmpfs",
        action="store_true",
        help="put table + shuffle dirs on /dev/shm: removes the single-"
        "shared-disk sandbox artifact so the measurement isolates compute "
        "scaling (a real cluster has per-executor local disks)",
    )
    args = ap.parse_args()

    import os

    # Bind the WHOLE process tree (incl. the child JVM: it inherits the
    # affinity mask) to exactly N CPUs. local[N] alone only limits executor
    # task threads — GC, JIT, Netty and kernel I/O would still spill onto
    # all 32 vCPUs, making the small "cluster" unrealistically fast and the
    # scaling measurement meaningless.
    os.sched_setaffinity(0, set(range(args.cores)))
    os.chdir("/root/repo")
    extra = {}
    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_CACHE"] = "/tmp/caterpillar_bench"
        extra["spark.local.dir"] = "/dev/shm/caterpillar_scaling/spark_local"
    from bench import run_cdc_bench

    # shuffle partitions are sized to DATA (~600k rows ≈ 150MB per task),
    # identical at both parallelism levels — on a real cluster partition
    # count follows data size, not executor count; cores-sized partitions
    # made 20M-row batches spill (640MB/task)
    batch_rows = args.events // args.chunks
    shuffle_parts = max(16, batch_rows // 600_000)
    spark = get_spark(
        "scaling-bench",
        cores=args.cores,
        shuffle_partitions=shuffle_parts,
        extra_conf=extra,
    )
    import bench

    if args.tmpfs:
        bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"

    # JIT warm-up: the merge path drops ~4x over the first few replays in a
    # fresh JVM (C2 compilation); measuring before that measures the JIT.
    # Two small replays compile the hot paths; they are not timed.
    warm_events = max(1_000_000, args.events // 5)
    for _ in range(2):
        bench.run_cdc_bench(spark, warm_events, 2)

    # platform ceiling, same JVM/pinning/input: what does RAW pyspark give
    # this core count for scan-shaped and LWW-agg-shaped work? The engine's
    # replay is scan-dominated, so its cross-level efficiency can never
    # beat the box's own scan efficiency — recording both per run lets the
    # record separate engine-attributable loss from platform loss.
    import time

    from pyspark.sql import functions as F

    chunk_paths = bench.cdc_events_dir(spark, args.events, args.chunks)
    base = chunk_paths[0].rsplit("/", 1)[0]
    df = spark.read.parquet(f"{base}/chunk-*")
    df.count()  # warm
    t_scan = t_agg = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.select(F.sum(F.length("text")), F.max("lsn")).collect()
        t_scan = min(t_scan, time.time() - t0)
        t0 = time.time()
        df.groupBy("conv_id", "turn_idx").agg(
            F.max_by("text", F.col("lsn")), F.max("lsn")
        ).select(F.count("*")).collect()
        t_agg = min(t_agg, time.time() - t0)

    for i in range(args.runs):
        res = run_cdc_bench(spark, args.events, args.chunks)
        res["cores"] = args.cores
        res["run"] = i
        res["ceiling_scan_sec"] = round(t_scan, 2)
        res["ceiling_agg_sec"] = round(t_agg, 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
