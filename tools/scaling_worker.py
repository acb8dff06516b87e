"""Persistent pinned replay worker for the scaling harness.

One worker = one JVM pinned to a DISJOINT core range, kept alive for the
whole scaling record. run_scaling.py drives it over stdin:

    run   -> one timed CDC replay         -> {"kind": "run", ...}
    ceil  -> one raw-pyspark scan+agg rep -> {"kind": "ceil", ...}
    quit  -> clean session stop

Why a persistent process instead of one subprocess per sample (the round-1
design): C2 compiles the merge path ~4x faster after a few replays, so a
fresh JVM per sample either pays ~30-60s of untimed warm-up replays per
sample or measures the JIT. Keeping the JVM warm makes every sample
steady-state AND makes samples cheap enough to run each level TWICE per
round — the interleaved same-level duplicate is the throttle canary
(VERDICT r2 what's-wrong #3: before/after host probes demonstrably miss
mid-round hypervisor throttling; two same-level replays that bracket the
other level's run in time cannot).

Disjoint pinning (``--cpu-offset``) keeps the idle worker's GC/Netty
threads off the measuring worker's cores.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--cpu-offset", type=int, default=0)
    ap.add_argument("--events", type=int, required=True)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--tmpfs", action="store_true")
    # generator skew shape (bench.cdc_events_dir reads these via env; the
    # skewed scaling record passes hot-frac 0.001 / hot-traffic 0.8)
    ap.add_argument("--hot-frac", type=float, default=None)
    ap.add_argument("--hot-traffic", type=float, default=None)
    args = ap.parse_args()

    import os
    import time

    if args.hot_frac is not None:
        os.environ["SPARK_GRAFT_BENCH_HOT_FRAC"] = str(args.hot_frac)
    if args.hot_traffic is not None:
        os.environ["SPARK_GRAFT_BENCH_HOT_TRAFFIC"] = str(args.hot_traffic)

    os.sched_setaffinity(
        0, set(range(args.cpu_offset, args.cpu_offset + args.cores))
    )
    os.chdir("/root/repo")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    extra = {
        # this worker gets SIGSTOPped for the whole duration of the other
        # level's replay (up to several minutes at large --events). Spark's
        # default 120s network timeout / heartbeat window expires during
        # the freeze and the resumed JVM kills itself — seen as a silent
        # worker death on the first 20M/1-chunk record. The pause is the
        # harness's design, so the timeouts must outlast it.
        "spark.network.timeout": "3600s",
        "spark.executor.heartbeatInterval": "600s",
    }
    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_CACHE"] = "/tmp/caterpillar_bench"
        extra["spark.local.dir"] = "/dev/shm/caterpillar_scaling/spark_local"

    from caterpillar_spark.session import get_spark

    # shuffle partitions sized to DATA, identical at both levels (see
    # tools/scaling.py for the measurement that forced this)
    batch_rows = args.events // args.chunks
    shuffle_parts = max(16, batch_rows // 600_000)
    spark = get_spark(
        f"scaling-worker-{args.cores}",
        cores=args.cores,
        shuffle_partitions=shuffle_parts,
        extra_conf=extra,
    )
    import bench

    if args.tmpfs:
        bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"

    # C2 warm-up: untimed small replays until the merge path stops speeding
    # up (fresh JVMs run it ~4x slow for the first few replays)
    warm_events = max(1_000_000, args.events // 5)
    last = None
    for _ in range(4):
        r = bench.run_cdc_bench(spark, warm_events, 2)
        if last is not None and r["seconds"] > 0.85 * last:
            break
        last = r["seconds"]

    from pyspark.sql import functions as F

    chunk_paths = bench.cdc_events_dir(spark, args.events, args.chunks)
    base = chunk_paths[0].rsplit("/", 1)[0]
    ceil_df = spark.read.parquet(f"{base}/chunk-*")
    ceil_df.count()  # warm the scan

    def one_ceiling() -> dict:
        # best-of-2: the first rep after an idle stretch can absorb page
        # cache / codegen re-warm and is not the platform's capacity
        t_scan = t_agg = float("inf")
        for _ in range(2):
            t0 = time.time()
            ceil_df.select(F.sum(F.length("text")), F.max("lsn")).collect()
            t_scan = min(t_scan, time.time() - t0)
            t0 = time.time()
            ceil_df.groupBy("conv_id", "turn_idx").agg(
                F.max_by("text", F.col("lsn")), F.max("lsn")
            ).select(F.count("*")).collect()
            t_agg = min(t_agg, time.time() - t0)
        return {
            "kind": "ceil",
            "cores": args.cores,
            "ceiling_scan_sec": round(t_scan, 3),
            "ceiling_agg_sec": round(t_agg, 3),
        }

    one_ceiling()  # codegen warm-up for the agg shape, untimed

    print(json.dumps({"kind": "ready", "cores": args.cores}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd == "run":
            res = bench.run_cdc_bench(spark, args.events, args.chunks)
            res["kind"] = "run"
            res["cores"] = args.cores
            print(json.dumps(res), flush=True)
        elif cmd == "ceil":
            print(json.dumps(one_ceiling()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
