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

    os.chdir("/root/repo")
    extra = {}
    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_CACHE"] = "/tmp/caterpillar_bench"
        extra["spark.local.dir"] = "/dev/shm/caterpillar_scaling/spark_local"
    from bench import run_cdc_bench

    spark = get_spark(
        "scaling-bench",
        cores=args.cores,
        shuffle_partitions=args.cores,
        extra_conf=extra,
    )
    if args.tmpfs:
        import bench

        bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"
    for i in range(args.runs):
        res = run_cdc_bench(spark, args.events, args.chunks)
        res["cores"] = args.cores
        res["run"] = i
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
