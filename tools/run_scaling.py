"""Scaling-evidence orchestrator: alternate local[4N] / local[N] runs of
the identical CDC replay on the same pre-generated input IN ONE PROCESS
(SparkContext stop + re-create switches master; the JVM and its JIT state
persist, and paired runs land seconds apart — the sandbox host's
throughput drifts several-fold over minutes, so tight pairing + medians
are required to measure the engine, not the neighbor).

Default pair 4 vs 16, not 8 vs 32: the 32 vCPUs are SMT-limited to ~18-19
effective cores (measured: 8→32 threads gives 2.1x raw CPU throughput,
4→16 gives 4.1x), so 8-vs-32 measures the hypervisor. BASELINE.json's rule
says "N and 4N"; both levels must fit the machine's real core budget.

efficiency = (rate_4N / rate_N) / 4, reported as median and best-pair.

Usage: python tools/run_scaling.py [--events 10000000] [--rounds 3] [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def fresh_session(cores: int, tmpfs: bool):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(1)
    from caterpillar_spark.session import get_spark

    extra = {}
    if tmpfs:
        extra["spark.local.dir"] = "/dev/shm/caterpillar_scaling/spark_local"
    return get_spark(
        "scaling-bench", cores=cores, shuffle_partitions=cores, extra_conf=extra
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--no-tmpfs", dest="tmpfs", action="store_false")
    args = ap.parse_args()
    pair = (args.n, 4 * args.n)

    os.chdir("/root/repo")
    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)
    import bench

    if args.tmpfs:
        bench.TABLE_BASE = "/dev/shm/caterpillar_scaling"

    # warm-up at 4N (JIT + page cache + generator cache), discarded
    spark = fresh_session(pair[1], args.tmpfs)
    bench.run_cdc_bench(spark, args.events, args.chunks)

    rates: dict[int, list[float]] = {pair[0]: [], pair[1]: []}
    secs: dict[int, list[float]] = {pair[0]: [], pair[1]: []}
    pair_effs: list[float] = []
    for r in range(args.rounds):
        round_rate = {}
        # alternate order each round: host throughput drifts monotonically
        # over minutes, so a fixed order biases every pair the same way
        order = (pair[1], pair[0]) if r % 2 == 0 else (pair[0], pair[1])
        for cores in order:
            spark = fresh_session(cores, args.tmpfs)
            res = bench.run_cdc_bench(spark, args.events, args.chunks)
            rates[cores].append(res["events_per_sec"])
            secs[cores].append(res["seconds"])
            round_rate[cores] = res["events_per_sec"]
            print(
                f"round {r} local[{cores}]: {res['seconds']}s "
                f"{res['events_per_sec']:.0f} ev/s",
                flush=True,
            )
        pair_effs.append((round_rate[pair[1]] / round_rate[pair[0]]) / 4)

    lo, hi = pair
    med_lo, med_hi = statistics.median(rates[lo]), statistics.median(rates[hi])
    summary = {
        "events": args.events,
        "chunks": args.chunks,
        "rounds": args.rounds,
        "cores_n": lo,
        "cores_4n": hi,
        "rate_n_median": round(med_lo, 1),
        "rate_4n_median": round(med_hi, 1),
        "efficiency_median_of_pairs": round(statistics.median(pair_effs), 3),
        "efficiency_best_pair": round(max(pair_effs), 3),
        "pair_efficiencies": [round(e, 3) for e in pair_effs],
        "all_rates": {k: [round(x, 1) for x in v] for k, v in rates.items()},
        "all_seconds": secs,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_runs.json", "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
