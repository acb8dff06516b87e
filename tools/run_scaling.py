"""Scaling-evidence orchestrator: the identical CDC replay at N and 4N
CPUs on the same pre-generated input, efficiency = (rate_4N / rate_N) / 4.

Methodology (every point below was forced by a measurement, see
BENCH/BASELINE.md):

- **CPU affinity, not just local[N]** — each run is a subprocess whose
  whole tree (incl. the JVM) is pinned to exactly N CPUs
  (``os.sched_setaffinity`` in tools/scaling.py before JVM launch).
  local[N] alone only bounds executor task threads; GC/JIT/Netty/kernel
  spill onto all 32 vCPUs and make the small level ~2x too fast.
- **N=4 vs 4N=16, not 8 vs 32** — the 32 vCPUs are SMT-limited to ~18-19
  effective cores (8→32 burn threads: 2.1x; 4→16: 4.1x). Both levels must
  sit inside the machine's real core budget or the test measures SMT.
- **Interleaved pairs, alternating order, medians** — host throughput
  drifts several-fold over minutes; per-pair efficiency + median over
  pairs cancels drift to first order.
- **tmpfs data dirs** — table+shuffle on /dev/shm removes the single
  shared disk (a real cluster has per-executor disks; this sandbox's one
  vda device would serialize all levels equally).

Usage: python tools/run_scaling.py [--events 10000000] [--rounds 4] [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def _burn(n: int) -> float:
    import numpy as np

    a = np.random.default_rng(0).random((256, 256))
    t0 = time.perf_counter()
    for _ in range(n):
        a = a @ a
        a /= np.abs(a).max() + 1.0
    return time.perf_counter() - t0


def host_probe(n_procs: int = 8, reps: int = 60) -> float:
    """Aggregate host compute capacity RIGHT NOW (matmuls/sec across
    n_procs processes, fixed work so runtime is bounded even when
    throttled). The hypervisor caps this VM's total throughput under
    sustained load — measured 4x collapses mid-record — and a throttled
    round measures the cap, not the engine's scaling. Probing
    independently BEFORE each round lets the record keep every sample and
    still report efficiency over rounds where the host was actually
    delivering its capacity. ~1-4s per probe."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(n_procs) as pool:
        pool.map(_burn, [2] * n_procs)  # spawn + import warm-up, untimed
        best = 0.0
        for _ in range(3):  # best-of-3 damps probe-side noise
            t0 = time.perf_counter()
            pool.map(_burn, [reps] * n_procs)
            best = max(best, n_procs * reps / (time.perf_counter() - t0))
        return best


def one_run(cores: int, events: int, chunks: int, tmpfs: bool) -> dict:
    cmd = [
        sys.executable,
        "/root/repo/tools/scaling.py",
        "--cores",
        str(cores),
        "--events",
        str(events),
        "--chunks",
        str(chunks),
        "--runs",
        "1",
    ]
    if tmpfs:
        cmd.append("--tmpfs")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"run failed: {out.stderr[-500:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=4)
    # N=2 vs 4N=8: the only pair where both levels sit inside this VM's
    # linear memory-bandwidth region (parallel-memcpy aggregate: 2→61,
    # 8→220, 16→142 GB/s — bandwidth DEGRADES past 8 threads), so 2v8
    # measures the engine rather than the host's memory subsystem
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--no-tmpfs", dest="tmpfs", action="store_false")
    # the hypervisor throttles under sustained load (every record's FIRST
    # pair measures best); a cooldown between rounds lets the host budget
    # recover so more rounds land in the healthy window
    ap.add_argument("--cooldown", type=int, default=120)
    # rounds whose pre-round host probe is below this fraction of the
    # record's best probe are kept in the raw record but excluded from the
    # healthy-window efficiency (a capped host flattens BOTH levels to the
    # same ceiling — those rounds measure the hypervisor, not the engine)
    ap.add_argument("--healthy-frac", type=float, default=0.7)
    args = ap.parse_args()
    pair = (args.n, 4 * args.n)

    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)

    # kill orphaned JVMs from interrupted earlier runs — a leftover
    # SparkSubmit chewing CPU was the main source of "host drift" in early
    # measurements
    subprocess.run(["pkill", "-9", "-f", "SparkSubmit"], capture_output=True)
    time.sleep(2)

    # warm-up (JIT profile data is per-process, but page cache + generator
    # cache persist), discarded
    one_run(pair[1], args.events, args.chunks, args.tmpfs)

    rates: dict[int, list[float]] = {pair[0]: [], pair[1]: []}
    secs: dict[int, list[float]] = {pair[0]: [], pair[1]: []}
    pair_effs: list[float] = []
    ceiling_effs: list[float] = []  # platform scan efficiency per round
    probes: list[list[float]] = []  # [before, after] per round
    for r in range(args.rounds):
        p_before = round(host_probe(), 1)
        print(f"round {r} host_probe(before)={p_before:.0f} matmul/s", flush=True)
        order = (pair[1], pair[0]) if r % 2 == 0 else (pair[0], pair[1])
        round_rate = {}
        round_ceiling = {}
        for cores in order:
            res = one_run(cores, args.events, args.chunks, args.tmpfs)
            rates[cores].append(res["events_per_sec"])
            secs[cores].append(res["seconds"])
            round_rate[cores] = res["events_per_sec"]
            round_ceiling[cores] = res.get("ceiling_scan_sec")
            print(
                f"round {r} cpus={cores}: {res['seconds']}s "
                f"{res['events_per_sec']:.0f} ev/s "
                f"ceiling_scan={res.get('ceiling_scan_sec')}s "
                f"ceiling_agg={res.get('ceiling_agg_sec')}s",
                flush=True,
            )
        # one entry PER ROUND (None when a child run lacked the ceiling
        # numbers) so the engine-vs-ceiling division below never pairs
        # round i's engine efficiency with round j's ceiling
        ceiling_effs.append(
            (round_ceiling[pair[0]] / round_ceiling[pair[1]]) / 4
            if all(round_ceiling.get(c) for c in pair)
            else None
        )
        p_after = round(host_probe(), 1)
        print(f"round {r} host_probe(after)={p_after:.0f} matmul/s", flush=True)
        probes.append([p_before, p_after])
        pair_effs.append((round_rate[pair[1]] / round_rate[pair[0]]) / 4)
        if args.cooldown and r < args.rounds - 1:
            time.sleep(args.cooldown)

    lo, hi = pair
    best_probe = max(max(p) for p in probes)
    # healthy = the host delivered capacity through the WHOLE round
    # (throttling can set in mid-round, so both endpoints must pass)
    healthy = [
        i
        for i in range(args.rounds)
        if min(probes[i]) >= args.healthy_frac * best_probe
    ]
    healthy_effs = [pair_effs[i] for i in healthy]
    summary = {
        "events": args.events,
        "chunks": args.chunks,
        "rounds": args.rounds,
        "cores_n": lo,
        "cores_4n": hi,
        "rate_n_median": round(statistics.median(rates[lo]), 1),
        "rate_4n_median": round(statistics.median(rates[hi]), 1),
        "efficiency_median_of_pairs": round(statistics.median(pair_effs), 3),
        "efficiency_best_pair": round(max(pair_effs), 3),
        "pair_efficiencies": [round(e, 3) for e in pair_effs],
        "host_probes": probes,
        "healthy_frac": args.healthy_frac,
        "healthy_rounds": healthy,
        "efficiency_median_healthy": (
            round(statistics.median(healthy_effs), 3) if healthy_effs else None
        ),
        # platform scan ceiling measured per round in the same pinned JVMs
        # on the same input: the box's own 2v8 efficiency for scan-shaped
        # work bounds anything a scan-dominated job can achieve
        "ceiling_scan_efficiencies": [
            (round(e, 3) if e is not None else None) for e in ceiling_effs
        ],
        "ceiling_scan_median": (
            round(statistics.median([e for e in ceiling_effs if e]), 3)
            if any(ceiling_effs)
            else None
        ),
        "efficiency_vs_ceiling_median": (
            round(
                statistics.median(
                    [e / c for e, c in zip(pair_effs, ceiling_effs) if c]
                ),
                3,
            )
            if any(ceiling_effs)
            else None
        ),
        "all_rates": {k: [round(x, 1) for x in v] for k, v in rates.items()},
        "all_seconds": secs,
        "affinity_pinned": True,
        "cooldown": args.cooldown,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_runs.json", "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
