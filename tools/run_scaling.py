"""Scaling-evidence orchestrator: the identical CDC replay at N and 4N
CPUs on the same pre-generated input, efficiency = (rate_4N / rate_N) / 4.

Methodology (every point below was forced by a measurement, see
BENCH/BASELINE.md):

- **CPU affinity, not just local[N]** — each level is a worker JVM whose
  whole tree is pinned to a DISJOINT range of exactly N CPUs
  (``os.sched_setaffinity`` in tools/scaling_worker.py before JVM launch).
  local[N] alone only bounds executor task threads; GC/JIT/Netty/kernel
  spill onto all 32 vCPUs and make the small level ~2x too fast.
- **N=2 vs 4N=8, not 8 vs 32** — the 32 vCPUs are SMT-limited to ~18-19
  effective cores and memory bandwidth DEGRADES past 8 threads
  (parallel-memcpy aggregate: 2→61, 8→220, 16→142 GB/s). Both levels must
  sit inside the machine's linear region or the test measures the host's
  memory subsystem.
- **Persistent warm workers, interleaved rounds, medians** — host
  throughput drifts several-fold over minutes; per-pair efficiency +
  median over pairs cancels drift to first order, and keeping each
  level's JVM alive for the whole record keeps every sample at C2
  steady state (a fresh JVM runs the merge path ~4x slow at first).
- **In-round throttle canary** — each round runs every level TWICE, the
  duplicates bracketing the other level's run in time
  (hi,lo,hi,lo). Hypervisor throttling that sets in mid-round makes the
  two same-level replays disagree; a round where either level's pair
  disagrees beyond --canary-ratio (default 1.1, measured calibration below) is canary-dirty and excluded from the gate metric.
  This closes the hole in the round-2 before/after host probes, which
  demonstrably missed throttling that hit between the probes (VERDICT
  r2 what's-wrong #3: a round with healthy probes 2925/2360 still
  collapsed to efficiency 0.337 mid-round).
- **tmpfs data dirs** — table+shuffle on /dev/shm removes the single
  shared disk (a real cluster has per-executor disks; this sandbox's one
  vda device would serialize all levels equally).

The gate metric is ``efficiency_median_gate`` — the median of pair
efficiencies over rounds that are canary-clean AND probe-healthy, where
probe-healthy means min(round probes) >= healthy_frac x the MEDIAN of
per-round max probes (robust reference, round 5 — a record's first probe
runs on an idle host and spikes, and normalizing to the single max
rejected loaded steady-state rounds wholesale; see tools/regate.py,
which recomputes old records under the same rule). The co-measured
raw-pyspark scan ceiling (same JVMs, same input, same windows) stays in
the record so engine-attributable loss remains separable from platform
loss.

Usage: python tools/run_scaling.py [--events 10000000] [--rounds 4] [--n 2]
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
    throttled). Kept alongside the in-round canary: the probe captures
    the host's state at the round boundaries, the canary captures changes
    WITHIN the round. ~1-4s per probe."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(n_procs) as pool:
        pool.map(_burn, [2] * n_procs)  # spawn + import warm-up, untimed
        best = 0.0
        for _ in range(3):  # best-of-3 damps probe-side noise
            t0 = time.perf_counter()
            pool.map(_burn, [reps] * n_procs)
            best = max(best, n_procs * reps / (time.perf_counter() - t0))
        return best


class Worker:
    """One persistent pinned replay JVM (tools/scaling_worker.py)."""

    def __init__(self, cores: int, cpu_offset: int, events: int,
                 chunks: int, tmpfs: bool,
                 skew: tuple[float, float] | None = None):
        self.cores = cores
        self._spawn_args = (cores, cpu_offset, events, chunks, tmpfs, skew)
        self._spawn()

    def _spawn(self) -> None:
        cores, cpu_offset, events, chunks, tmpfs, skew = self._spawn_args
        cmd = [
            sys.executable, "/root/repo/tools/scaling_worker.py",
            "--cores", str(cores), "--cpu-offset", str(cpu_offset),
            "--events", str(events), "--chunks", str(chunks),
        ]
        if tmpfs:
            cmd.append("--tmpfs")
        if skew is not None:
            cmd += ["--hot-frac", str(skew[0]),
                    "--hot-traffic", str(skew[1])]
        # stderr to a file, NOT devnull: a 20M/1-chunk record lost its
        # 4-core worker mid-round with zero diagnostics — the death cause
        # (JVM OOM vs host kill) must be readable afterwards
        if getattr(self, "_errlog", None) is not None:
            try:
                self._errlog.close()
            except Exception:
                pass
        self._errlog = open(f"/tmp/scaling_worker_{cores}.err", "ab")
        self.proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._errlog, text=True, bufsize=1,
            # own session => pause()/resume() can SIGSTOP the whole tree
            # (python + its JVM) without touching the orchestrator
            start_new_session=True,
        )

    def restart(self) -> None:
        """Replace a dead worker with a fresh one (re-warms, re-caches) —
        a mid-record JVM death costs one round, not the whole record."""
        try:
            self.proc.kill()
        except Exception:
            pass
        self._spawn()
        self.wait_ready()

    def _read(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker cores={self.cores} died")
            line = line.strip()
            if line.startswith("{") and '"kind"' in line:
                return json.loads(line)

    def wait_ready(self) -> None:
        msg = self._read()
        assert msg["kind"] == "ready", msg

    def cmd(self, what: str) -> dict:
        # a worker that died while SIGSTOPped surfaces here as a
        # BrokenPipeError on the write, not an EOF on the read — normalize
        # both to RuntimeError so the round loop's recovery path fires
        try:
            self.proc.stdin.write(what + "\n")
            self.proc.stdin.flush()
        except OSError as e:
            raise RuntimeError(
                f"worker cores={self.cores} died (stdin: {e})"
            ) from e
        return self._read()

    def pause(self) -> None:
        """SIGSTOP the whole worker tree while the OTHER level measures:
        an 'idle' 24g JVM still runs GC/safepoint/Netty housekeeping, and
        on this box memory bandwidth is the scaling limiter — a stopped
        process is the only true zero."""
        import signal

        try:
            os.killpg(os.getpgid(self.proc.pid), signal.SIGSTOP)
        except (OSError, ProcessLookupError):
            pass

    def resume(self) -> None:
        import signal

        try:
            os.killpg(os.getpgid(self.proc.pid), signal.SIGCONT)
        except (OSError, ProcessLookupError):
            pass

    def stop(self) -> None:
        self.resume()
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def _probe_reference(probes: list[list[float]]) -> float:
    """Robust probe-health reference: median of per-round max probes,
    floored at 0.6x the all-time max. The median resists the idle-host
    first-probe spike; the floor resists the opposite failure (a record
    throttled for most of its rounds, where the median would track the
    cap itself and admit exactly the depressed rounds the filter
    exists to exclude). Every stored record's median exceeds its floor,
    so regating is outcome-identical for existing data."""
    maxes = [max(p) for p in probes]
    return max(statistics.median(maxes), 0.6 * max(maxes))


def main() -> None:
    ap = argparse.ArgumentParser()
    # 10M events: 5M was tried first (VERDICT r2 suggested shorter
    # rounds) but at 2.5M-row batches the hi level's fixed per-batch
    # driver-serial cost eats ~5% efficiency STRUCTURALLY (a canary-clean
    # 5M round measured 0.748 where 10M rounds reach 0.80) — the canary,
    # not round length, is the throttle defence now
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--no-tmpfs", dest="tmpfs", action="store_false")
    # the hypervisor throttles under sustained load; a cooldown between
    # rounds lets the host budget recover so more rounds land clean
    ap.add_argument("--cooldown", type=int, default=120)
    # probe-based health (round boundaries) — kept for continuity with
    # round-2 records
    ap.add_argument("--healthy-frac", type=float, default=0.7)
    # in-round canary: same-level duplicate replays disagreeing more than
    # this ratio mark the round dirty. Measured calibration: in a stable
    # window the duplicates agree within 1.01; a round at 1.16/1.13
    # produced a junk 0.458 pair efficiency — so the gate wants TIGHT
    # agreement, not bench.py's 1.3 outlier guard
    ap.add_argument("--canary-ratio", type=float, default=1.1)
    # adaptive mode: keep running rounds (up to --max-rounds) until this
    # many canary-clean rounds accumulate — healthy host windows arrive
    # unpredictably between throttle phases, so a fixed round count either
    # wastes a healthy stretch or ends with zero clean rounds
    ap.add_argument("--target-clean", type=int, default=0)
    ap.add_argument("--max-rounds", type=int, default=12)
    # a dirty round means the host is mid-throttle: wait longer before
    # burning another round into the same window
    ap.add_argument("--dirty-cooldown", type=int, default=300)
    # pre-round ADMISSION gate (VERDICT r6 #2): record H burned
    # prospective 0.852/0.801 rounds against dirty canaries because they
    # STARTED inside throttle windows. Before each round, wait until the
    # host probe recovers to --admit-frac of the robust probe reference
    # (bounded by --admit-max-wait). Scoring is untouched — this only
    # moves when a round starts, never how it is judged.
    ap.add_argument("--admit-frac", type=float, default=0.85)
    ap.add_argument("--admit-poll", type=int, default=60)
    ap.add_argument("--admit-max-wait", type=int, default=900)
    # Zipf-hot record (VERDICT r4 #5): 0.1% of convs soak up 80% of the
    # update traffic — the skew-salting path's stress shape. Default
    # record keeps the generator's 1%/50% mild skew.
    ap.add_argument("--skew", action="store_true")
    args = ap.parse_args()
    lo, hi = args.n, 4 * args.n
    skew = (0.001, 0.8) if args.skew else None

    if args.tmpfs:
        os.makedirs("/dev/shm/caterpillar_scaling", exist_ok=True)

    # kill orphaned JVMs from interrupted earlier runs — a leftover
    # SparkSubmit chewing CPU was the main source of "host drift" in early
    # measurements
    # a stop file left over from ending a PREVIOUS record would silently
    # truncate this one to a single round after full spin-up
    if os.path.exists("/tmp/scaling_stop"):
        os.unlink("/tmp/scaling_stop")
    subprocess.run(["pkill", "-9", "-f", "SparkSubmit"], capture_output=True)
    time.sleep(2)

    # hi first (generates the shared input cache fastest), then lo;
    # disjoint core ranges: hi on [0, hi), lo on [hi, hi+lo)
    w = {}
    w[hi] = Worker(hi, 0, args.events, args.chunks, args.tmpfs, skew)
    w[hi].wait_ready()
    w[lo] = Worker(lo, hi, args.events, args.chunks, args.tmpfs, skew)
    w[lo].wait_ready()
    print(f"workers ready: cores={hi} (cpus 0-{hi-1}), "
          f"cores={lo} (cpus {hi}-{hi+lo-1})", flush=True)

    def measured(cores: int, what: str) -> dict:
        """Run a command on one worker with the other SIGSTOPped — the
        measuring level owns the memory subsystem, as it would on a real
        cluster node."""
        other = lo if cores == hi else hi
        w[other].pause()
        try:
            return w[cores].cmd(what)
        finally:
            w[other].resume()

    rates: dict[int, list[float]] = {lo: [], hi: []}
    secs: dict[int, list[float]] = {lo: [], hi: []}
    pair_effs: list[float] = []
    ceiling_effs: list[float] = []
    canary_ratios: list[dict] = []  # {"2": r, "8": r} per round
    probes: list[list[float]] = []
    n_rounds = args.max_rounds if args.target_clean else args.rounds
    n_clean = 0
    try:
        for r in range(n_rounds):
            p_before = round(host_probe(), 1)
            print(f"round {r} host_probe(before)={p_before:.0f}", flush=True)
            # admission: start rounds on health instead of only filtering
            # on it afterwards (gate-round yield, not gate math)
            if args.admit_frac > 0 and probes:
                ref = _probe_reference(probes)
                waited = 0
                while (
                    p_before < args.admit_frac * ref
                    and waited < args.admit_max_wait
                ):
                    print(
                        f"round {r} admission: probe {p_before:.0f} < "
                        f"{args.admit_frac:.2f}*ref({ref:.0f}) — waiting "
                        f"{args.admit_poll}s",
                        flush=True,
                    )
                    time.sleep(args.admit_poll)
                    waited += args.admit_poll
                    p_before = round(host_probe(), 1)
            a, b = (hi, lo) if r % 2 == 0 else (lo, hi)
            # run a, run b, ceil a, ceil b, run a, run b — each level's
            # duplicates bracket the other level's runs AND the ceilings
            round_rates: dict[int, list[float]] = {lo: [], hi: []}
            round_ceiling: dict[int, float] = {}
            secs_mark = {c: len(secs[c]) for c in (lo, hi)}
            try:
                for cores in (a, b):
                    res = measured(cores, "run")
                    round_rates[cores].append(res["events_per_sec"])
                    secs[cores].append(res["seconds"])
                for cores in (a, b):
                    c = measured(cores, "ceil")
                    round_ceiling[cores] = c["ceiling_scan_sec"]
                for cores in (a, b):
                    res = measured(cores, "run")
                    round_rates[cores].append(res["events_per_sec"])
                    secs[cores].append(res["seconds"])
            except (RuntimeError, OSError) as e:
                # a worker JVM died mid-round (see /tmp/scaling_worker_*.err)
                # — drop this round's partial samples, restart the dead
                # worker(s), and keep the record going
                print(f"round {r} ABORTED: {e}; restarting worker", flush=True)
                for c in (lo, hi):
                    del secs[c][secs_mark[c]:]  # drop the partial samples
                for worker in w.values():
                    worker.resume()
                    if worker.proc.poll() is not None:
                        worker.restart()
                time.sleep(args.dirty_cooldown)
                continue
            p_after = round(host_probe(), 1)
            probes.append([p_before, p_after])

            ratio = {
                str(c): round(max(round_rates[c]) / min(round_rates[c]), 3)
                for c in (lo, hi)
            }
            canary_ratios.append(ratio)
            rate = {c: statistics.median(round_rates[c]) for c in (lo, hi)}
            rates[lo].append(rate[lo])
            rates[hi].append(rate[hi])
            pair_effs.append((rate[hi] / rate[lo]) / 4)
            ceiling_effs.append(
                (round_ceiling[lo] / round_ceiling[hi]) / 4
                if round_ceiling.get(lo) and round_ceiling.get(hi)
                else None
            )
            print(
                f"round {r}: lo={rate[lo]:.0f} hi={rate[hi]:.0f} ev/s "
                f"eff={pair_effs[-1]:.3f} canary={ratio} "
                f"ceil_eff={ceiling_effs[-1]} probe_after={p_after:.0f}",
                flush=True,
            )
            # gate-eligible = canary-clean AND probe-healthy: the canary
            # catches INSTABILITY within the round; a STEADY hypervisor cap
            # passes the canary (round 9 of the 2026-08-17 record: ratios
            # 1.035/1.086 yet hi uniformly slowed 30%, eff 0.598) but shows
            # up as a depressed probe — each filter covers the other's
            # blind spot
            round_clean = max(ratio.values()) <= args.canary_ratio
            # robust probe reference (round 5): median of per-round max
            # probes, NOT the all-time max — the record's first probe
            # runs on an idle host before any Spark load and routinely
            # spikes (3505 vs a 2000-2500 steady state in the 2026-08-17
            # record), and a single max sample as normalizer then
            # rejects every loaded round by ~2%. The median of maxes
            # tracks typical attainable capacity; deep-throttle rounds
            # (819/1150/1361 probes) still miss the 0.7x bar by 25-50%.
            # FLOORED at 0.6x the all-time max so a record throttled for
            # the MAJORITY of its rounds cannot drag the median down to
            # the cap and self-certify depressed rounds as healthy (no
            # stored record's reference moves: every median exceeds the
            # floor). tools/regate.py applies the same rule to older
            # records.
            probe_ref = _probe_reference(probes)
            round_healthy = (
                min(probes[-1]) >= args.healthy_frac * probe_ref
            )
            # recompute the FULL gate set under the current reference
            # (not an incremental count): later high-probe rounds raise
            # the median, which can retro-flip an early round unhealthy —
            # the stop decision must match the summary's final recompute
            # or a record can stop "at target" yet regate below it
            n_clean = sum(
                1 for i in range(len(probes))
                if max(canary_ratios[i].values()) <= args.canary_ratio
                and min(probes[i]) >= args.healthy_frac * probe_ref
            )
            if args.target_clean and n_clean >= args.target_clean:
                print(f"target of {args.target_clean} gate rounds reached",
                      flush=True)
                break
            # graceful early stop: touch this file to end the record NOW
            # with the summary still written (killing the orchestrator
            # loses the whole record — the summary runs after the loop)
            if os.path.exists("/tmp/scaling_stop"):
                print("stop file seen; ending record early", flush=True)
                os.unlink("/tmp/scaling_stop")  # don't truncate the NEXT record
                break
            if r < n_rounds - 1:
                cd = (args.cooldown if round_clean and round_healthy
                      else args.dirty_cooldown)
                if cd:
                    time.sleep(cd)
    finally:
        for worker in w.values():
            worker.stop()

    probe_ref = _probe_reference(probes)
    healthy = [
        i for i in range(len(probes))
        if min(probes[i]) >= args.healthy_frac * probe_ref
    ]
    clean = [
        i for i, cr in enumerate(canary_ratios)
        if max(cr.values()) <= args.canary_ratio
    ]
    healthy_effs = [pair_effs[i] for i in healthy]
    clean_effs = [pair_effs[i] for i in clean]
    summary = {
        "events": args.events,
        "chunks": args.chunks,
        "skewed": bool(skew),
        "hot_frac": skew[0] if skew else 0.01,
        "hot_traffic": skew[1] if skew else 0.5,
        "rounds": len(pair_effs),
        "target_clean": args.target_clean,
        "cores_n": lo,
        "cores_4n": hi,
        "rate_n_median": round(statistics.median(rates[lo]), 1),
        "rate_4n_median": round(statistics.median(rates[hi]), 1),
        "efficiency_median_of_pairs": round(statistics.median(pair_effs), 3),
        "efficiency_best_pair": round(max(pair_effs), 3),
        "pair_efficiencies": [round(e, 3) for e in pair_effs],
        "host_probes": probes,
        "healthy_frac": args.healthy_frac,
        # robust probe reference (median of per-round max probes — see
        # the loop comment and tools/regate.py)
        "probe_ref": round(probe_ref, 1),
        "healthy_rounds": healthy,
        "efficiency_median_healthy": (
            round(statistics.median(healthy_effs), 3) if healthy_effs else None
        ),
        "canary_ratio_threshold": args.canary_ratio,
        "canary_ratios": canary_ratios,
        "canary_clean_rounds": clean,
        "efficiency_median_canary_clean": (
            round(statistics.median(clean_effs), 3) if clean_effs else None
        ),
        # THE gate metric: canary-clean AND probe-healthy (each filter
        # covers the other's blind spot — see the loop comment)
        "gate_rounds": sorted(set(clean) & set(healthy)),
        "efficiency_median_gate": (
            round(
                statistics.median(
                    [pair_effs[i] for i in set(clean) & set(healthy)]
                ),
                3,
            )
            if set(clean) & set(healthy)
            else None
        ),
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
        "disjoint_pinning": True,
        "persistent_workers": True,
        "idle_worker_paused": True,  # SIGSTOP during the other level's run
        "cooldown": args.cooldown,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_runs.json", "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
