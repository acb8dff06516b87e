"""Skew benchmark: dedup reducer strategies under uniform vs pathological
key skew (SURVEY.md §7.5 watch list — "salting must apply to the reduce;
measure both").

Workloads:
- generator default: 1% hot convs take 50% of update traffic (the north
  rule's skew shape); dedup key (conv_id, turn_idx) spreads each hot conv
  over its turns.
- pathological: 50% of ALL events target ONE (conv_id, turn_idx) key —
  the worst case for a sort/window reducer (one task sorts half the data).

Strategies: hash-agg max_by (partial combine), window row_number,
explicit two-phase salted agg.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from caterpillar_spark.generator import GeneratorSpec, change_events  # noqa: E402
from caterpillar_spark.operators.dedup import (  # noqa: E402
    last_writer_wins,
    last_writer_wins_salted,
    last_writer_wins_window,
)
from caterpillar_spark.session import get_spark  # noqa: E402


def pathological(spark, n: int):
    """50% of events hit one key; rest uniform."""
    ev = change_events(
        spark, GeneratorSpec(n_events=n, n_convs=max(1000, n // 100))
    )
    hot = F.abs(F.xxhash64("lsn", F.lit("sk"))) % 2 == 0
    return ev.withColumn(
        "conv_id", F.when(hot, F.lit("conv_HOT")).otherwise(F.col("conv_id"))
    ).withColumn("turn_idx", F.when(hot, F.lit(0)).otherwise(F.col("turn_idx")))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("skew-bench", cores=16, shuffle_partitions=32)
    default = change_events(
        spark, GeneratorSpec(n_events=n, n_convs=max(1000, n // 100))
    )
    patho = pathological(spark, n)
    strategies = {
        "agg_max_by": last_writer_wins,
        "window_row_number": last_writer_wins_window,
        "salted_two_phase": lambda df: last_writer_wins_salted(df, n_salts=32),
    }
    out: dict[str, dict[str, float]] = {}
    for wname, df in [("zipf_default", default), ("one_hot_key", patho)]:
        out[wname] = {}
        for sname, fn in strategies.items():
            fn(df).count()  # warm-up/JIT
            t0 = time.time()
            fn(df).count()
            out[wname][sname] = round(time.time() - t0, 2)
            print(f"{wname} / {sname}: {out[wname][sname]}s", flush=True)
    print(json.dumps({"events": n, "seconds": out}))


if __name__ == "__main__":
    main()
