"""Growth-rate leg for the temporal-feature family: sf0.1 vs synthetic 10x.

The window/as-of operators are expected LINEAR in rows (one shuffle on the
entity key, per-partition sort); this leg proves the curve instead of
asserting it. A 10x events table is derived DETERMINISTICALLY from the
driver's own sf0.1 parquet (no external data): copy c shifts user_id by
c*1_000_000 and event_id by c*100_000_000 — each copy is an independent
population with the SAME per-entity density and time range, so per-task
work is constant and only task COUNT grows (exactly how a bigger cluster
would see it). Expected growth at fixed parallelism: ~10x wall for the
shuffle-bound ops; anything superlinear gets a named cause.

Timed ops (noop-write forced, min-of-2 per scale):
  rolling_time_stats   — event-time RANGE count+sum (1 exchange, 1 window)
  rolling_distinct     — set-valued RANGE frame
  context_concat       — prior-k assembly (ROWS frame)
  sft_examples         — the composed capstone (2 exchanges, 4 windows)
  resample_grid        — grid explode + latest-wins + union-window as-of

Usage: python scripts/bench_temporal_scale.py [sf_dir] — prints one JSON
line per op plus a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from funcify_feature_eng_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPS = [
    "rolling_time_stats",
    "rolling_distinct",
    "context_concat",
    "sft_examples",
    "resample_grid",
    # round-5 wave 4: backfill family + multi-horizon + temporal CV.
    # bounded_backfill is expected ~3x the single-horizon window cost at
    # ANY scale (3 replicas/row at bucket=1800,L=3600) but still linear;
    # purged_folds is linear with a k=4 broadcast fan-out.
    "bounded_backfill",
    "multi_horizon_stats",
    "purged_folds",
    # round-5 wave 15: exact two-sample tests + trend/change-point.
    # ks/mw: the data-sized stage is one map-combined value-grain
    # aggregate (linear); the ECDF windows move distinct-value rows.
    # value_trend: one aggregate, zero windows (linear, map-dominated).
    # cusum: one sorted window partitioned by event_type — 5 groups, so
    # at fixed parallelism the per-group funnel dominates (linear in
    # rows, parallelism-limited like any low-cardinality global sort).
    "ks_value_shift",
    "mw_value_shift",
    "value_trend",
    "cusum_value_shift",
]


def upscale_events(spark, sf_dir: str, out_dir: str, n_copies: int = 10) -> str:
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    ev = spark.read.parquet(src)
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(c * 100_000_000)).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.lit(c * 1_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for c in range(n_copies)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(dst)
    return out_dir


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_op(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _force(fn(spark, sf_dir))
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-temporal-scale", master="local[32]")
    big_dir = upscale_events(spark, sf_dir, os.path.join(REPO, ".data", "events_10x"))

    qs = entrymod.queries()
    rows = []
    for name in OPS:
        fn = qs[name]
        _force(fn(spark, sf_dir))  # warm plans/codegen on the small scale
        t1 = time_op(fn, spark, sf_dir)
        t10 = time_op(fn, spark, big_dir)
        growth = round(t10 / t1, 2)
        rows.append({"op": name, "t_1x_sec": t1, "t_10x_sec": t10, "growth": growth})
        print(json.dumps(rows[-1]))
    print(json.dumps({"summary": rows, "n_copies": 10, "sf_dir": sf_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
