"""Growth-rate leg for the round-5 behavior/privacy families (waves 23-27).

Protocol identical to the other growth legs (bench_graph_scale.py):
derive a DETERMINISTIC 10x input from the driver's own sf parquet (no
external data), run each gate at 1x and 10x at fixed parallelism
(local[32]), noop-write forced, min-of-2, report growth = t10/t1.

Upscaling strategy per table — chosen to stress the dimension each
operator's scale contract names:

- events 10x: user_id/event_id shift by copy — independent user
  populations at constant per-user density. attribution (one window
  pass), activity_streaks (entity-grain fold), km_survival (life-table
  fold over per-user durations): all claim ~linear in entities.
- lineitem 10x: l_orderkey shifts by copy, l_partkey UNCHANGED — baskets
  grow 10x over the fixed part vocabulary. item_neighbors' pair
  expansion is linear in baskets; its similarity/top-k core runs on the
  FIXED vocabulary graph (edge set identical, counts x10) and should be
  flat.
- customer 10x: c_custkey shifts by copy, nation/segment UNCHANGED — the
  QI-grain group table stays at 125 groups while rows grow 10x; the
  privacy audit should be scan-bound (~linear) with a flat aggregate
  tail.

Usage: python scripts/bench_behavior_scale.py [sf_dir] — one JSON line
per op plus a summary line for BENCH.md.
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
    "attribution_last",
    "attribution_first",
    "activity_streaks",
    "km_survival",
    "item_neighbors",
    "k_anonymity_groups",
    "k_anonymity_summary",
]


def upscale(spark, sf_dir: str, out_dir: str, n_copies: int = 10) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ecols = [c for c in ev.columns if c not in ("event_id", "user_id")]
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(c * 100_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(c * 1_000_000)).alias("user_id"),
            *ecols,
        )
        for c in range(n_copies)
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    lcols = [c for c in li.columns if c != "l_orderkey"]
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(c * 100_000_000)).alias("l_orderkey"),
            *lcols,
        )
        for c in range(n_copies)
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )

    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    ccols = [c for c in cu.columns if c != "c_custkey"]
    parts = [
        cu.select(
            (F.col("c_custkey") + F.lit(c * 10_000_000)).alias("c_custkey"),
            *ccols,
        )
        for c in range(n_copies)
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )
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
    spark = get_spark("bench-behavior-scale", master="local[32]")
    big_dir = upscale(spark, sf_dir, os.path.join(REPO, ".data", "behavior_10x"))

    qs = entrymod.queries()
    rows = []
    for name in OPS:
        fn = qs[name]
        _force(fn(spark, sf_dir))  # warm plans/codegen
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
