"""Growth-rate leg for the round-5 wave-21..25 analytic families.

Protocol identical to the other growth legs (bench_behavior_scale.py):
derive a DETERMINISTIC 10x input from the driver's own sf parquet (no
external data), run each gate at 1x and 10x at fixed parallelism
(local[32]), noop-write forced, min-of-2, report growth = t10/t1.

Upscaling strategy per table — chosen to stress the dimension each
operator's scale contract names:

- events 10x: user_id/event_id shift by copy — independent user
  populations at constant per-user density. asof_topk (two entity-grain
  shuffles, explode factor k), session_concurrency (bucket-grain sweep:
  day count FIXED, rows per day x10), value_acf (per-type series x10
  rows), hourly_seasonality (168 fixed slots): all claim ~linear scan-
  bound behavior with flat aggregate tails.
- orders 10x: o_orderkey shifts by copy, priority/status UNCHANGED —
  benford (9 digits fixed), mad_outlier (5 groups, two rank sorts over
  10x rows), priority_evidence (5 categories): scan/sort-bound.
- part 10x: p_partkey shifts, p_brand UNCHANGED — pareto_front's
  per-brand sort grows 10x while the front itself stays brand-grain.
- lineitem 10x: l_orderkey shifts, l_partkey UNCHANGED — the co-order
  graph's edge SET is identical at 10x (counts x10), so
  part_communities' per-iteration join/argmax should be near flat after
  the edge-derivation scan.

Usage: python scripts/bench_analytic_scale.py [sf_dir] — one JSON line
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
    "asof_topk_purchases",
    "session_concurrency",
    "value_acf",
    "hourly_seasonality",
    "benford_prices",
    "mad_outlier_prices",
    "priority_evidence",
    "pareto_parts",
    "part_communities",
    "source_concentration",
    "price_gini",
    "window_purchase_stats",
    "price_reference_pct",
    "throttle_audit",
    "state_dwell",
    "price_quantile_match",
]


def _shift_copy(df, shifts: dict[str, int], n_copies: int):
    cols = [c for c in df.columns if c not in shifts]
    parts = [
        df.select(
            *[(F.col(k) + F.lit(c * off)).alias(k) for k, off in shifts.items()],
            *cols,
        )
        for c in range(n_copies)
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


def upscale(spark, sf_dir: str, out_dir: str, n_copies: int = 10) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    plan = {
        "events": {"event_id": 100_000_000, "user_id": 1_000_000},
        "orders": {"o_orderkey": 100_000_000},
        "part": {"p_partkey": 100_000_000},
        "lineitem": {"l_orderkey": 100_000_000},
        # doc_id shifts, source labels UNCHANGED — the concentration
        # report's category table stays fixed while rows grow 10x
        "documents": {"doc_id": 100_000_000},
    }
    for table, shifts in plan.items():
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        _shift_copy(df, shifts, n_copies).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{table}.parquet"))
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
    spark = get_spark("bench-analytic-scale", master="local[32]")
    big_dir = upscale(spark, sf_dir, os.path.join(REPO, ".data", "analytic_10x"))

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
