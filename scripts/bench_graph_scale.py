"""Growth-rate leg for the round-5 linkage / funnel / graph families.

Protocol identical to the other growth legs (bench_temporal_scale.py):
derive a DETERMINISTIC 10x input from the driver's own sf parquet (no
external data), run each gate at 1x and 10x at fixed parallelism
(local[32]), noop-write forced, min-of-2, report growth = t10/t1.

Upscaling strategy per table — chosen so the 10x input stresses exactly
the dimension the operator's scale contract names:

- part 10x: p_partkey shifts by copy, p_name UNCHANGED — the name
  VOCABULARY stays 64 values while rows grow 10x. blocked_edit_pairs
  claims "link the vocabulary, not the rows": the quadratic tier should be
  FLAT and only the distinct scan grow; canonicalize's broadcast rejoin is
  row-linear.
- events 10x: user_id/event_id shift by copy — independent populations
  with the same per-user density (task count grows, per-task work
  constant). funnel_steps / retention_cohorts are one-shuffle
  entity-grain folds: expected ~linear.
- lineitem 10x: l_orderkey shifts by copy, l_partkey UNCHANGED — baskets
  grow 10x over a fixed 2000-item vocabulary. co_occurrence_edges'
  pair-expansion volume grows linearly (per-basket work constant);
  triangle_stats' core runs on the FIXED vocabulary graph (same 3445
  edges after min_count scales with copies — note min_count=2 is met by
  every copy independently, so the thinned edge set is IDENTICAL and the
  triangle core is flat; only the edge-count aggregate grows).

Usage: python scripts/bench_graph_scale.py [sf_dir] — one JSON line per
op plus a summary line for BENCH.md.
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
    "fuzzy_name_pairs",
    "canonical_parts",
    "funnel_conversion",
    "retention_cohorts",
    "copart_edges",
    "part_triangles",
]


def upscale(spark, sf_dir: str, out_dir: str, n_copies: int = 10) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    pcols = [c for c in part.columns if c != "p_partkey"]
    pc = [
        part.select(
            (F.col("p_partkey") + F.lit(c * 10_000_000)).alias("p_partkey"), *pcols
        )
        for c in range(n_copies)
    ]
    out = pc[0]
    for x in pc[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ecols = [c for c in ev.columns if c not in ("event_id", "user_id")]
    ec = [
        ev.select(
            (F.col("event_id") + F.lit(c * 100_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(c * 1_000_000)).alias("user_id"),
            *ecols,
        )
        for c in range(n_copies)
    ]
    out = ec[0]
    for x in ec[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    lcols = [c for c in li.columns if c != "l_orderkey"]
    lc = [
        li.select(
            (F.col("l_orderkey") + F.lit(c * 100_000_000)).alias("l_orderkey"), *lcols
        )
        for c in range(n_copies)
    ]
    out = lc[0]
    for x in lc[1:]:
        out = out.unionByName(x)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
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
    spark = get_spark("bench-graph-scale", master="local[32]")
    big_dir = upscale(spark, sf_dir, os.path.join(REPO, ".data", "graph_10x"))

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
