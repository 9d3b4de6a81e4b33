"""Growth-rate leg for the feature-conditioning family: sf0.1 vs 10x.

Same protocol as the other bench_*_scale.py legs (deterministic 10x
corpora, noop-write forced, min-of-2). Expected shapes:

- minmax/zscore/count-encode/decay/corr: ~linear — ONE map-side-combined
  group-grain aggregate (or window-free map) per op, the data side never
  shuffles more than once.
- quantile_bin/winsorize/rank_normalize: ~linear with a bigger constant —
  the exact rank sort is the fundamental cost; per-group sorts spill,
  they don't blow up.
- bin_by_cuts/hash_cross: pure maps, should track scan time.

Usage: python scripts/bench_scaling_scale.py [sf_dir] — one JSON line per
op plus a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from funcify_feature_eng_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-scaling-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    from bench_dedup_scale import upscale_documents
    from bench_temporal_scale import upscale_events

    import __spark_entry__ as entry

    docs_big = upscale_documents(
        spark, sf_dir, os.path.join(REPO, ".data", "sf1x_docs")
    )
    ev_big = upscale_events(
        spark, sf_dir, os.path.join(REPO, ".data", "events_10x")
    )
    # lineitem 10x for the correlation leg: shift keys per copy, keep
    # every measure byte-identical so the moment arithmetic is comparable
    li_big = os.path.join(REPO, ".data", "lineitem_10x")
    li_dst = os.path.join(li_big, "lineitem.parquet")
    if not os.path.exists(li_dst):
        from pyspark.sql import functions as F

        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        parts = [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(c * 1_000_000_000)
            )
            for c in range(10)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        os.makedirs(li_big, exist_ok=True)
        out.repartition(32).write.mode("overwrite").parquet(li_dst)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(make_df):
        # untimed warm-up first: these aggregates generate 100+ codegen
        # classes; a cold first run measures the JIT (observed 10-40x on
        # feature_corr), not the plan
        force(make_df())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(make_df())
            best = min(best, time.perf_counter() - t0)
        return best

    qs = entry.queries()
    OPS = {
        # documents-backed (rank sorts + group-stat joins)
        "feature_scaling": (qs["feature_scaling"], sf_dir, docs_big),
        "rank_normalized": (qs["rank_normalized"], sf_dir, docs_big),
        "hash_crosses": (qs["hash_crosses"], sf_dir, docs_big),
        # events-backed
        "winsorized_values": (qs["winsorized_values"], sf_dir, ev_big),
        "count_encoding": (qs["count_encoding"], sf_dir, ev_big),
        "time_decay_rollup": (qs["time_decay_rollup"], sf_dir, ev_big),
        # lineitem-backed
        "feature_corr": (qs["feature_corr"], sf_dir, li_big),
    }

    results = {}
    for name, (fn, d1, d10) in OPS.items():
        t1 = timed(lambda: fn(spark, d1))
        t10 = timed(lambda: fn(spark, d10))
        results[name] = {"t_1x_sec": round(t1, 2), "t_10x_sec": round(t10, 2),
                         "growth": round(t10 / t1, 1)}
        print(json.dumps({"op": name, **results[name]}))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
