"""Growth-rate leg for the selection family: sf0.1 vs synthetic 10x.

Same protocol as scripts/bench_dedup_scale.py / bench_summary_scale.py
(deterministic 10x corpus, noop-write forced, min-of-2, fixed
parallelism). Expected shapes, each with its mechanism:

* dsir_select — ~linear: two map passes over the corpus (count pass +
  score pass); the shuffles are O(n_buckets) count rows and one
  map-side-combined per-doc sum; the driver step is a fixed O(n_buckets)
  collect regardless of corpus size.
* source_cap (frequency_cap two_phase) — ~linear scan + two windows whose
  phase-2 input is capped at cap x n_salts rows per group, so the final
  sort does not grow with the corpus at all.
* preference_pairs — ~linear: one map-side-combined groupBy, one row per
  group shuffled.

Usage: python scripts/bench_selection_scale.py [sf_dir] — one JSON line
per op plus a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funcify_feature_eng_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-selection-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    from bench_dedup_scale import upscale_documents
    from bench_temporal_scale import upscale_events

    big_docs = upscale_documents(spark, sf_dir, os.path.join(REPO, ".data", "sf1x_docs"))
    big_events = upscale_events(spark, sf_dir, os.path.join(REPO, ".data", "sf1x_events"))

    import __spark_entry__ as entry

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(make_df):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(make_df())
            best = min(best, time.perf_counter() - t0)
        return best

    OPS = {
        "dsir_select": (sf_dir, big_docs,
                        lambda d: entry.q_dsir_select(spark, d)),
        "source_cap": (sf_dir, big_docs,
                       lambda d: entry.q_source_cap(spark, d)),
        "preference_pairs": (sf_dir, big_events,
                             lambda d: entry.q_preference_pairs(spark, d)),
    }

    results = {}
    for name, (small, big, make) in OPS.items():
        t1 = timed(lambda: make(small))
        t10 = timed(lambda: make(big))
        results[name] = {"t_1x_sec": round(t1, 2), "t_10x_sec": round(t10, 2),
                         "growth": round(t10 / t1, 1)}
        print(json.dumps({"op": name, **results[name]}))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
