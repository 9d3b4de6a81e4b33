"""Growth-rate leg for the round-5 conversation-QA + incremental families.

Same protocol as the other bench_*_scale scripts (deterministic 10x
corpus via the shared upscalers, noop-write forced, min-of-2, fixed
parallelism). Expected shapes, each with its mechanism:

* role_sequence_audit — ~linear: one window exchange + one
  map-side-combined aggregate; the transition check is a constant-size
  literal IN.
* conv_dedup — ~linear: first-3-turn slice (window) + one grouping
  shuffle of one short journey string per entity.
* conv_truncate — ~linear: one ROWS-framed window over (user, order).
* boilerplate_turns — ~linear: two-level aggregate whose shuffle volume
  is bounded by distinct (payload, entity) pairs.
* doc_compression — ~linear: one Arrow map pass, zero shuffle.
* incremental_minhash — ~linear: zero-shuffle signatures + band-key
  shuffles O(batch·bands); candidate pairs bounded by the bucket cap, so
  the quadratic term never materializes.

Usage: python scripts/bench_transcript_scale.py [sf_dir] — one JSON line
per op plus a summary line for BENCH.md.
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
    spark = get_spark("bench-transcript-scale", master=f"local[{cpus}]",
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
        "role_sequence_audit": (sf_dir, big_events,
                                lambda d: entry.q_role_sequence_audit(spark, d)),
        "conv_dedup": (sf_dir, big_events,
                       lambda d: entry.q_conv_dedup(spark, d)),
        "conv_truncate": (sf_dir, big_events,
                          lambda d: entry.q_conv_truncate(spark, d)),
        "boilerplate_turns": (sf_dir, big_events,
                              lambda d: entry.q_boilerplate_turns(spark, d)),
        "doc_compression": (sf_dir, big_docs,
                            lambda d: entry.q_doc_compression(spark, d)),
        "incremental_minhash": (sf_dir, big_docs,
                                lambda d: entry.q_incremental_minhash(spark, d)),
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
