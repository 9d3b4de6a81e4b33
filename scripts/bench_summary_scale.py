"""Growth-rate leg for the sketch/sampling/metrics family: sf0.1 vs 10x.

Same protocol as scripts/bench_dedup_scale.py (deterministic letter-rotated
10x corpus, noop-write forced, min-of-2): these operators are designed to be
(sub-)linear — the sketches shuffle bounded summaries (distinct hashes /
counter tables / bit words), the samplers are pure maps after at most one
aggregate, and the AUC is one window pass — so any superlinear growth here
is a bug, not a trade-off.

Usage: python scripts/bench_summary_scale.py [sf_dir] — one JSON line per
op plus a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from funcify_feature_eng_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-summary-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    from bench_dedup_scale import upscale_documents

    big_dir = upscale_documents(spark, sf_dir, os.path.join(REPO, ".data", "sf1x_docs"))

    import __spark_entry__ as entry
    from funcify_feature_eng_spark.operators.metrics import group_auc

    def docs_at(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

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
        "kmv_distinct": lambda d: entry.q_kmv_distinct(spark, d),
        "kmv_overlap": lambda d: entry.q_kmv_overlap(spark, d),
        "cms_tokens": lambda d: entry.q_cms_tokens(spark, d),
        "bloom_probe": lambda d: entry.q_bloom_probe(spark, d),
        "weighted_sample": lambda d: entry.q_weighted_sample(spark, d),
        "budget_mixture": lambda d: entry.q_budget_mixture(spark, d),
        "group_auc_docs": lambda d: group_auc(
            docs_at(d), F.col("source") == "web", F.col("n_chars"), ["lang"]
        ),
        "corpus_pipeline": lambda d: entry.q_corpus_pipeline(spark, d),
    }

    results = {}
    for name, make in OPS.items():
        t1 = timed(lambda: make(sf_dir))
        t10 = timed(lambda: make(big_dir))
        results[name] = {"t_1x_sec": round(t1, 2), "t_10x_sec": round(t10, 2),
                         "growth": round(t10 / t1, 1)}
        print(json.dumps({"op": name, **results[name]}))
    print(json.dumps({"summary": results,
                      "docs_1x": docs_at(sf_dir).count(),
                      "docs_10x": docs_at(big_dir).count()}))


if __name__ == "__main__":
    main()
