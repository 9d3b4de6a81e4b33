"""Growth-rate leg for the dedup/similarity family: sf0.1 vs synthetic sf1.0.

The driver ships parquet up to sf0.1 (5k documents); gate timings there
say nothing about growth RATES. This leg derives a 10x corpus
DETERMINISTICALLY from the driver's own sf0.1 documents (no external
data): copy c rotates every letter by c (`translate`), so each copy is an
independent corpus with the SAME internal dup/length structure — corpus
density is preserved instead of inflating every doc into a 10-way
near-dup cluster. Ids offset per copy.

Each operator is timed at both scales (noop-write forced, min-of-2);
growth = t_10x / t_1x, against the op's expected curve. The two
intrinsically-quadratic EXACT baselines run on their gate caps scaled
10x (500 -> 5000 docs) — their growth is expected ~100x/cap-bound, which
is WHY their at-scale paths are minhash/LSH.

Usage: python scripts/bench_dedup_scale.py [sf_dir] — prints one JSON
line per op plus a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from funcify_feature_eng_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def upscale_documents(spark, sf_dir: str, out_dir: str, n_copies: int = 10) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(src)
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    parts = []
    for c in range(n_copies):
        rot_l = lower[c:] + lower[:c]
        rot_u = upper[c:] + upper[:c]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * 1_000_000_000)).alias("doc_id"),
                F.translate(F.col("text"), lower + upper, rot_l + rot_u).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(dst)
    return out_dir


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-dedup-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    big_dir = upscale_documents(spark, sf_dir, os.path.join(REPO, ".data", "sf1x_docs"))

    from funcify_feature_eng_spark.operators.dedup import (
        exact_dedup,
        line_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from funcify_feature_eng_spark.operators.graph import connected_components

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
        "exact_dedup": lambda d, cap: exact_dedup(docs_at(d), "doc_id", "text"),
        "minhash_lsh_pairs": lambda d, cap: minhash_lsh_pairs(
            docs_at(d), "doc_id", "text", num_hashes=64, bands=16,
            shingle_k=3, verify_threshold=0.5),
        "simhash_near_pairs": lambda d, cap: simhash_near_pairs(
            docs_at(d), "doc_id", "text"),
        "line_dedup": lambda d, cap: line_dedup(docs_at(d), "doc_id", "text"),
        # exact quadratic baseline: gate cap x10 (500 -> 5000 docs)
        "ngram_jaccard_pairs": lambda d, cap: ngram_jaccard_pairs(
            docs_at(d).filter(F.col("doc_id") % 1_000_000_000 < cap),
            "doc_id", "text", n=5, threshold=0.8),
        "dup_clusters": lambda d, cap: connected_components(
            minhash_lsh_pairs(docs_at(d), "doc_id", "text", num_hashes=64,
                              bands=16, shingle_k=3, verify_threshold=0.5),
            "doc_a", "doc_b"),
    }
    import __spark_entry__ as entry

    results = {}
    for name, make in OPS.items():
        t1 = timed(lambda: make(sf_dir, 500))
        t10 = timed(lambda: make(big_dir, 500))  # cap is PER COPY → 5000 total
        results[name] = {"t_1x_sec": round(t1, 2), "t_10x_sec": round(t10, 2),
                         "growth": round(t10 / t1, 1)}
        print(json.dumps({"op": name, **results[name]}))
    # capstone through the entry query (documents-only input)
    t1 = timed(lambda: entry.q_corpus_curation(spark, sf_dir))
    t10 = timed(lambda: entry.q_corpus_curation(spark, big_dir))
    results["corpus_curation"] = {"t_1x_sec": round(t1, 2),
                                  "t_10x_sec": round(t10, 2),
                                  "growth": round(t10 / t1, 1)}
    print(json.dumps({"op": "corpus_curation", **results["corpus_curation"]}))
    print(json.dumps({"summary": results, "docs_1x": docs_at(sf_dir).count(),
                      "docs_10x": docs_at(big_dir).count()}))


if __name__ == "__main__":
    main()
