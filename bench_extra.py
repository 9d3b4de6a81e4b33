"""Targeted per-query timing harness for optimization work (guide §1.4).

NOT the driver's bench (bench.py is frozen): this times a named subset of
``__spark_entry__.queries()`` against ``$SPARK_GRAFT_SF_DIR`` with the same
noop-sink methodology, optionally dumping ``explain("formatted")`` per query.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --explain-dir plans/r06 --suffix before q1 q2
    python bench_extra.py --runs 3 q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    suffix = "now"
    runs = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--explain-dir":
            explain_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from funcify_feature_eng_spark import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_NGRAM_CAP", "500")
    os.environ.setdefault("SPARK_GRAFT_PAIRS_CAP", "1000")
    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        if samples:
            out[name] = samples
            print(json.dumps({"query": name, "samples": samples,
                              "min": min(samples), "sf_dir": sf_dir}), flush=True)
        else:
            print(json.dumps({"query": name, "plan_only": True}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"all": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
