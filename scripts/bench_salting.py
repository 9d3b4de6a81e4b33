"""Head-to-head: literal hot-key salting vs segmented vs plain union_window
as-of on a hot-conversation fixture (north-rule check: "salting for hot
conversations" — prove which treatment wins rather than asserting it).

Fixture: n_convs normal conversations plus ONE hot conversation with
``hot`` turns (datagen.ensure_dataset). The hot conv concentrates an
entire entity in one window partition for the plain strategy; salted and
segmented both break it up, by different means.

Usage: python scripts/bench_salting.py [hot_turns] [n_convs] [reps]
Prints one JSON line per strategy and a winner summary (min-of-reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funcify_feature_eng_spark import get_spark
from funcify_feature_eng_spark.datagen import ensure_dataset
from funcify_feature_eng_spark.operators.asof import asof_join


def main() -> None:
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-salting", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    d = ensure_dataset(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".data", f"salting_{n_convs}_{hot}"),
        n_convs=n_convs, seed=11, hot=hot, n_files=8,
    )
    tr = spark.read.parquet(os.path.join(d, "transcripts.parquet"))
    fs = spark.read.parquet(os.path.join(d, "feature_store.parquet"))
    n_left = tr.count()
    print(f"# left rows: {n_left} (hot conv: {hot}), store rows: {fs.count()}",
          file=sys.stderr)

    def run(strategy: str, **kw) -> float:
        out = asof_join(
            tr, fs, on=["conv_id"], left_ts="ts", right_ts="value_at_ts",
            value_cols={"value": "sv"}, right_order=["value"],
            strategy=strategy, **kw,
        )
        t0 = time.perf_counter()
        # noop write forces full computation without pruning (never .count())
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, float] = {}
    for strategy, kw in [
        ("union_window", {}),
        ("segmented", {"bucket_seconds": 6 * 3600}),
        ("salted", {"num_salts": 16}),
    ]:
        times = [run(strategy, **kw) for _ in range(reps)]
        results[strategy] = min(times)
        print(json.dumps({
            "strategy": strategy, "best_sec": round(min(times), 3),
            "all_sec": [round(t, 3) for t in times],
            "rows_per_sec": int(n_left / min(times)),
        }))
    winner = min(results, key=results.get)
    print(json.dumps({"winner": winner, "results_sec": {k: round(v, 3) for k, v in results.items()},
                      "hot_turns": hot, "n_convs": n_convs, "left_rows": n_left}))


if __name__ == "__main__":
    main()
