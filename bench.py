"""Benchmark harness.

Default mode (what the driver runs): execute the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every query is forced end-to-end with a noop-format write (count() would let
Catalyst prune unread feature columns and under-report the work).

``--scaling`` mode: run the flagship transcript workload at local[8] and
local[32] on identical input via subprocesses (fresh JVM each — the sandbox
proxy for N vs 4N executors per the driver instruction) and report
throughput + scaling efficiency into BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data", "bench")
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
HOT = 20000


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def flagship(spark, data_dir: str):
    """Turn features + strictly-prior as-of store join over transcripts —
    the BASELINE.json north-star job."""
    from funcify_feature_eng_spark.operators.asof import asof_join
    from funcify_feature_eng_spark.operators.windows import turn_features

    tr = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
    fs = spark.read.parquet(os.path.join(data_dir, "feature_store.parquet"))
    feats = turn_features(tr)
    return asof_join(
        feats, fs, on=["conv_id"], left_ts="ts", right_ts="value_at_ts",
        value_cols={"value": "asof_store_value"}, allow_exact_matches=False,
        right_order=["value"],
    )


def run_default() -> None:
    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.datagen import ensure_dataset

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    spark = get_spark("bench", master=f"local[{cpus}]")
    ensure_dataset(BENCH_DATA, n_convs=N_CONVS, seed=42, hot=HOT)

    times: dict[str, float] = {}
    # flagship transcript workload (throughput metric)
    n_turns = spark.read.parquet(os.path.join(BENCH_DATA, "transcripts.parquet")).count()
    t0 = time.time()
    _force(flagship(spark, BENCH_DATA))
    times["flagship_transcripts"] = round(time.time() - t0, 3)
    turns_per_sec = round(n_turns / times["flagship_transcripts"], 1)

    for name, fn in entrymod.queries().items():
        t0 = time.time()
        _force(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline query wall time (flagship transcripts + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "flagship_turns": n_turns,
        "flagship_turns_per_sec": turns_per_sec,
    }))
    spark.stop()


def run_single(cores: str) -> None:
    """Subprocess worker: flagship only, fixed input, print json."""
    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.datagen import ensure_dataset

    ensure_dataset(BENCH_DATA, n_convs=N_CONVS, seed=42, hot=HOT)
    spark = get_spark("bench-scaling", master=f"local[{cores}]")
    n_turns = spark.read.parquet(os.path.join(BENCH_DATA, "transcripts.parquet")).count()
    _force(flagship(spark, BENCH_DATA))  # warm-up (JIT, page cache)
    t0 = time.time()
    _force(flagship(spark, BENCH_DATA))
    dt = time.time() - t0
    print(json.dumps({"cores": int(cores), "sec": round(dt, 3),
                      "turns": n_turns, "turns_per_sec": round(n_turns / dt, 1)}))
    spark.stop()


def run_scaling() -> None:
    results = {}
    for cores in ("8", "32"):
        out = subprocess.run(
            [sys.executable, __file__, "--single", cores],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    r8, r32 = results["8"], results["32"]
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Flagship workload: windowed turn features + strictly-prior as-of store join
over {r8['turns']:,} transcript turns (Zipf conversation sizes + one
{HOT:,}-turn hot conversation). Same input, two parallelism levels, fresh
JVM each (sandbox proxy for N vs 4N executors per driver instruction).

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['turns_per_sec']:,} |
| local[32] (4N) | {r32['sec']} | {r32['turns_per_sec']:,} |

**Scaling efficiency (N→4N): {eff:.2f}** (target ≥ 0.8)
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    elif len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(sys.argv[2])
    else:
        run_default()
