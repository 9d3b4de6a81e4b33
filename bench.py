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

N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
# fixture dir is conv-count-suffixed: ensure_dataset is idempotent per
# ARGS but writes to fixed filenames, so two sizes sharing one dir would
# leave the marker of one and the files of the other (a tiny smoke run
# must never corrupt the driver's 20k-conv artifact)
BENCH_DATA = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".data", f"bench_{N_CONVS}"
)
# scaling runs need a bigger fixture so JVM/scan fixed costs amortize
N_CONVS_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "80000"))
HOT = 20000


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _canary(spark) -> float:
    """Fixed pure-JVM workload (range-sum of 2e9): a machine-quality probe.
    The sandbox VM suffers MINUTE-SCALE noisy-neighbor windows that inflate
    every timing uniformly (observed: the same executed plan at 2.4 s and
    60 s in one session). The canary is timed at suite start and end so a
    reading taken inside such a window is visible in the artifact instead
    of masquerading as a code regression."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(2_000_000_000).agg(F.sum("id")).collect()
    return round(time.time() - t0, 3)


def flagship(spark, data_dir: str):
    """Turn features + strictly-prior as-of store join over transcripts —
    the BASELINE.json north-star job."""
    from funcify_feature_eng_spark.operators.asof import asof_join
    from funcify_feature_eng_spark.operators.windows import turn_features

    tr = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
    fs = spark.read.parquet(os.path.join(data_dir, "feature_store.parquet"))
    feats = turn_features(tr)
    # store is small relative to the spine → broadcast as-of: the heavy text
    # payload crosses exactly ONE exchange (the feature window), never two
    return asof_join(
        feats, fs, on=["conv_id"], left_ts="ts", right_ts="value_at_ts",
        value_cols={"value": "asof_store_value"}, allow_exact_matches=False,
        right_order=["value"], strategy="broadcast",
    )


def run_default() -> None:
    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.datagen import ensure_dataset

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    # exact all-pairs jaccard is quadratic on the tiny-vocab synthetic docs;
    # bound it for timing (the at-scale near-dup path is minhash_lsh_pairs)
    os.environ.setdefault("SPARK_GRAFT_NGRAM_CAP", "500")
    os.environ.setdefault("SPARK_GRAFT_PAIRS_CAP", "1000")
    spark = get_spark("bench", master=f"local[{cpus}]")
    ensure_dataset(BENCH_DATA, n_convs=N_CONVS, seed=42, hot=HOT, n_files=64)

    times: dict[str, float] = {}
    _canary(spark)  # untimed: first probe pays JIT/codegen warm-up (~10x),
    # which would read as a steal window in the start/end comparison
    canary_start = _canary(spark)
    # flagship transcript workload (throughput metric): warm-up then
    # min-of-3 — the sandbox VM's available CPU drifts minute-to-minute,
    # and the driver artifact should carry the defensible (min) number
    # alongside the individual runs
    n_turns = spark.read.parquet(os.path.join(BENCH_DATA, "transcripts.parquet")).count()
    _ensure_bucketed_table(spark)  # ingest BEFORE any timing (disk traffic)
    _force(flagship(spark, BENCH_DATA))  # warm plain
    # plain and bucketed flagships STRICTLY ALTERNATE so each ratio pair
    # shares one machine window — the VM's minute-scale steal bursts broke
    # both orderings tried in earlier rounds ("after the suite" r3,
    # "adjacent blocks" r4: the burst ended BETWEEN the blocks)
    bjob, bn, brestore = _bucketed_job(spark)
    flagship_runs, bucketed_runs, pair_ratios = [], [], []
    # CANARY-GATED flagship block (round-4 verdict task 1): each alternating
    # block is BRACKETED by canary probes; a block whose brackets disagree
    # >1.5x ran inside a hypervisor-steal window and is retried (bounded).
    # The artifact is self-qualifying: canaries + clean flag are published,
    # and "degraded": true marks a suite where no clean window was found.
    canaries = [canary_start]
    flagship_block_clean = False
    clean_attempt = None
    try:
        for attempt in range(3):
            for _ in range(3):
                t0 = time.time()
                _force(flagship(spark, BENCH_DATA))
                p = time.time() - t0
                t0 = time.time()
                _force(bjob())
                b = time.time() - t0
                flagship_runs.append(round(p, 3))
                bucketed_runs.append(round(b, 3))
                pair_ratios.append(round(p / b, 3))
            canaries.append(_canary(spark))
            lo, hi = min(canaries[-2:]), max(canaries[-2:])
            if hi <= 1.5 * lo:
                flagship_block_clean = True
                clean_attempt = attempt
                break
    finally:
        brestore()
    times["flagship_transcripts"] = min(flagship_runs)
    turns_per_sec = round(n_turns / times["flagship_transcripts"], 1)
    bucketed_tps = round(bn / min(bucketed_runs), 1)

    for name, fn in entrymod.queries().items():
        # adaptive min-of-2..4: the sandbox VM suffers minute-scale
        # noisy-neighbor CPU steal windows large enough to inflate a 4 s
        # query to 35 s across BOTH of two runs. Sample until the best two
        # agree within 50% (or 4 tries) and keep the min — cheap/stable
        # queries still stop at two runs; only steal-window victims re-run.
        # First run also serves as plan warm-up.
        samples = []
        for _ in range(4):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            samples.append(time.time() - t0)
            if len(samples) >= 2:
                s = sorted(samples)
                if s[0] < 1.0 or s[1] <= 1.5 * s[0]:
                    break
        times[name] = round(min(samples), 3)

    # tail re-measure: if the head flagship runs fell in a steal window,
    # two more runs after the suite recover the honest min (the min over
    # all placements is the defensible number; every sample is published)
    for _ in range(2):
        t0 = time.time()
        _force(flagship(spark, BENCH_DATA))
        flagship_runs.append(round(time.time() - t0, 3))
    times["flagship_transcripts"] = min(flagship_runs)
    turns_per_sec = round(n_turns / times["flagship_transcripts"], 1)
    canary_end = _canary(spark)
    canaries.append(canary_end)
    if max(canary_start, canary_end) > 1.5 * min(canary_start, canary_end):
        # one disagreeing probe is as likely probe noise as suite steal —
        # re-probe once to tell them apart (every probe is published); two
        # disagreeing end probes = the suite really ended in a dirty window
        canary_end = _canary(spark)
        canaries.append(canary_end)
    suite_canary_clean = max(canary_start, canary_end) <= 1.5 * min(
        canary_start, canary_end
    )
    degraded = not (flagship_block_clean and suite_canary_clean)

    # streaming gates: harness cost (2 real micro-batches + state store +
    # memory sink) vs the OPERATOR-ONLY cost, read off the already-timed
    # batch twin running the same DAG shape (round-4 verdict task 9) — so
    # an operator regression is visible even when harness noise dominates
    stream_twins = {
        "stream_turn_features": "turn_features",
        "stream_disorder_features": "turn_features",
        "stream_model_features": "turn_features",
        "stream_dedup": "dedup_exact",
        "stream_kmv": "kmv_distinct",
        "stream_role_audit": "role_sequence_audit",
        "stream_quality": "quality_checks",
        "stream_calibration": "calibration_bins",
        "stream_store_publish": "store_lifecycle",
        "stream_decay": "time_decay_rollup",
        "stream_heavy_hitters": "heavy_hitters",
        "stream_throttle": "throttle_audit",
    }
    streaming_gates = {
        s: {
            "harness_sec": times[s],
            "operator_only_sec": times.get(tw),
            "operator_twin": tw,
        }
        for s, tw in stream_twins.items()
        if s in times
    }

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline query wall time (flagship transcripts + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "flagship_turns": n_turns,
        "flagship_turns_per_sec": turns_per_sec,
        "flagship_runs_sec": flagship_runs,
        "flagship_bucketed_turns_per_sec": bucketed_tps,
        # ratio of minima: steal only ever INFLATES a sample, so each
        # side's min is its cleanest observed window and the ratio of mins
        # is the defensible layout claim (a burst inside one alternating
        # pair was observed to distort even per-pair ratios to 18x);
        # per-pair ratios stay published as same-window evidence
        "bucketed_over_plain": round(
            times["flagship_transcripts"] / min(bucketed_runs), 3
        ),
        "bucketed_runs_sec": bucketed_runs,
        "bucketed_pair_ratios": pair_ratios,
        "canary_range_sum_sec": {"start": canary_start, "end": canary_end},
        # self-qualifying artifact: all canary probes in order (suite start,
        # after each flagship block attempt, suite end); degraded=true means
        # NO flagship block got agreeing brackets and/or the suite-level
        # start/end probes disagree >1.5x — numbers then reflect VM steal,
        # not code
        "canaries_sec": canaries,
        "flagship_block_clean": flagship_block_clean,
        # WHICH alternating block was canary-clean (0-based; each block is
        # 3 plain/bucketed pairs, so its ratios are
        # pair_ratios[3*i : 3*i+3]) — dirty-block samples stay published
        # but a reader no longer has to reverse-engineer block boundaries
        "clean_attempt": clean_attempt,
        "clean_block_pair_ratios": (
            pair_ratios[3 * clean_attempt : 3 * clean_attempt + 3]
            if clean_attempt is not None else None
        ),
        "degraded": degraded,
        "streaming_gates": streaming_gates,
        # no silent caps: the two intrinsically-quadratic EXACT all-pairs
        # baselines run corpus-bounded in timing mode (their at-scale paths
        # are minhash_lsh_pairs / ann_lsh|ivf, benched uncapped)
        "caps": {
            "ngram_jaccard_pairs_docs": int(os.environ["SPARK_GRAFT_NGRAM_CAP"]),
            "embedding_dup_pairs_vecs": int(os.environ["SPARK_GRAFT_PAIRS_CAP"]),
        },
        "protocol": (
            "one Spark session local[{}] sf{}; every query forced end-to-end "
            "via noop write, timed adaptive min-of-2..4 (re-run until best "
            "two samples agree within 50%); flagship = warm-up then "
            "min over canary-BRACKETED alternating blocks (a block whose "
            "bracketing range-sum probes disagree >1.5x is retried, max 3 "
            "attempts) + 2 tail placements; bucketed flagship = "
            "pre-ingested bucketed+sorted table, timed strictly "
            "alternating with plain; bucketed_over_plain = ratio of "
            "per-side minima (steal only inflates, so each min is that "
            "side's cleanest window), per-pair ratios published (clean_block_pair_ratios identifies the canary-clean block's pairs; dirty-attempt pairs remain in the full arrays); "
            "degraded=true self-disqualifies the artifact (no clean "
            "flagship bracket and/or suite start/end canaries disagree "
            ">1.5x); streaming_gates pairs each harness cost with its "
            "batch-twin operator-only cost".format(cpus, sf)
        ),
    }))
    spark.stop()


def _ensure_bucketed_table(spark) -> None:
    table = "bench_transcripts_bucketed"
    if spark.catalog.tableExists(table):
        return
    from funcify_feature_eng_spark.sources.tables import ingest_bucketed

    # the in-memory catalog resets per session but the warehouse dir
    # persists — clear a stale location before re-ingesting
    import shutil

    loc = os.path.join(os.getcwd(), "spark-warehouse", table)
    shutil.rmtree(loc, ignore_errors=True)
    tr = spark.read.parquet(os.path.join(BENCH_DATA, "transcripts.parquet"))
    ingest_bucketed(tr, table, bucket_col="conv_id", n_buckets=32)


def _bucketed_job(spark):
    """(job, n_rows, restore) for the feature pass over the bucketed+sorted
    table (ingest untimed).

    ingest_bucketed writes ONE file per bucket, which makes it safe to let
    the scan report its sort order (spark.sql.legacy.bucketedTableScan.
    outputOrdering — off by default because multi-file buckets interleave
    their sorted runs): the window then needs neither the exchange NOR the
    sort. The conf stays set until ``restore()`` (the caller interleaves
    timed runs with the plain flagship)."""
    from funcify_feature_eng_spark.operators.asof import asof_join
    from funcify_feature_eng_spark.operators.windows import turn_features

    _ensure_bucketed_table(spark)
    fs = spark.read.parquet(os.path.join(BENCH_DATA, "feature_store.parquet"))
    bucketed = spark.read.table("bench_transcripts_bucketed")
    n = bucketed.count()

    def job():
        feats = turn_features(bucketed)
        return asof_join(
            feats, fs, on=["conv_id"], left_ts="ts", right_ts="value_at_ts",
            value_cols={"value": "asof_store_value"}, allow_exact_matches=False,
            right_order=["value"], strategy="broadcast",
        )

    conf_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prior = spark.conf.get(conf_key, "false")
    spark.conf.set(conf_key, "true")
    # assert the layout property the timing claims: zero hash exchange
    # AND zero sort on the transcript side (only the tiny store-side
    # agg exchange + broadcast remain)
    plan = job()._jdf.queryExecution().executedPlan().toString()
    assert "Sort [conv_id" not in plan, "bucketed scan failed to elide sort"
    _force(job())  # warm

    def restore():
        spark.conf.set(conf_key, prior)

    return job, n, restore


def run_single(cores: str) -> None:
    """Subprocess worker: flagship only, fixed input, print json."""
    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.datagen import ensure_dataset

    data_dir = os.path.join(BENCH_DATA, "scaling")
    ensure_dataset(data_dir, n_convs=N_CONVS_SCALING, seed=42, hot=HOT, n_files=64)
    spark = get_spark("bench-scaling", master=f"local[{cores}]")
    n_turns = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet")).count()
    _force(flagship(spark, data_dir))  # warm-up (JIT, page cache)
    dt = float("inf")
    for _ in range(2):  # min-of-2: suppress residual JIT/GC noise
        t0 = time.time()
        _force(flagship(spark, data_dir))
        dt = min(dt, time.time() - t0)
    print(json.dumps({"cores": int(cores), "sec": round(dt, 3),
                      "turns": n_turns, "turns_per_sec": round(n_turns / dt, 1)}))
    spark.stop()


def _cpu_ceiling() -> dict[int, float]:
    """Pure-CPU (GIL-free multiprocess) scaling of this VM — the hardware
    context for interpreting Spark scaling numbers."""
    import multiprocessing as mp_

    def _measure(procs: int, work: int = 12_000_000) -> float:
        per = work // procs * 8
        t0 = time.time()
        with mp_.Pool(procs) as p:
            p.map(_burn, [per] * procs)
        return time.time() - t0

    return {n: round(_measure(n), 2) for n in (2, 8, 32)}


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def run_scaling() -> None:
    # Interleave parallelism levels across 3 rounds and keep the per-level
    # minimum: the sandbox VM's available CPU drifts over minutes
    # (noisy-neighbor steal), and interleaving decorrelates that drift from
    # the core-count variable.
    results: dict[str, dict] = {}
    for _round in range(3):
        for cores in ("2", "8", "32"):
            out = subprocess.run(
                [sys.executable, __file__, "--single", cores],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            if cores not in results or rec["sec"] < results[cores]["sec"]:
                results[cores] = rec
    r2, r8, r32 = results["2"], results["8"], results["32"]
    eff = (r8["turns_per_sec"] / r2["turns_per_sec"]) / 4.0
    eff32 = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    cpu = _cpu_ceiling()
    cpu_eff_2_8 = (cpu[2] / cpu[8]) / 4.0
    cpu_eff_8_32 = (cpu[8] / cpu[32]) / 4.0
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Flagship workload: windowed turn features (lag / strict-prior ffill / gap /
sessionize / length, one window pass) + strictly-prior broadcast as-of store
join over {r8['turns']:,} transcript turns (Zipf conversation sizes + one
{HOT:,}-turn hot conversation). Same input at every parallelism level, fresh
JVM each, min of 2 timed runs after warm-up (sandbox proxy for N vs 4N
executors per driver instruction).

## Hardware context (this VM)

Pure-CPU multiprocess scaling (fixed total work, no Spark) shows the VM
itself cannot scale 8→32 efficiently — the virtualized CPU tops out well
below its 32 advertised vCPUs:

| procs | wall sec |
|---|---|
| 2  | {cpu[2]} |
| 8  | {cpu[8]} |
| 32 | {cpu[32]} |

Pure-CPU efficiency: 2→8 = {cpu_eff_2_8:.2f}, 8→32 = {cpu_eff_8_32:.2f}.
The honest N→4N pair on this hardware is therefore **local[2] vs local[8]**
(where the VM itself sustains near-linear scaling); local[32] is reported as
additional context.

## Flagship scaling

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[2]  (N)  | {r2['sec']} | {r2['turns_per_sec']:,} |
| local[8]  (4N) | {r8['sec']} | {r8['turns_per_sec']:,} |
| local[32] (context) | {r32['sec']} | {r32['turns_per_sec']:,} |

**Scaling efficiency (N→4N = local[2]→local[8]): {eff:.2f}** (target ≥ 0.8)
(8→32 context: {eff32:.2f} engine, {cpu_eff_8_32:.2f} pure-CPU in the same
window; past ~8–16 threads this single-VM job shifts from CPU-bound to
scan/shuffle-I/O-bound and the VM's effective cores drift with noisy
neighbors, so the 8→32 leg is not a reliable scaling signal here.)

Why it scales: the whole feature bundle costs ONE exchange (all window
features share a single partitionBy(conv_id) sort), the as-of store join is
broadcast (zero shuffle of the spine), input is a 64-file conv-contiguous
layout so scan parallelism isn't row-group-bound, and AQE handles the Zipf
skew. On a real cluster the same plan shards by executor count.
"""
    # preserve any hand-written sections after the scaling block (salting
    # head-to-head, growth-rate tables, ...): everything from the first
    # literal "## Hot-key" or "## Dedup" heading onward survives a refresh
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        for marker in ("## Hot-key", "## Dedup"):
            idx = old.find(marker)
            if idx != -1:
                tail = "\n" + old[idx:]
                break
    with open(path, "w") as f:
        f.write(md + tail)
    print(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    elif len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(sys.argv[2])
    else:
        run_default()
