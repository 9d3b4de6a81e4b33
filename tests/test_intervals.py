"""Validity-interval (range) join: strategy value-identity, half-open
semantics, bucket-width invariance, left-join NULL survival, and a
BroadcastNestedLoopJoin absence check on the bucket plan.

Reference anchor: the reference's temporal alignment is the point-in-time
@lastUpdated lookup (funcify-feature-eng materializer); containment joins
are the sibling primitive it leaves to the caller — see
operators/intervals.py module docstring.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.intervals import (
    interval_join,
    session_windows,
)
from funcify_feature_eng_spark.operators.windows import session_id

UTC = dt.timezone.utc


def _ts(s: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(1_700_000_000 + s, tz=UTC)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        ("e1", "u1", _ts(10)),
        ("e2", "u1", _ts(100)),
        ("e3", "u1", _ts(3600)),   # boundary cases below
        ("e4", "u2", _ts(50)),
        ("e5", "u2", _ts(7200)),   # covered by nothing
    ]
    return spark.createDataFrame(rows, "event_id string, user_id string, ts timestamp")


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        # u1: two overlapping windows — e2 (ts=100) is inside both
        ("u1", "w1", _ts(0), _ts(200)),
        ("u1", "w2", _ts(50), _ts(4000)),
        # u1: end exactly at e3's ts=3600 — half-open, must NOT match e3
        ("u1", "w3", _ts(3000), _ts(3600)),
        # u2: covers e4 only
        ("u2", "w4", _ts(0), _ts(60)),
        # empty interval (end <= start) — dropped up front
        ("u2", "w5", _ts(100), _ts(100)),
    ]
    return spark.createDataFrame(
        rows, "user_id string, win string, valid_from timestamp, valid_to timestamp"
    )


def _pairs(df) -> set[tuple]:
    return {tuple(r) for r in df.select("event_id", "win").collect()}


EXPECTED = {
    ("e1", "w1"),
    ("e2", "w1"),
    ("e2", "w2"),
    ("e3", "w2"),  # ts=3600 < w2.end=4000
    ("e4", "w4"),
}


@pytest.mark.parametrize("strategy", ["broadcast", "bucket"])
def test_containment_and_halfopen(spark, facts, intervals, strategy):
    out = interval_join(facts, intervals, on="user_id", strategy=strategy)
    assert _pairs(out) == EXPECTED
    # e3 vs w3 is the half-open pin: ts == end must not match
    assert ("e3", "w3") not in _pairs(out)


@pytest.mark.parametrize("bucket_s", [7, 100, 3600, 86400])
def test_bucket_width_invariance(spark, facts, intervals, bucket_s):
    """The bucket grid is a physical layout choice only — any width gives
    the same matched pairs, each exactly once (no dedup step exists)."""
    out = interval_join(
        facts, intervals, on="user_id", strategy="bucket", bucket_s=bucket_s
    )
    rows = out.select("event_id", "win").collect()
    assert len(rows) == len(EXPECTED)  # exactly-once: no duplicate pairs
    assert {tuple(r) for r in rows} == EXPECTED


def test_left_join_null_payload(spark, facts, intervals):
    out = interval_join(facts, intervals, on="user_id", how="left")
    e5 = out.filter(F.col("event_id") == "e5").collect()
    assert len(e5) == 1 and e5[0]["win"] is None
    # matched rows unchanged
    assert _pairs(out.filter(F.col("win").isNotNull())) == EXPECTED


def test_left_join_null_bearing_fact_columns(spark, facts, intervals):
    """Regression: the FeatureModel spine accumulates NULL-able feature
    columns before the interval feature — a matched fact row carrying a
    NULL column must appear ONCE per covering interval, never again with
    NULL payload (the old null-unsafe anti-join emitted it twice)."""
    facts_n = facts.withColumn(
        "feat",
        F.when(F.col("event_id").isin("e1", "e5"), F.lit(None).cast("string"))
        .otherwise(F.lit("x")),
    )
    out = interval_join(facts_n, intervals, on="user_id", how="left")
    rows = out.collect()
    # e1 (NULL feat, matched by w1): exactly one row, payload attached
    e1 = [r for r in rows if r["event_id"] == "e1"]
    assert len(e1) == 1 and e1[0]["win"] == "w1"
    # e5 (NULL feat, unmatched): exactly one row, NULL payload
    e5 = [r for r in rows if r["event_id"] == "e5"]
    assert len(e5) == 1 and e5[0]["win"] is None
    # total row count: matched pairs + the single unmatched fact
    assert len(rows) == len(EXPECTED) + 1


def test_bucket_plan_is_hash_join(spark, facts, intervals):
    out = interval_join(facts, intervals, on="user_id", strategy="bucket")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_invalid_args(spark, facts, intervals):
    with pytest.raises(ValueError):
        interval_join(facts, intervals, on="user_id", how="full")
    with pytest.raises(ValueError):
        interval_join(facts, intervals, on="user_id", strategy="sort")


def test_session_windows_margin_overlap(spark):
    """Two sessions 2000s apart with a 3600s margin overlap; margin=0 does
    not. An event in the inter-session gap multi-matches only with margin."""
    rows = [
        ("u1", "a", _ts(0)),
        ("u1", "b", _ts(100)),
        # gap of 2000s > 1800 threshold -> new session
        ("u1", "c", _ts(2100)),
        ("u1", "d", _ts(2200)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_id string, ts timestamp")
    g = ev.withColumn(
        "session_id", session_id("ts", ["user_id"], ["ts", "event_id"], 1800.0)
    )
    tight = session_windows(g, on="user_id", ts="ts", margin_s=0)
    wide = session_windows(g, on="user_id", ts="ts", margin_s=3600)
    assert tight.count() == 2 and wide.count() == 2

    joined = interval_join(
        g.select("event_id", "user_id", "ts"),
        wide.withColumnRenamed("session_id", "ctx"),
        on="user_id",
        strategy="bucket",
        bucket_s=600,
    )
    per_event = {
        r["event_id"]: r["n"]
        for r in joined.groupBy("event_id").agg(F.count("*").alias("n")).collect()
    }
    # with +-1h margin every event sits inside BOTH widened windows
    assert per_event == {"a": 2, "b": 2, "c": 2, "d": 2}

    tight_joined = interval_join(
        g.select("event_id", "user_id", "ts"),
        tight.withColumnRenamed("session_id", "ctx"),
        on="user_id",
        strategy="broadcast",
    )
    tight_counts = {
        r["event_id"]: r["n"]
        for r in tight_joined.groupBy("event_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # margin=0: valid_to == max ts is EXCLUSIVE, so the last event of each
    # session falls out — the documented half-open consequence
    assert tight_counts == {"a": 1, "c": 1}


# ---------------------------------------------------------------------------
# scd2_from_changes: the builder side of the containment pair
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def change_log(spark):
    rows = [
        ("u1", _ts(0), "A", 1),
        ("u1", _ts(10), "A", 2),    # unchanged -> merges into the A run
        ("u1", _ts(20), "B", 3),
        ("u1", _ts(20), "C", 4),    # same instant: max-seq (C) wins
        ("u1", _ts(30), "C", 5),    # unchanged after C
        ("u1", _ts(40), "A", 6),    # state may RECUR in a new epoch
        ("u2", _ts(5), "X", 7),
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, state string, seq int"
    )


def test_scd2_epochs(spark, change_log):
    from funcify_feature_eng_spark.operators.intervals import scd2_from_changes

    base = 1_700_000_000_000_000
    ep = (
        scd2_from_changes(
            change_log, on="k", ts="ts", state_cols=["state"], order=["seq"]
        )
        .select(
            "k", "state",
            ((F.unix_micros("valid_from") - base) / 1e6).alias("f"),
            ((F.unix_micros("valid_to") - base) / 1e6).alias("t"),
        )
        .orderBy("k", "f")
    )
    got = [(r.k, r.state, r.f, r.t) for r in ep.collect()]
    assert got == [
        ("u1", "A", 0.0, 20.0),
        ("u1", "C", 20.0, 40.0),
        ("u1", "A", 40.0, None),
        ("u2", "X", 5.0, None),
    ]


def test_scd2_no_collapse_keeps_every_instant(spark, change_log):
    from funcify_feature_eng_spark.operators.intervals import scd2_from_changes

    ep = scd2_from_changes(
        change_log, on="k", ts="ts", state_cols=["state"], order=["seq"],
        collapse_unchanged=False,
    )
    # 6 distinct (k, ts) instants survive (the two t=20 rows collapse to one)
    assert ep.count() == 6
    # adjacent epochs tile the timeline: valid_to == next valid_from
    rows = sorted(ep.collect(), key=lambda r: (r.k, r.valid_from))
    u1 = [r for r in rows if r.k == "u1"]
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    assert u1[-1].valid_to is None


def test_scd2_single_exchange_plan(spark, change_log):
    from funcify_feature_eng_spark.operators.intervals import scd2_from_changes

    ep = scd2_from_changes(
        change_log, on="k", ts="ts", state_cols=["state"], order=["seq"]
    )
    plan = ep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_scd2_point_read_equals_asof(spark, change_log):
    """Cross-operator consistency: reading the built SCD-2 table at a point
    in time via interval_join must equal the as-of join straight against the
    change log — two independent engine paths, one answer."""
    from funcify_feature_eng_spark.operators.asof import asof_join
    from funcify_feature_eng_spark.operators.intervals import (
        interval_join,
        scd2_from_changes,
    )

    probes = spark.createDataFrame(
        [("p%d" % i, k, _ts(s)) for i, (k, s) in enumerate(
            [("u1", 0), ("u1", 5), ("u1", 19.999), ("u1", 20), ("u1", 39),
             ("u1", 40), ("u1", 1000), ("u2", 4), ("u2", 5), ("u2", 99)]
        )],
        "probe_id string, k string, ts timestamp",
    )
    ep = scd2_from_changes(
        change_log, on="k", ts="ts", state_cols=["state"], order=["seq"]
    ).withColumn("valid_to", F.coalesce("valid_to", F.lit(_ts(2000))))
    via_intervals = {
        r.probe_id: r.state
        for r in interval_join(
            probes, ep, on="k", ts="ts", strategy="bucket", bucket_s=7,
            how="left",
        ).collect()
    }
    # asof twin: dedupe same-instant changes by max seq (the builder's rule)
    via_asof = {
        r.probe_id: r.state
        for r in asof_join(
            probes, change_log, on=["k"], left_ts="ts", right_ts="ts",
            value_cols={"state": "state"}, allow_exact_matches=True,
            right_order=["seq"],
        ).collect()
    }
    assert via_intervals == via_asof
    assert via_intervals["p6"] == "A" and via_intervals["p2"] == "A"


def test_bucket_span_guard_raises(spark, facts):
    """An effectively-unbounded interval must fail loudly, not explode to
    millions of bucket rows."""
    from pyspark.errors import SparkRuntimeException

    wide = spark.createDataFrame(
        [("u1", _ts(0), _ts(10**9), "open")],
        "user_id string, valid_from timestamp, valid_to timestamp, state string",
    )
    with pytest.raises(SparkRuntimeException, match="interval_join"):
        interval_join(
            facts, wide, on="user_id", ts="ts", strategy="bucket", bucket_s=60
        ).collect()


# ---------------------------------------------------------------------------
# open epochs (NULL valid_to), disjointness guard, plan-layer exposure
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scd2_store(spark):
    """Disjoint SCD-2 epochs with an OPEN current epoch per key."""
    rows = [
        ("u1", _ts(0), _ts(20), "A"),
        ("u1", _ts(20), _ts(40), "C"),
        ("u1", _ts(40), None, "A"),
        ("u2", _ts(5), None, "X"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, valid_from timestamp, valid_to timestamp, state string"
    )


@pytest.mark.parametrize("strategy", ["broadcast", "bucket"])
def test_open_epoch_matches(spark, scd2_store, strategy):
    probes = spark.createDataFrame(
        [("p1", "u1", _ts(10)), ("p2", "u1", _ts(39)), ("p3", "u1", _ts(10**7)),
         ("p4", "u2", _ts(4)), ("p5", "u2", _ts(10**7))],
        "probe_id string, user_id string, ts timestamp",
    )
    out = interval_join(
        probes, scd2_store, on="user_id", strategy=strategy, bucket_s=10,
        how="left", null_end_is_open=True,
    )
    got = {r.probe_id: r.state for r in out.collect()}
    assert got == {"p1": "A", "p2": "C", "p3": "A", "p4": None, "p5": "X"}
    assert out.count() == 5  # one open epoch per key -> no fan-out


def test_guarded_disjoint_passes_and_raises(spark, scd2_store):
    from pyspark.errors import SparkRuntimeException

    from funcify_feature_eng_spark.operators.intervals import guarded_disjoint

    # disjoint (incl. trailing open epoch): passes untouched
    ok = guarded_disjoint(scd2_store, on="user_id")
    assert ok.count() == 4

    bad = scd2_store.unionByName(
        spark.createDataFrame(
            [("u1", _ts(30), _ts(50), "Z")],
            "user_id string, valid_from timestamp, valid_to timestamp, state string",
        )
    )
    with pytest.raises(SparkRuntimeException, match="guarded_disjoint"):
        guarded_disjoint(bad, on="user_id").collect()


def test_plan_layer_interval_feature(spark, change_log):
    """declare_interval_feature over a built SCD-2 store must equal
    declare_asof_feature straight against the change log (both through the
    declarative layer), and an overlapping store must raise."""
    from pyspark.errors import SparkRuntimeException

    from funcify_feature_eng_spark.operators.intervals import scd2_from_changes
    from funcify_feature_eng_spark.plans.model import FeatureModel

    spine = spark.createDataFrame(
        [("u1", i, _ts(t)) for i, t in enumerate([0, 15, 20, 35, 41, 500])]
        + [("u2", 0, _ts(4)), ("u2", 1, _ts(6))],
        "k string, turn_idx int, ts timestamp",
    )
    epochs = scd2_from_changes(
        change_log, on="k", ts="ts", state_cols=["state"], order=["seq"]
    )

    m = FeatureModel(entity_key="k", order=("turn_idx", "ts"), event_time="ts")
    m.register_store("epochs", epochs)
    m.declare_interval_feature("status", "epochs", value_col="state",
                               params={"bucket_s": 10})
    got = m.materialize(spine, ["k", "turn_idx", "status"])

    m2 = FeatureModel(entity_key="k", order=("turn_idx", "ts"), event_time="ts")
    m2.register_store("log", change_log, last_updated="ts")
    m2.declare_asof_feature("status", "log", value_col="state",
                            right_order=["seq"])
    want = m2.materialize(spine, ["k", "turn_idx", "status"])
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    overlapping = epochs.unionByName(
        spark.createDataFrame(
            [("u1", _ts(25), _ts(26), "Q")],
            "k string, valid_from timestamp, valid_to timestamp, state string",
        ).select("k", "state", "valid_from", "valid_to")
    )
    m3 = FeatureModel(entity_key="k", order=("turn_idx", "ts"), event_time="ts")
    m3.register_store("epochs", overlapping)
    m3.declare_interval_feature("status", "epochs", value_col="state")
    with pytest.raises(SparkRuntimeException, match="guarded_disjoint"):
        m3.materialize(spine, ["k", "status"]).collect()


def test_plan_layer_asof_tolerance_and_strategy(spark, change_log):
    """tolerance_s + strategy pass through declare_asof_feature."""
    from funcify_feature_eng_spark.plans.model import FeatureModel

    spine = spark.createDataFrame(
        [("u1", 0, _ts(21)), ("u1", 1, _ts(500))],
        "k string, turn_idx int, ts timestamp",
    )
    m = FeatureModel(entity_key="k", order=("turn_idx", "ts"), event_time="ts")
    m.register_store("log", change_log, last_updated="ts")
    m.declare_asof_feature("status", "log", value_col="state",
                           right_order=["seq"], strategy="broadcast",
                           tolerance_s=60.0)
    got = {r.turn_idx: r.status
           for r in m.materialize(spine, ["turn_idx", "status"]).collect()}
    # ts=21: last change at 20 (gap 1s <= 60) -> C; ts=500: last at 40,
    # gap 460s > 60 -> stale, NULL
    assert got == {0: "C", 1: None}


def test_left_join_dotted_fact_column_name(spark, facts, intervals):
    """Regression: a fact column whose NAME contains a dot (legal in Spark)
    must survive the null-safe anti-join — string-path F.col would parse it
    as a nested reference."""
    facts_d = facts.withColumn("a.b", F.lit("v"))
    out = interval_join(facts_d, intervals, on="user_id", how="left")
    rows = out.collect()
    assert len(rows) == len(EXPECTED) + 1  # e5 unmatched, once
    assert all(r["a.b"] == "v" for r in rows)


# ---------------------------------------------------------------------------
# scd2_apply_changes: incremental CDC merge onto an existing table
# ---------------------------------------------------------------------------


def _epochs(df):
    return sorted(map(tuple, df.select("k", "state", "valid_from", "valid_to").collect()))


def test_scd2_apply_equals_whole_log(spark, change_log):
    from funcify_feature_eng_spark.operators.intervals import (
        scd2_apply_changes,
        scd2_from_changes,
    )

    log = change_log.select("k", "ts", "state")
    b1 = log.where(F.col("ts") < _ts(20))
    b2 = log.where(F.col("ts") >= _ts(20))
    whole = scd2_from_changes(log, on="k", state_cols=["state"])
    cur = scd2_from_changes(b1, on="k", state_cols=["state"])
    inc = scd2_apply_changes(cur, b2, on="k", state_cols=["state"])
    assert _epochs(inc) == _epochs(whole)


def test_scd2_apply_unchanged_state_does_not_cut_epoch(spark):
    from funcify_feature_eng_spark.operators.intervals import (
        scd2_apply_changes,
        scd2_from_changes,
    )

    cur = scd2_from_changes(
        spark.createDataFrame([("u1", _ts(0), "A")], "k string, ts timestamp, state string"),
        on="k", state_cols=["state"],
    )
    ch = spark.createDataFrame([("u1", _ts(50), "A")], "k string, ts timestamp, state string")
    out = scd2_apply_changes(cur, ch, on="k", state_cols=["state"])
    rows = _epochs(out)
    assert len(rows) == 1 and rows[0][1] == "A" and rows[0][3] is None


def test_scd2_apply_untouched_keys_pass_through_and_new_keys_appear(spark, change_log):
    from funcify_feature_eng_spark.operators.intervals import (
        scd2_apply_changes,
        scd2_from_changes,
    )

    cur = scd2_from_changes(change_log.select("k", "ts", "state"),
                            on="k", state_cols=["state"])
    ch = spark.createDataFrame(
        [("u3", _ts(100), "Z"), ("u1", _ts(100), "Q")],
        "k string, ts timestamp, state string",
    )
    out = scd2_apply_changes(cur, ch, on="k", state_cols=["state"])
    by_key = {}
    for k, st, vf, vt in _epochs(out):
        by_key.setdefault(k, []).append((st, vt))
    # u2 untouched, u3 new with one open epoch, u1 gains a Q epoch
    assert by_key["u2"] == [("X", None)]
    assert by_key["u3"] == [("Z", None)]
    assert by_key["u1"][-1] == ("Q", None)


def test_scd2_apply_late_change_errors_or_drops(spark):
    from funcify_feature_eng_spark.operators.intervals import (
        scd2_apply_changes,
        scd2_from_changes,
    )

    cur = scd2_from_changes(
        spark.createDataFrame([("u1", _ts(100), "A")], "k string, ts timestamp, state string"),
        on="k", state_cols=["state"],
    )
    late = spark.createDataFrame([("u1", _ts(50), "B")], "k string, ts timestamp, state string")
    with pytest.raises(Exception, match="latest epoch boundary"):
        scd2_apply_changes(cur, late, on="k", state_cols=["state"]).collect()
    out = scd2_apply_changes(cur, late, on="k", state_cols=["state"],
                             on_late="ignore")
    rows = _epochs(out)
    assert len(rows) == 1 and rows[0][:2] == ("u1", "A") and rows[0][3] is None


def test_scd2_apply_late_change_on_terminated_key_guarded(spark):
    """A key whose every epoch is CLOSED (terminated) must still reject a
    change landing inside its closed history — the open-epoch-only bound
    treated it as brand-new and rebuilt an overlapping epoch. A change at
    or after the last valid_to reopens the key cleanly."""
    from funcify_feature_eng_spark.operators.intervals import scd2_apply_changes

    cur = spark.createDataFrame(
        [("u1", "A", _ts(0), _ts(100)), ("u1", "B", _ts(100), _ts(200))],
        "k string, state string, valid_from timestamp, valid_to timestamp",
    )
    inside = spark.createDataFrame(
        [("u1", _ts(50), "C")], "k string, ts timestamp, state string"
    )
    with pytest.raises(Exception, match="latest epoch boundary"):
        scd2_apply_changes(cur, inside, on="k", state_cols=["state"]).collect()
    ok = spark.createDataFrame(
        [("u1", _ts(250), "C")], "k string, ts timestamp, state string"
    )
    rows = sorted(
        (r["state"], r["valid_from"], r["valid_to"])
        for r in scd2_apply_changes(
            cur, ok, on="k", state_cols=["state"]
        ).collect()
    )
    # closed history untouched; the key reopens at t=250 with no overlap
    assert [s for s, *_ in rows] == ["A", "B", "C"]
    assert rows[2][1] == _ts(250).replace(tzinfo=None) and rows[2][2] is None


class TestConcurrencyProfile:
    def _brute(self, iv, bucket_fn):
        # oracle: evaluate open-count at every sweep-event instant
        import collections

        events = []
        for s, e in iv:
            events.append((s, 1))
            events.append((e, -1))
        events.sort(key=lambda x: (x[0], x[1]))
        per_bucket = collections.defaultdict(lambda: [0, 0, 0])  # peak, starts, ends
        open_n = 0
        seen = set()
        for t, d in events:
            b = bucket_fn(t)
            if b not in seen:
                # the carry-in level holds before the bucket's first event
                # and is itself a candidate peak (an all-ends bucket
                # peaked at its carry)
                seen.add(b)
                per_bucket[b][0] = open_n
            open_n += d
            per_bucket[b][0] = max(per_bucket[b][0], open_n)
            if d == 1:
                per_bucket[b][1] += 1
            else:
                per_bucket[b][2] += 1
        return {b: tuple(v) for b, v in per_bucket.items()}

    def test_matches_bruteforce_sweep(self, spark):
        import datetime as dt
        import random

        from funcify_feature_eng_spark.operators.intervals import (
            concurrency_profile,
        )

        rng = random.Random(42)
        base = dt.datetime(2024, 1, 1)
        iv = []
        for _ in range(400):
            s = base + dt.timedelta(minutes=rng.randrange(0, 60 * 24 * 7))
            e = s + dt.timedelta(minutes=rng.randrange(1, 60 * 30))
            iv.append((s, e))
        # adversarial: end == start of another (half-open: NOT concurrent)
        iv.append((base, base + dt.timedelta(hours=1)))
        iv.append((base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)))
        df = spark.createDataFrame(iv, ["s", "e"])
        got = {
            r["bucket_ts"]: (r["max_concurrent"], r["n_starts"], r["n_ends"])
            for r in concurrency_profile(
                df, start_col="s", end_col="e", bucket="day"
            ).collect()
        }
        exp = self._brute(
            iv, lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0)
        )
        assert got == exp

    def test_half_open_touching_intervals_not_concurrent(self, spark):
        import datetime as dt

        from funcify_feature_eng_spark.operators.intervals import (
            concurrency_profile,
        )

        b = dt.datetime(2024, 5, 1)
        df = spark.createDataFrame(
            [(b, b + dt.timedelta(hours=1)),
             (b + dt.timedelta(hours=1), b + dt.timedelta(hours=2))],
            ["s", "e"],
        )
        rows = concurrency_profile(df, start_col="s", end_col="e").collect()
        assert len(rows) == 1 and rows[0]["max_concurrent"] == 1

    def test_carry_across_buckets(self, spark):
        import datetime as dt

        from funcify_feature_eng_spark.operators.intervals import (
            concurrency_profile,
        )

        b = dt.datetime(2024, 5, 1)
        # one interval spans 3 days; a second joins on day 3
        df = spark.createDataFrame(
            [(b, b + dt.timedelta(days=2, hours=5)),
             (b + dt.timedelta(days=2, hours=1), b + dt.timedelta(days=2, hours=2))],
            ["s", "e"],
        )
        got = {
            str(r["bucket_ts"].date()): r["max_concurrent"]
            for r in concurrency_profile(df, start_col="s", end_col="e").collect()
        }
        assert got == {"2024-05-01": 1, "2024-05-03": 2}

    def test_all_ends_bucket_peaks_at_carry(self, spark):
        import datetime as dt

        from funcify_feature_eng_spark.operators.intervals import (
            concurrency_profile,
        )

        b = dt.datetime(2024, 5, 1)
        # 3 sessions open Monday, ALL ending Tuesday at distinct instants
        # with no Tuesday starts: Tuesday's within-bucket running sums are
        # -1,-2,-3, but 3 sessions were simultaneously open before the
        # first end — the peak is the carry-in, not carry + max(run)
        df = spark.createDataFrame(
            [(b, b + dt.timedelta(days=1, hours=h)) for h in (1, 2, 3)],
            ["s", "e"],
        )
        got = {
            str(r["bucket_ts"].date()): r["max_concurrent"]
            for r in concurrency_profile(df, start_col="s", end_col="e").collect()
        }
        assert got == {"2024-05-01": 3, "2024-05-02": 3}


def test_concurrency_profile_null_endpoints_dropped(spark):
    import datetime as dt

    from funcify_feature_eng_spark.operators.intervals import (
        concurrency_profile,
    )

    b = dt.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(b, b + dt.timedelta(hours=1)), (None, b + dt.timedelta(hours=2)),
         (b, None)],
        "s: timestamp, e: timestamp",
    )
    rows = concurrency_profile(df, start_col="s", end_col="e").collect()
    assert len(rows) == 1
    assert rows[0]["n_starts"] == 1 and rows[0]["n_ends"] == 1
