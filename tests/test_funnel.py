"""Funnels + retention cohorts (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from funcify_feature_eng_spark.operators.funnel import (
    funnel_steps,
    retention_cohorts,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(h, m=0, s=0, us=0):
    return datetime(2024, 1, 1, h, m, s, us)


@pytest.fixture(scope="module")
def events(spark):
    # (event_id, user, type, ts)
    rows = [
        # u1: full conversion signup -> view -> purchase, in order
        (1, 1, "signup", _ts(0)),
        (2, 1, "view", _ts(1)),
        (3, 1, "purchase", _ts(2)),
        # u2: view BEFORE signup never counts; stops at step 1
        (10, 2, "view", _ts(0)),
        (11, 2, "signup", _ts(1)),
        # u3: signup -> purchase without view: purchase can't skip a step
        (20, 3, "signup", _ts(0)),
        (21, 3, "purchase", _ts(1)),
        # u4: no step-1 event at all -> absent from the output
        (30, 4, "view", _ts(0)),
        (31, 4, "purchase", _ts(1)),
        # u5: tie timestamps — view at the SAME ts as signup but a LATER
        # order id counts (strictly-after on the (ts, oid) tuple)
        (40, 5, "signup", _ts(0)),
        (41, 5, "view", _ts(0)),
        (42, 5, "purchase", _ts(0, 0, 1)),
        # u6: tie the other way — view shares signup's ts with an EARLIER
        # oid, so it precedes signup in tuple order and must NOT match
        (51, 6, "view", _ts(0)),
        (52, 6, "signup", _ts(0)),
        # u7: NULL ts row is excluded, the rest still convert 2 steps
        (60, 7, "signup", _ts(0)),
        (61, 7, "purchase", None),
        (62, 7, "view", _ts(1)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


STEPS = ["signup", "view", "purchase"]


def test_funnel_basic(spark, events):
    got = {
        r["user_id"]: (r["steps_completed"], r["ts_1"], r["ts_2"], r["ts_3"])
        for r in funnel_steps(events, STEPS).collect()
    }
    assert set(got) == {1, 2, 3, 5, 6, 7}  # u4 absent: no step-1 event
    assert got[1] == (3, _ts(0), _ts(1), _ts(2))
    assert got[2] == (1, _ts(1), None, None)
    assert got[3] == (1, _ts(0), None, None)
    assert got[5] == (3, _ts(0), _ts(0), _ts(0, 0, 1))
    assert got[6] == (1, _ts(0), None, None)
    assert got[7] == (2, _ts(0), _ts(1), None)


def test_funnel_window(spark):
    # u1 converts inside the window; u2's purchase lands past within_s OF
    # THE FIRST STEP (not of the previous step) and is cut
    rows = [
        (1, 1, "signup", _ts(0)),
        (2, 1, "view", _ts(0, 30)),
        (3, 1, "purchase", _ts(0, 59)),
        (10, 2, "signup", _ts(0)),
        (11, 2, "view", _ts(0, 50)),
        (12, 2, "purchase", _ts(1, 10)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(df, STEPS, within_s=3600).collect()
    }
    assert got == {1: 3, 2: 2}


def test_funnel_first_touch_no_reanchor(spark):
    # the EARLIEST signup anchors the window even though re-anchoring on
    # the second signup would convert fully — documented first-touch
    rows = [
        (1, 1, "signup", _ts(0)),
        (2, 1, "signup", _ts(5)),
        (3, 1, "view", _ts(5, 10)),
        (4, 1, "purchase", _ts(5, 20)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    [r] = funnel_steps(df, STEPS, within_s=3600).collect()
    assert (r["steps_completed"], r["ts_1"]) == (1, _ts(0))
    # without the window the same stream converts (later events qualify)
    [r2] = funnel_steps(df, STEPS).collect()
    assert r2["steps_completed"] == 3


def test_funnel_validation(spark, events):
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(events, ["view", "view"])
    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(events, [])
    with pytest.raises(ValueError, match="within_s"):
        funnel_steps(events, STEPS, within_s=0)


@pytest.fixture(scope="module")
def activity(spark):
    day = 86400
    rows = [
        # cohort period 0 (first event in days 0-6): users 1, 2
        (1, datetime(1970, 1, 2)),   # day 1 -> period 0
        (1, datetime(1970, 1, 9)),   # day 8 -> period 1
        (1, datetime(1970, 1, 16)),  # day 15 -> period 2
        (2, datetime(1970, 1, 3)),   # period 0
        (2, datetime(1970, 1, 17)),  # period 2 (skips period 1)
        # cohort period 1: user 3
        (3, datetime(1970, 1, 9)),
        (3, datetime(1970, 1, 10)),  # same period: distinct-pair dedup
        (3, datetime(1970, 1, 16)),  # period 2 -> offset 1
        # NULL user / NULL ts excluded
        (None, datetime(1970, 1, 2)),
        (9, None),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_retention_cohorts(spark, activity):
    got = {
        (r["cohort"], r["offset"]): (r["n_active"], r["cohort_size"])
        for r in retention_cohorts(activity, period_s=7 * 86400).collect()
    }
    assert got == {
        (0, 0): (2, 2),
        (0, 1): (1, 2),
        (0, 2): (2, 2),
        (1, 0): (1, 1),
        (1, 1): (1, 1),
    }


def test_retention_validation(spark, activity):
    with pytest.raises(ValueError, match="period_s"):
        retention_cohorts(activity, period_s=0)


class TestTokenBucketAudit:
    def _brute(self, events, cap, rate_num, rate_den_s, cost):
        # events: list of (entity, t_us, order, eid) — replay per entity
        import collections

        unit = rate_den_s * 1_000_000
        cap_u, cost_u = cap * unit, cost * unit
        out = {}
        by_e = collections.defaultdict(list)
        for e, t, o, i in events:
            by_e[e].append((t, o, i))
        for e, evs in by_e.items():
            tok, prev = cap_u, None
            for t, o, i in sorted(evs):
                avail = min(cap_u, tok + (0 if prev is None else (t - prev) * rate_num))
                adm = avail >= cost_u
                tok = avail - cost_u if adm else avail
                prev = t
                out[i] = (adm, tok)
        return out

    def test_matches_bruteforce(self, spark):
        import random

        from pyspark.sql import functions as SF

        from funcify_feature_eng_spark.operators.throttle import (
            token_bucket_audit,
        )

        rng = random.Random(17)
        events = []
        eid = 0
        for e in range(5):
            t = 0
            for _ in range(60):
                t += rng.randrange(0, 120) * 1_000_000
                events.append((e, t, eid, eid))
                eid += 1
        df = spark.createDataFrame(
            [(e, t // 1_000_000, o, i) for e, t, o, i in events],
            ["ent", "tsec", "o", "eid"],
        ).select(
            "ent", SF.timestamp_seconds(SF.col("tsec")).alias("ts"), "o", "eid"
        )
        got = {
            r["eid"]: (r["admitted"], r["tokens_after_e6den"])
            for r in token_bucket_audit(
                df, entity_col="ent", ts_col="ts", order_col="o",
                id_cols=["eid"], cap=5, rate_num=1, rate_den_s=60,
            ).collect()
        }
        exp = self._brute(events, 5, 1, 60, 1)
        assert got == exp

    def test_burst_then_refill(self, spark):
        from pyspark.sql import functions as SF

        from funcify_feature_eng_spark.operators.throttle import (
            token_bucket_audit,
        )

        # 4 instant events on cap=2: first 2 admitted; after 60s one
        # token refills -> 5th admitted
        rows = [(1, 0, i, i) for i in range(4)] + [(1, 60, 4, 4)]
        df = spark.createDataFrame(rows, ["ent", "tsec", "o", "eid"]).select(
            "ent", SF.timestamp_seconds(SF.col("tsec")).alias("ts"), "o", "eid"
        )
        got = {
            r["eid"]: r["admitted"]
            for r in token_bucket_audit(
                df, entity_col="ent", ts_col="ts", order_col="o",
                id_cols=["eid"], cap=2, rate_num=1, rate_den_s=60,
            ).collect()
        }
        assert got == {0: True, 1: True, 2: False, 3: False, 4: True}


class TestStateDwellTimes:
    def test_exact_dwell(self, spark):
        from pyspark.sql import functions as SF

        from funcify_feature_eng_spark.operators.windows import (
            state_dwell_times,
        )

        # entity 1: a(0) -> b(10) -> a(25) -> end(40, excluded as last)
        rows = [(1, 0, 0, "a"), (1, 10, 1, "b"), (1, 25, 2, "a"),
                (1, 40, 3, "end"), (2, 0, 4, "b"), (2, 7, 5, "end")]
        df = spark.createDataFrame(rows, ["ent", "tsec", "o", "st"]).select(
            "ent", SF.timestamp_seconds(SF.col("tsec")).alias("ts"), "o", "st"
        )
        got = {
            r["state"]: (r["n_spells"], r["total_dwell_us"], r["mean_dwell_us"])
            for r in state_dwell_times(
                df, entity_col="ent", ts_col="ts", order_col="o",
                state_col="st",
            ).collect()
        }
        assert got["a"] == (2, 25_000_000, 12_500_000)
        assert got["b"] == (2, 22_000_000, 11_000_000)
        assert "end" not in got
