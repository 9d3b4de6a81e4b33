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
