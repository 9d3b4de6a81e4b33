"""Activity streaks — gaps-and-islands fold (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from funcify_feature_eng_spark.operators.funnel import activity_streaks

EPOCH = datetime(1970, 1, 1)


def _day(d, h=12):
    # midday of epoch day d — squarely inside the day bucket
    return EPOCH + timedelta(days=d, hours=h)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = activity_streaks(df, **kw).collect()
    return {
        r["user_id"]: (
            r["n_active"],
            r["n_islands"],
            r["longest_streak"],
            r["current_streak"],
            r["first_period"],
            r["last_period"],
        )
        for r in out
    }


def test_basic_islands(spark):
    rows = [
        # u1: days 0,1,2 then 5,6 then 10 — 3 islands, longest 3
        (1, _day(0)), (1, _day(1)), (1, _day(2)),
        (1, _day(5)), (1, _day(6)),
        (1, _day(10)),
        # u2: only day 10 (the global max) — current streak 1
        (2, _day(10)),
        # u3: days 8,9 — ends BEFORE the global max day 10 -> current 0
        (3, _day(8)), (3, _day(9)),
    ]
    got = _run(spark, rows)
    assert got == {
        1: (6, 3, 3, 1, 0, 10),
        2: (1, 1, 1, 1, 10, 10),
        3: (2, 1, 2, 0, 8, 9),
    }


def test_multiple_events_one_day_count_once(spark):
    rows = [(1, _day(3, h)) for h in (0, 5, 23)] + [(1, _day(4))]
    got = _run(spark, rows)
    assert got == {1: (2, 1, 2, 2, 3, 4)}


def test_as_of_pins_the_clock(spark):
    rows = [
        (1, _day(0)), (1, _day(1)),
        (1, _day(7)),              # after as_of 5 -> excluded entirely
        (2, _day(6)),              # entirely after as_of -> user absent
    ]
    got = _run(spark, rows, as_of_period=5)
    assert got == {1: (2, 1, 2, 0, 0, 1)}
    # as_of ON the user's last day: the final run is current
    got2 = _run(spark, rows, as_of_period=1)
    assert got2 == {1: (2, 1, 2, 2, 0, 1)}


def test_custom_period_weekly(spark):
    # weekly grid: days 0..6 are period 0, 7..13 period 1, 14..20 period 2
    rows = [(1, _day(0)), (1, _day(6)), (1, _day(8)), (1, _day(15))]
    got = _run(spark, rows, period_s=7 * 86400)
    assert got == {1: (3, 1, 3, 3, 0, 2)}


def test_null_rows_excluded(spark):
    rows = [(1, _day(0)), (None, _day(1)), (2, None)]
    got = _run(spark, rows)
    assert got == {1: (1, 1, 1, 1, 0, 0)}


def test_empty_input(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp")
    assert activity_streaks(df).count() == 0


def test_validation(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="period_s"):
        activity_streaks(df, period_s=0)


def test_python_twin_property(spark):
    # deterministic pseudo-random activity vs a pure-Python gaps-and-islands
    # twin, across users with diverse island shapes
    rows = []
    for u in range(1, 13):
        for d in range(40):
            if (u * 7919 + d * 104729) % 3 != 0:
                rows.append((u, _day(d)))
    got = _run(spark, rows)
    # twin
    by_user: dict[int, set] = {}
    for u, ts in rows:
        by_user.setdefault(u, set()).add((ts - EPOCH).days)
    global_max = max(d for ds in by_user.values() for d in ds)
    want = {}
    for u, ds in by_user.items():
        sd = sorted(d for d in ds if d <= global_max)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[u] = (
            len(sd),
            len(runs),
            max(runs),
            runs[-1] if sd[-1] == global_max else 0,
            sd[0],
            sd[-1],
        )
    assert got == want
