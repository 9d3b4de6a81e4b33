"""Kaplan-Meier survival (operators/survival.py)."""

from __future__ import annotations

import pytest

from funcify_feature_eng_spark.operators.survival import km_survival

E12 = 10**12


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "grp string, t long, e int")
    out = km_survival(df, duration_col="t", event_col="e", **kw).collect()
    key = (lambda r: (r["grp"], r["duration"])) if "group_by" in kw else (
        lambda r: r["duration"]
    )
    return {
        key(r): (r["n_risk"], r["n_event"], r["n_censored"], r["survival_e12"])
        for r in out
    }


def test_textbook_curve(spark):
    # classic: 5 subjects, events at 1,3,4; censored at 2; survivor to 5
    rows = [
        ("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 4, 1), ("a", 5, 0),
    ]
    got = _run(spark, rows)
    # S(1) = 4/5; S(3) = 4/5 * 2/3; S(4) = that * 1/2
    s1 = E12 * 4 // 5
    s3 = s1 * 2 // 3
    s4 = s3 * 1 // 2
    assert got == {
        1: (5, 1, 0, s1),
        2: (4, 0, 1, s1),       # censor-only row carries the running value
        3: (3, 1, 0, s3),
        4: (2, 1, 0, s4),
        5: (1, 0, 1, s4),
    }


def test_tie_convention_events_before_censor(spark):
    # event and censor at the SAME time: the censored subject is at risk
    rows = [("a", 1, 1), ("a", 1, 0), ("a", 2, 0)]
    got = _run(spark, rows)
    assert got[1] == (3, 1, 1, E12 * 2 // 3)
    assert got[2] == (1, 0, 1, E12 * 2 // 3)


def test_grouped_curves_independent(spark):
    rows = [("a", 1, 1), ("a", 2, 0), ("b", 1, 0), ("b", 2, 1)]
    got = _run(spark, rows, group_by=["grp"])
    assert got[("a", 1)] == (2, 1, 0, E12 // 2)
    assert got[("b", 1)] == (2, 0, 1, E12)
    assert got[("b", 2)] == (1, 1, 0, 0)


def test_all_censored_flat_curve(spark):
    rows = [("a", 1, 0), ("a", 5, 0)]
    got = _run(spark, rows)
    assert got == {1: (2, 0, 1, E12), 5: (1, 0, 1, E12)}


def test_null_rows_excluded(spark):
    rows = [("a", 1, 1), ("a", None, 1), ("a", 2, None)]
    got = _run(spark, rows)
    assert got == {1: (1, 1, 0, 0)}


def test_pinned_rounding_vs_python_twin(spark):
    # deterministic pseudo-random cohort; the pure-Python twin replays the
    # pinned integer fold — bit equality, not approx
    rows = []
    for i in range(200):
        t = (i * 7919) % 37 + 1
        e = 1 if (i * 104729) % 5 != 0 else 0
        rows.append(("a", t, e))
    got = _run(spark, rows)

    from collections import Counter

    d = Counter(t for _, t, e in rows if e)
    c = Counter(t for _, t, e in rows if not e)
    ts = sorted(set(d) | set(c))
    risk, s, want = len(rows), E12, {}
    for t in ts:
        if d[t]:
            s = s * (risk - d[t]) // risk
        want[t] = (risk, d[t], c[t], s)
        risk -= d[t] + c[t]
    assert got == want
