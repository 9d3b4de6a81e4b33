"""Touch attribution (operators/attribution.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from funcify_feature_eng_spark.operators.attribution import attribute_conversions

T = ["email", "ad"]
C = ["purchase"]


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = attribute_conversions(
        df, touch_types=T, conversion_types=C, **kw
    ).collect()
    return {r["conversion_id"]: (r["touch_type"], r["touch_ts"]) for r in out}


BASIC = [
    (1, 1, "email", _ts(0)),
    (2, 1, "ad", _ts(2)),
    (3, 1, "purchase", _ts(3)),     # last: ad@2, first: email@0
    (4, 1, "purchase", _ts(4)),     # same touches
    (10, 2, "purchase", _ts(1)),    # no prior touch -> NULL
    (11, 2, "email", _ts(2)),       # later touch never credits backwards
]


def test_last_touch_basic(spark):
    got = _run(spark, BASIC, model="last_touch")
    assert got == {
        3: ("ad", _ts(2)),
        4: ("ad", _ts(2)),
        10: (None, None),
    }


def test_first_touch_basic(spark):
    got = _run(spark, BASIC, model="first_touch")
    assert got == {
        3: ("email", _ts(0)),
        4: ("email", _ts(0)),
        10: (None, None),
    }


def test_tie_timestamps_strict_before(spark):
    rows = [
        (5, 1, "email", _ts(1)),        # same ts as conversion, SMALLER oid
        (6, 1, "purchase", _ts(1)),     # credits email (strictly before in tuple order)
        (8, 2, "purchase", _ts(1)),     # same ts, touch has LARGER oid
        (9, 2, "email", _ts(1)),        # -> not before, no credit
    ]
    for model in ("last_touch", "first_touch"):
        got = _run(spark, rows, model=model)
        assert got[6] == ("email", _ts(1)), model
        assert got[8] == (None, None), model
    # the explicit-guard lookback paths pin the same tuple semantics
    got = _run(spark, rows, model="first_touch", lookback_s=3600)
    assert got[6] == ("email", _ts(1)) and got[8] == (None, None)
    got = _run(spark, rows, model="last_touch", lookback_s=3600)
    assert got[6] == ("email", _ts(1)) and got[8] == (None, None)


def test_last_touch_lookback(spark):
    rows = [
        (1, 1, "email", _ts(0)),
        (2, 1, "purchase", _ts(0, 30)),   # inside 1h lookback
        (3, 1, "purchase", _ts(2)),       # email is 2h stale -> NULL, not
                                          # "next older touch" (there is none)
    ]
    got = _run(spark, rows, model="last_touch", lookback_s=3600)
    assert got == {2: ("email", _ts(0)), 3: (None, None)}


def test_first_touch_lookback_window_slides(spark):
    rows = [
        (1, 1, "email", _ts(0)),
        (2, 1, "ad", _ts(2)),
        (3, 1, "purchase", _ts(2, 30)),  # 1h window: only ad@2 inside
        (4, 1, "purchase", _ts(12)),     # nothing inside -> NULL
    ]
    got = _run(spark, rows, model="first_touch", lookback_s=3600)
    assert got == {3: ("ad", _ts(2)), 4: (None, None)}
    # inclusive boundary: touch exactly lookback_s old still credits
    rows2 = [(1, 1, "email", _ts(0)), (2, 1, "purchase", _ts(1))]
    got2 = _run(spark, rows2, model="first_touch", lookback_s=3600)
    assert got2 == {2: ("email", _ts(0))}


def test_validation(spark):
    df = spark.createDataFrame(
        [(1, 1, "x", _ts(0))],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    with pytest.raises(ValueError, match="credit itself"):
        attribute_conversions(
            df, touch_types=["a", "b"], conversion_types=["b"]
        )
    with pytest.raises(ValueError, match="model"):
        attribute_conversions(
            df, touch_types=["a"], conversion_types=["b"], model="linear"
        )
    with pytest.raises(ValueError, match="lookback_s"):
        attribute_conversions(
            df, touch_types=["a"], conversion_types=["b"], lookback_s=0
        )
    with pytest.raises(ValueError, match="required"):
        attribute_conversions(df, touch_types=[], conversion_types=["b"])


def test_non_integral_order_col_rejected(spark):
    # a string/UUID event id would silently cast to NULL and corrupt the
    # (ts, oid) tie-break — must fail loudly instead
    df = spark.createDataFrame(
        [("evt-00017", 1, "a", _ts(0))],
        "event_id string, user_id long, event_type string, ts timestamp",
    )
    with pytest.raises(ValueError, match="integral event id"):
        attribute_conversions(df, touch_types=["a"], conversion_types=["b"])
