"""Grid resampling vs a hand-computed oracle: NULL leading ticks, carry
across quiet intervals, latest-wins at same-second ties."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from funcify_feature_eng_spark.operators.resample import resample_to_grid

T0 = dt.datetime(2024, 1, 1, 0, 30, 0)  # mid-interval: first tick precedes it


def test_resample_to_grid_oracle(spark):
    rows = [
        # user a: events at 00:30, 00:30 (tie), 02:10; grid 00:00..02:00
        (1, "a", 0, 10),
        (2, "a", 0, 20),     # same second — higher tie_col wins
        (3, "a", 6000, 30),  # 02:10
        # user b: single event -> single-tick grid, value visible at its tick?
        (4, "b", 1800, 40),  # 01:00 exactly -> tick 01:00 sees it (<=)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "off", "v"])
    pdf["ts"] = pdf["off"].map(lambda s: T0 + dt.timedelta(seconds=int(s)))
    df = spark.createDataFrame(pdf.drop(columns=["off"]))

    got = (
        resample_to_grid(
            df, keys=["user_id"], ts_col="ts", value_col="v", tie_col="event_id",
            step_s=3600, out_value="val",
        )
        .orderBy("user_id", "tick_es")
        .toPandas()
    )
    base = int(dt.datetime(2024, 1, 1, 0, 0, 0).timestamp())
    a = got[got["user_id"] == "a"]
    assert a["tick_es"].tolist() == [base, base + 3600, base + 7200]
    # tick 00:00 precedes the first event -> NULL, no invented state
    assert pd.isna(a["val"].iloc[0])
    # tick 01:00 and 02:00: latest state is the TIE winner (event_id=2 -> 20)
    assert a["val"].iloc[1] == 20 and a["val"].iloc[2] == 20
    b = got[got["user_id"] == "b"]
    # exact-tick event is visible at its own tick (<= semantics)
    assert b["tick_es"].tolist() == [base + 3600] and b["val"].iloc[0] == 40
