"""RANGE-frame rolling time aggregates + leakage-free target encoding vs
brute-force pandas oracles, with adversarial same-timestamp ties."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from funcify_feature_eng_spark.operators.encoding import cumulative_target_encode
from funcify_feature_eng_spark.operators.windows import rolling_time_agg

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _frame(spark):
    # user A: a burst with same-second ties, then a quiet hour; user B: spread
    rows = [
        # (id, user, offset_s, v)
        (1, "a", 0, 10),
        (2, "a", 0, 20),  # tied with row 1 at the same second
        (3, "a", 5, 30),
        (4, "a", 3599, 40),  # 3599s after row 1/2 -> rows 1,2,3 in frame
        (5, "a", 3605, 50),  # rows 3,4 in frame (1,2 aged out)
        (6, "a", 9000, 60),  # empty frame
        (7, "b", 100, 70),
        (8, "b", 100, 80),  # tie
        (9, "b", 101, 90),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "off", "v"])
    pdf["ts"] = pdf["off"].map(lambda s: T0 + dt.timedelta(seconds=int(s)))
    return spark.createDataFrame(pdf.drop(columns=["off"]))


def brute_rolling(pdf: pd.DataFrame, window_s: int) -> pd.DataFrame:
    out = []
    for _, r in pdf.iterrows():
        es = int(r["ts"].timestamp())
        prior = pdf[
            (pdf["user_id"] == r["user_id"])
            & (pdf["ts"].map(lambda t: int(t.timestamp())) >= es - window_s)
            & (pdf["ts"].map(lambda t: int(t.timestamp())) <= es - 1)
        ]
        out.append((r["event_id"], len(prior), int(prior["v"].sum())))
    return pd.DataFrame(out, columns=["event_id", "prev_cnt", "prev_sum"])


def test_rolling_time_agg_matches_brute_force_and_excludes_ties(spark):
    df = _frame(spark)
    got = (
        rolling_time_agg(
            df, keys=["user_id"], ts_col="ts", value_col="v", window_s=3600
        )
        .select("event_id", "prev_cnt", "prev_sum")
        .orderBy("event_id")
        .toPandas()
    )
    exp = brute_rolling(df.toPandas(), 3600).sort_values("event_id").reset_index(drop=True)
    assert got["prev_cnt"].tolist() == exp["prev_cnt"].tolist()
    assert got["prev_sum"].tolist() == exp["prev_sum"].tolist()
    by_id = dict(zip(got["event_id"], zip(got["prev_cnt"], got["prev_sum"])))
    # the same-second tie rows see each other NOT AT ALL (strict -1 bound):
    assert by_id[1] == (0, 0) and by_id[2] == (0, 0)
    assert by_id[7] == (0, 0) and by_id[8] == (0, 0)
    # frame ages out: row 5 sees only rows 3,4
    assert by_id[5] == (2, 70)
    # quiet hour: empty frame reads 0, not NULL
    assert by_id[6] == (0, 0)


def test_rolling_time_agg_include_current_ties(spark):
    df = _frame(spark)
    got = rolling_time_agg(
        df, keys=["user_id"], ts_col="ts", value_col="v", window_s=3600,
        include_current=True,
    ).select("event_id", "prev_cnt").orderBy("event_id").toPandas()
    by_id = dict(zip(got["event_id"], got["prev_cnt"]))
    # inclusive bound pulls in the row itself AND its same-second twin
    assert by_id[1] == 2 and by_id[2] == 2


M, PRIOR = 4, 100


def brute_encode(pdf: pd.DataFrame) -> dict[int, tuple[int, int, int]]:
    pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
    out = {}
    for cat in pdf["cat"].unique():
        sub = pdf[pdf["cat"] == cat]
        cnt = ssum = 0
        for _, r in sub.iterrows():
            out[r["event_id"]] = (cnt, ssum, (ssum + M * PRIOR) // (cnt + M))
            cnt += 1
            ssum += int(r["v"])
    return out


def test_cumulative_target_encode_matches_brute_force(spark):
    rows = [
        (1, "x", 0, 10),
        (2, "x", 0, 50),  # same ts as row 1: event_id breaks the tie
        (3, "y", 1, 30),
        (4, "x", 2, 70),
        (5, "y", 3, 90),
        (6, "x", 3, 20),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "cat", "off", "v"])
    pdf["ts"] = pdf["off"].map(lambda s: T0 + dt.timedelta(seconds=int(s)))
    df = spark.createDataFrame(pdf.drop(columns=["off"]))
    got = (
        cumulative_target_encode(
            df, category_col="cat", target_col="v", order=("ts", "event_id"),
            smoothing_m=M, prior=PRIOR, out_col="enc",
        )
        .select("event_id", "enc_cnt", "enc_sum", "enc")
        .orderBy("event_id")
        .toPandas()
    )
    exp = brute_encode(pdf)
    for _, r in got.iterrows():
        assert (r["enc_cnt"], r["enc_sum"], r["enc"]) == exp[r["event_id"]], r["event_id"]
    # first row of each category sees exactly the smoothing prior
    first = got.set_index("event_id")
    assert first.loc[1, "enc"] == PRIOR and first.loc[3, "enc"] == PRIOR


def test_cumulative_target_encode_is_leakage_free(spark):
    """Perturbing FUTURE targets must not move any earlier row's encoding."""
    base = [(i, "x", i, 10 * i) for i in range(1, 6)]
    pdf = pd.DataFrame(base, columns=["event_id", "cat", "off", "v"])
    pdf["ts"] = pdf["off"].map(lambda s: T0 + dt.timedelta(seconds=int(s)))

    def run(frame):
        return (
            cumulative_target_encode(
                spark.createDataFrame(frame.drop(columns=["off"])),
                category_col="cat", target_col="v", order=("ts", "event_id"),
                smoothing_m=M, prior=PRIOR, out_col="enc",
            )
            .select("event_id", "enc")
            .orderBy("event_id")
            .toPandas()
        )

    a = run(pdf)
    mutated = pdf.copy()
    mutated.loc[mutated["event_id"] == 5, "v"] = 999_999  # poison the last row
    b = run(mutated)
    assert a[a["event_id"] < 5]["enc"].tolist() == b[b["event_id"] < 5]["enc"].tolist()
