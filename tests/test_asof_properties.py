"""Property-based zero-leakage tests: randomized (seeded) left/right tables,
every strategy, checked against a brute-force per-row oracle."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from funcify_feature_eng_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)

# compact timestamp domain so collisions (exact ties) are COMMON
ts_strategy = st.integers(min_value=0, max_value=30).map(
    lambda s: BASE + dt.timedelta(seconds=s)
)
entity_strategy = st.sampled_from(["e1", "e2", "e3"])

left_rows = st.lists(
    st.tuples(entity_strategy, ts_strategy), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(entity_strategy, ts_strategy, st.integers(0, 99)), min_size=0, max_size=12
)


def brute_force(left, right, exact, forward=False):
    out = []
    for ent, lts in left:
        if forward:
            cands = [
                (rts, v) for (rent, rts, v) in right
                if rent == ent and (rts >= lts if exact else rts > lts)
            ]
            out.append(min(cands)[1] if cands else None)  # min (ts, value)
        else:
            cands = [
                (rts, v) for (rent, rts, v) in right
                if rent == ent and (rts <= lts if exact else rts < lts)
            ]
            out.append(max(cands)[1] if cands else None)  # max (ts, value)
    return out


@pytest.mark.parametrize("strategy", ["union_window", "segmented", "broadcast"])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=left_rows, right=right_rows, exact=st.booleans())
def test_asof_never_leaks_and_matches_bruteforce(spark, strategy, left, right, exact):
    ldf = spark.createDataFrame(
        [(e, i, t) for i, (e, t) in enumerate(left)],
        "ent string, idx int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(e, t, v) for (e, t, v) in right] or [("__none__", BASE, 0)],
        "ent string, vts timestamp, v int",
    )
    if not right:
        rdf = rdf.filter("ent != '__none__'")
    got = (
        asof_join(
            ldf, rdf, on=["ent"], left_ts="ts", right_ts="vts",
            value_cols={"v": "val"}, allow_exact_matches=exact,
            right_order=["v"], strategy=strategy,
            bucket_seconds=7,  # tiny buckets → exercise the carry path
        )
        .orderBy("idx")
        .collect()
    )
    expected = brute_force(left, right, exact)
    assert [r["val"] for r in got] == expected


@pytest.mark.parametrize("strategy", ["broadcast", "union_window", "segmented"])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=left_rows, right=right_rows, exact=st.booleans())
def test_forward_asof_matches_bruteforce(spark, strategy, left, right, exact):
    ldf = spark.createDataFrame(
        [(e, i, t) for i, (e, t) in enumerate(left)],
        "ent string, idx int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(e, t, v) for (e, t, v) in right] or [("__none__", BASE, 0)],
        "ent string, vts timestamp, v int",
    )
    if not right:
        rdf = rdf.filter("ent != '__none__'")
    got = (
        asof_join(
            ldf, rdf, on=["ent"], left_ts="ts", right_ts="vts",
            value_cols={"v": "val"}, allow_exact_matches=exact,
            right_order=["v"], strategy=strategy, direction="forward",
        )
        .orderBy("idx")
        .collect()
    )
    expected = brute_force(left, right, exact, forward=True)
    assert [r["val"] for r in got] == expected
