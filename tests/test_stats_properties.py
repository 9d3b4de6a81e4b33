"""Property-based invariants (hypothesis) for operators/stats_tests.py —
differential against the brute-force pure-Python references in
tests/test_stats_tests.py on adversarial small samples (heavy ties, empty
sides, constant runs). Deterministic (derandomize=True), sized for the
shared local[4] session: hypothesis generates the lists, ONE Spark job per
example."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from funcify_feature_eng_spark.operators.stats_tests import (
    cusum_changepoint,
    ks_test,
    mann_whitney,
)
from tests.test_stats_tests import ref_cusum, ref_ks, ref_mw

SETTLE = settings(
    derandomize=True,
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny value domain → dense ties, the hard case for rank/ECDF arithmetic
vals = st.integers(min_value=-3, max_value=3)
sample = st.lists(vals, min_size=0, max_size=12)


def _df(spark, a, b):
    rows = [("g", True, x) for x in a] + [("g", False, x) for x in b]
    return spark.createDataFrame(rows, "grp string, is_ref boolean, v long")


@SETTLE
@given(a=sample, b=sample)
def test_ks_differential(spark, a, b):
    if not a and not b:
        return
    got = ks_test(_df(spark, a, b), "v", "is_ref", group_by=["grp"]).first()
    assert got.n_ref == len(a) and got.n_cur == len(b)
    if not a or not b:
        assert got.ks_d is None and got.ks_at is None
        return
    v, d = ref_ks(a, b)
    assert got.ks_at == v
    assert got.ks_d == pytest.approx(d, abs=0)
    assert 0.0 <= got.ks_d <= 1.0


@SETTLE
@given(a=sample, b=sample)
def test_mw_differential(spark, a, b):
    if not a and not b:
        return
    got = mann_whitney(
        _df(spark, a, b), "v", "is_ref", group_by=["grp"]
    ).first()
    u_x2, auc, z = ref_mw(a, b)
    assert got.u_ref_x2 == u_x2
    if auc is None:
        assert got.auc_ref is None and got.mw_z is None
    else:
        assert got.auc_ref == pytest.approx(auc, rel=1e-12)
        assert got.mw_z == pytest.approx(z, rel=1e-12)
        assert 0.0 <= got.auc_ref <= 1.0
        # U/(n1·n2) is P(ref > cur) + P(tie)/2 — symmetric samples give 1/2
    # swapping the sides mirrors U: u(a,b) + u(b,a) = 2·n1·n2
    swapped = mann_whitney(
        _df(spark, b, a), "v", "is_ref", group_by=["grp"]
    ).first()
    assert got.u_ref_x2 + swapped.u_ref_x2 == 2 * len(a) * len(b)


@SETTLE
@given(xs=st.lists(vals, min_size=2, max_size=14))
def test_cusum_differential(spark, xs):
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "grp string, pos long, v long"
    )
    got = cusum_changepoint(df, "v", ["pos"], group_by=["grp"]).first()
    i, gap = ref_cusum(xs)
    assert got.cp_index == i
    assert got.mean_gap == pytest.approx(gap, rel=1e-12)
    # shifting every value by a constant leaves d_i (hence the argmax)
    # unchanged and the gap invariant: d_i is translation-invariant
    df2 = spark.createDataFrame(
        [("g", i, x + 100) for i, x in enumerate(xs)],
        "grp string, pos long, v long",
    )
    got2 = cusum_changepoint(df2, "v", ["pos"], group_by=["grp"]).first()
    assert got2.cp_index == got.cp_index
    assert got2.mean_gap == pytest.approx(got.mean_gap, rel=1e-12)
