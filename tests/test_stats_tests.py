"""stats_tests vs pure-Python references: KS, Mann-Whitney, OLS, CUSUM."""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.stats_tests import (
    cusum_changepoint,
    ks_test,
    mann_whitney,
    ols_trend,
)


# ---------------------------------------------------------------- references

def ref_ks(a: list[int], b: list[int]) -> tuple[int, float]:
    """(ks_at, ks_d) — brute force over all observed values."""
    n1, n2 = len(a), len(b)
    best_v, best_num = None, -1
    for v in sorted(set(a) | set(b)):
        c1 = sum(1 for x in a if x <= v)
        c2 = sum(1 for x in b if x <= v)
        num = abs(c1 * n2 - c2 * n1)
        if num > best_num:
            best_num, best_v = num, v
    return best_v, best_num / (n1 * n2)


def ref_mw(a: list[int], b: list[int]) -> tuple[int, float | None, float | None]:
    """(u_ref_x2, auc_ref, mw_z) — mid-ranks with tie correction."""
    pooled = sorted(a + b)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    # doubled mid-rank per value
    dr: dict[int, int] = {}
    idx = 0
    while idx < len(pooled):
        j = idx
        while j < len(pooled) and pooled[j] == pooled[idx]:
            j += 1
        # ranks idx+1 .. j  →  doubled mid-rank = (idx+1) + j
        dr[pooled[idx]] = (idx + 1) + j
        idx = j
    r1x2 = sum(dr[x] for x in a)
    u_x2 = r1x2 - n1 * (n1 + 1)
    ties: dict[int, int] = {}
    for x in pooled:
        ties[x] = ties.get(x, 0) + 1
    t_corr = sum(t ** 3 - t for t in ties.values())
    v_num = n1 * n2 * ((n + 1) * n * (n - 1) - t_corr)
    if n1 == 0 or n2 == 0 or v_num <= 0:
        return u_x2, None, None
    auc = u_x2 / (2.0 * n1 * n2)
    z = (u_x2 - n1 * n2) * math.sqrt(12.0 * n * (n - 1)) / (2.0 * math.sqrt(v_num))
    return u_x2, auc, z


def ref_ols(pairs: list[tuple[int, int]]) -> tuple[float | None, float | None]:
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    vx = n * sxx - sx * sx
    if vx <= 0:
        return None, None
    slope = (n * sxy - sx * sy) / vx
    return slope, sy / n - slope * (sx / n)


def ref_cusum(xs: list[int]) -> tuple[int, float]:
    """(cp_index, mean_gap) — brute force argmax of |n·cum_i − i·S|."""
    n = len(xs)
    s = sum(xs)
    best_i, best_abs, best_d = None, -1, 0
    cum = 0
    for i, x in enumerate(xs[:-1], start=1):
        cum += x
        d = n * cum - i * s
        if abs(d) > best_abs:
            best_i, best_abs, best_d = i, abs(d), d
    return best_i, best_d / (best_i * (n - best_i))


# --------------------------------------------------------------------- tests

def _two_group_df(spark, a, b, extra_group=None):
    rows = [("g", True, x) for x in a] + [("g", False, x) for x in b]
    if extra_group:
        a2, b2 = extra_group
        rows += [("h", True, x) for x in a2] + [("h", False, x) for x in b2]
    return spark.createDataFrame(rows, "grp string, is_ref boolean, v long")


def test_ks_matches_bruteforce(spark):
    rng = random.Random(7)
    a = [rng.randrange(0, 40) for _ in range(120)]
    b = [rng.randrange(5, 50) for _ in range(90)]
    got = ks_test(
        _two_group_df(spark, a, b), "v", "is_ref", group_by=["grp"]
    ).first()
    v, d = ref_ks(a, b)
    assert got.n_ref == 120 and got.n_cur == 90
    assert got.ks_at == v
    assert got.ks_d == pytest.approx(d, abs=0)


def test_ks_identical_samples_zero(spark):
    a = [1, 2, 3, 4, 5]
    got = ks_test(_two_group_df(spark, a, a), "v", "is_ref", group_by=["grp"]).first()
    assert got.ks_d == 0.0


def test_ks_one_sided_null(spark):
    got = ks_test(
        _two_group_df(spark, [1, 2, 3], []), "v", "is_ref", group_by=["grp"]
    ).first()
    assert got.ks_d is None and got.ks_at is None
    assert got.n_ref == 3 and got.n_cur == 0


def test_ks_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [("g", True, 1), ("g", True, None), ("g", None, 9), ("g", False, 2)],
        "grp string, is_ref boolean, v long",
    )
    got = ks_test(df, "v", "is_ref", group_by=["grp"]).first()
    assert got.n_ref == 1 and got.n_cur == 1


def test_mw_matches_reference_with_ties(spark):
    rng = random.Random(11)
    a = [rng.randrange(0, 12) for _ in range(80)]   # heavy ties
    b = [rng.randrange(3, 15) for _ in range(65)]
    got = mann_whitney(
        _two_group_df(spark, a, b), "v", "is_ref", group_by=["grp"]
    ).first()
    u_x2, auc, z = ref_mw(a, b)
    assert got.u_ref_x2 == u_x2
    assert got.auc_ref == pytest.approx(auc, rel=1e-12)
    assert got.mw_z == pytest.approx(z, rel=1e-12)


def test_mw_all_tied_z_null(spark):
    got = mann_whitney(
        _two_group_df(spark, [5, 5, 5], [5, 5]), "v", "is_ref", group_by=["grp"]
    ).first()
    assert got.mw_z is None and got.auc_ref is None
    # U is still exact: every comparison is a half-win
    assert got.u_ref_x2 == 2 * 3 * 2 // 2 * 1  # 2·U = n1·n2 when all tied


def test_mw_clean_shift_sign(spark):
    # reference sample clearly larger → positive z, auc > 0.5
    got = mann_whitney(
        _two_group_df(spark, [10, 11, 12, 13], [1, 2, 3, 4]),
        "v", "is_ref", group_by=["grp"],
    ).first()
    assert got.auc_ref == 1.0 and got.mw_z > 2.0


def test_mw_two_groups_independent(spark):
    a, b = [1, 2, 3], [4, 5]
    got = mann_whitney(
        _two_group_df(spark, a, b, extra_group=([9, 9], [1])),
        "v", "is_ref", group_by=["grp"],
    )
    rows = {r.grp: r for r in got.collect()}
    assert rows["g"].u_ref_x2 == ref_mw(a, b)[0]
    assert rows["h"].u_ref_x2 == ref_mw([9, 9], [1])[0]


def test_ols_matches_reference(spark):
    rng = random.Random(3)
    pairs = [(x, 3 * x + 7 + rng.randrange(-5, 6)) for x in range(50)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "grp string, x long, y long"
    )
    got = ols_trend(df, "x", "y", group_by=["grp"]).first()
    slope, intercept = ref_ols(pairs)
    assert got.n_pairs == 50
    assert got.slope == pytest.approx(slope, rel=1e-12)
    assert got.intercept == pytest.approx(intercept, rel=1e-12)


def test_ols_constant_x_null(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2)], "grp string, x long, y long"
    )
    got = ols_trend(df, "x", "y", group_by=["grp"]).first()
    assert got.slope is None and got.intercept is None


def test_ols_pairwise_null_drop(spark):
    df = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, None), ("g", None, 30), ("g", 4, 40)],
        "grp string, x long, y long",
    )
    got = ols_trend(df, "x", "y", group_by=["grp"]).first()
    assert got.n_pairs == 2
    slope, intercept = ref_ols([(1, 10), (4, 40)])
    assert got.slope == pytest.approx(slope, rel=1e-12)


def test_ols_rejects_non_integral(spark):
    df = spark.createDataFrame([("g", 1.0, 2)], "grp string, x double, y long")
    with pytest.raises(ValueError, match="integral"):
        ols_trend(df, "x", "y", group_by=["grp"])


def test_cusum_finds_planted_shift(spark):
    xs = [10] * 40 + [25] * 60  # clean level shift at i=40
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "grp string, pos long, v long"
    )
    got = cusum_changepoint(df, "v", ["pos"], group_by=["grp"]).first()
    i, gap = ref_cusum(xs)
    assert got.cp_index == i == 40
    assert got.mean_gap == pytest.approx(gap, abs=0) == -15.0
    assert got.n_rows == 100


def test_cusum_matches_bruteforce_noisy(spark):
    rng = random.Random(19)
    xs = [rng.randrange(0, 20) for _ in range(70)] + [
        rng.randrange(8, 30) for _ in range(50)
    ]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "grp string, pos long, v long"
    )
    got = cusum_changepoint(df, "v", ["pos"], group_by=["grp"]).first()
    i, gap = ref_cusum(xs)
    assert got.cp_index == i
    assert got.mean_gap == pytest.approx(gap, rel=1e-12)


def test_cusum_single_row_group_dropped(spark):
    df = spark.createDataFrame(
        [("g", 0, 1), ("h", 0, 1), ("h", 1, 2)], "grp string, pos long, v long"
    )
    got = {r.grp: r for r in
           cusum_changepoint(df, "v", ["pos"], group_by=["grp"]).collect()}
    assert "g" not in got and got["h"].cp_index == 1


def test_cusum_requires_order(spark):
    df = spark.createDataFrame([("g", 0, 1)], "grp string, pos long, v long")
    with pytest.raises(ValueError, match="order_by"):
        cusum_changepoint(df, "v", [], group_by=["grp"])


def test_keyless_paths(spark):
    df = _two_group_df(spark, [1, 2, 3, 10, 11], [4, 5, 6]).drop("grp")
    ks = ks_test(df, "v", "is_ref").first()
    mw = mann_whitney(df, "v", "is_ref").first()
    v, d = ref_ks([1, 2, 3, 10, 11], [4, 5, 6])
    assert ks.ks_at == v and ks.ks_d == pytest.approx(d, abs=0)
    assert mw.u_ref_x2 == ref_mw([1, 2, 3, 10, 11], [4, 5, 6])[0]
