"""Inter-rater agreement operators (operators/agreement.py)."""

from fractions import Fraction

from funcify_feature_eng_spark.operators.agreement import (
    cohen_kappa,
    confusion_matrix,
)


def _kappa_ppm_ref(pairs):
    """Independent rational-arithmetic Cohen's kappa (floor ppm)."""
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    if n == 0:
        return None
    agree = sum(1 for a, b in pairs if a == b)
    labels = {a for a, _ in pairs} | {b for _, b in pairs}
    s = sum(
        sum(1 for a, _ in pairs if a == k) * sum(1 for _, b in pairs if b == k)
        for k in labels
    )
    den = n * n - s
    if den == 0:
        return None
    from math import floor
    return floor(Fraction(1_000_000) * (n * agree - s) / den)


def test_cohen_kappa_matches_rational_reference(spark):
    pairs = [
        ("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"),
        ("y", "x"), ("y", "y"), ("z", "z"), ("z", "x"),
        (None, "x"), ("x", None),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    out = cohen_kappa(df, rater_a="a", rater_b="b").collect()[0]
    clean = [(a, b) for a, b in pairs if a is not None and b is not None]
    assert out["n_pairs"] == len(clean) == 8
    assert out["n_agree"] == 5
    assert out["kappa_ppm"] == _kappa_ppm_ref(pairs)


def test_cohen_kappa_edges_and_negative(spark):
    # perfectly anti-correlated two-label raters: kappa = -1
    anti = spark.createDataFrame(
        [("x", "y")] * 3 + [("y", "x")] * 3, "a string, b string")
    row = cohen_kappa(anti, rater_a="a", rater_b="b").collect()[0]
    assert row["kappa_ppm"] == -1_000_000 == _kappa_ppm_ref(
        [("x", "y")] * 3 + [("y", "x")] * 3)
    # degenerate: both raters constant -> p_e = 1 -> NULL
    const = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    row = cohen_kappa(const, rater_a="a", rater_b="b").collect()[0]
    assert row["n_agree"] == 4 and row["kappa_ppm"] is None
    # floor semantics on a negative non-integral kappa
    skew = [("x", "y")] * 5 + [("y", "x")] * 2 + [("x", "x")] * 1
    df = spark.createDataFrame(skew, "a string, b string")
    row = cohen_kappa(df, rater_a="a", rater_b="b").collect()[0]
    ref = _kappa_ppm_ref(skew)
    assert ref < 0 and row["kappa_ppm"] == ref


def test_cohen_kappa_grouped(spark):
    rows = [("g1", "x", "x"), ("g1", "x", "y"), ("g1", "y", "y"),
            ("g1", "y", "x"), ("g2", "x", "x"), ("g2", "x", "x")]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    out = {r["g"]: r for r in
           cohen_kappa(df, rater_a="a", rater_b="b",
                       group_by=["g"]).collect()}
    assert out["g1"]["kappa_ppm"] == _kappa_ppm_ref(
        [(a, b) for g, a, b in rows if g == "g1"])
    assert out["g2"]["kappa_ppm"] is None  # constant raters


def test_confusion_matrix_counts_and_shares(spark):
    rows = [("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"),
            (None, "y"), ("y", None)]
    df = spark.createDataFrame(rows, "e string, p string")
    out = {(r["expected"], r["predicted"]): r for r in
           confusion_matrix(df, expected="e", predicted="p").collect()}
    assert out[("x", "x")]["n_pairs"] == 2
    assert out[("x", "x")]["share_e6"] == 500_000
    assert out[("x", "y")]["share_e6"] == 250_000
    assert len(out) == 3  # NULL-bearing rows dropped


def test_exact_floor_div_regressions(spark):
    import pyspark.sql.functions as F
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    def d(x):
        return F.lit(x).cast("decimal(38,0)")

    row = spark.range(1).select(
        # F.floor(19999999/10000000) evaluates to 2 (HALF_UP at scale 6)
        exact_floor_div(d(19999999), d(10000000)).alias("hazard"),
        exact_floor_div(d(-7), d(2)).alias("neg"),
        exact_floor_div(d(7), d(-2)).alias("negden"),
        exact_floor_div(d(6), d(3)).alias("exact"),
        exact_floor_div(d(-6), d(3)).alias("negexact"),
    ).collect()[0]
    assert row["hazard"] == 1
    assert row["neg"] == -4
    assert row["negden"] == -4
    assert row["exact"] == 2
    assert row["negexact"] == -2


def _chi2_e6_ref(pairs):
    """Independent per-cell-floored chi2*1e6 in pure rationals."""
    from collections import Counter
    from math import floor

    from fractions import Fraction
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    cells = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    total = 0
    src = 0
    for (a, b), o in cells.items():
        t = (n * o - ra[a] * cb[b]) ** 2
        d = n * ra[a] * cb[b]
        total += (t // d) * 1_000_000 + floor(Fraction((t % d) * 1_000_000, d))
        src += ra[a] * cb[b]
    # zero-observed cells: closed-form missing mass (n^2 - sum rc)/n
    total += floor(Fraction((n * n - src) * 1_000_000, n))
    dof = (len(ra) - 1) * (len(cb) - 1)
    return (n, dof, total if dof > 0 else None)


def test_chi2_association_matches_rational_reference(spark):
    from funcify_feature_eng_spark.operators.agreement import (
        chi2_association,
    )
    pairs = (
        [("x", "p")] * 7 + [("x", "q")] * 1 + [("y", "p")] * 2
        + [("y", "q")] * 6 + [("z", "p")] * 3 + [(None, "p")] * 2
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    row = chi2_association(df, col_a="a", col_b="b").collect()[0]
    n, dof, chi2 = _chi2_e6_ref(pairs)
    assert (row["n_pairs"], row["dof"], row["chi2_e6"]) == (n, dof, chi2)
    assert chi2 > 0

    # perfectly independent 2x2 -> chi2 exactly 0
    ind = [("x", "p")] * 2 + [("x", "q")] * 2 + [("y", "p")] * 2 + [("y", "q")] * 2
    row = chi2_association(
        spark.createDataFrame(ind, "a string, b string"),
        col_a="a", col_b="b",
    ).collect()[0]
    assert row["chi2_e6"] == 0

    # degenerate single-level side -> dof 0 -> NULL
    deg = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    row = chi2_association(deg, col_a="a", col_b="b").collect()[0]
    assert row["dof"] == 0 and row["chi2_e6"] is None


def test_chi2_association_grouped(spark):
    from funcify_feature_eng_spark.operators.agreement import (
        chi2_association,
    )
    rows = ([("g1", "x", "p")] * 4 + [("g1", "y", "q")] * 4
            + [("g2", "x", "p")] * 2 + [("g2", "x", "q")] * 2)
    df = spark.createDataFrame(rows, "g string, a string, b string")
    out = {r["g"]: r for r in
           chi2_association(df, col_a="a", col_b="b",
                            group_by=["g"]).collect()}
    _, _, ref_g1 = _chi2_e6_ref([(a, b) for g, a, b in rows if g == "g1"])
    assert out["g1"]["chi2_e6"] == ref_g1 == 8_000_000  # perfect assoc, n=8
    assert out["g2"]["chi2_e6"] is None  # single a-level


def _fleiss_ppm_ref(ratings, n_raters):
    """Independent rational-arithmetic Fleiss' kappa (floor ppm).

    ratings: list of (item, category); items with a rating count other
    than n_raters are excluded, mirroring the operator contract.
    """
    from collections import Counter
    from math import floor

    per_item = {}
    for it, c in ratings:
        if it is None or c is None:
            continue
        per_item.setdefault(it, []).append(c)
    ok = {it: cs for it, cs in per_item.items() if len(cs) == n_raters}
    n_items = len(ok)
    dropped = len(per_item) - n_items
    if n_items == 0:
        return n_items, dropped, None
    a = sum(v * v for cs in ok.values() for v in Counter(cs).values())
    cj = Counter(c for cs in ok.values() for c in cs)
    s = sum(v * v for v in cj.values())
    t = n_items * n_raters
    den = (t * t - s) * (n_raters - 1)
    if den == 0:
        return n_items, dropped, None
    num = t * (a - t) - s * (n_raters - 1)
    return n_items, dropped, floor(Fraction(1_000_000) * num / den)


def test_fleiss_kappa_matches_rational_reference(spark):
    from funcify_feature_eng_spark.operators.agreement import fleiss_kappa

    # 6 items x 3 raters with mixed agreement + 1 partially-rated item
    ratings = (
        [("i1", c) for c in ("x", "x", "x")]
        + [("i2", c) for c in ("x", "x", "y")]
        + [("i3", c) for c in ("y", "y", "y")]
        + [("i4", c) for c in ("x", "y", "z")]
        + [("i5", c) for c in ("z", "z", "x")]
        + [("i6", c) for c in ("y", "x", "y")]
        + [("i7", "x"), ("i7", "x")]        # only 2 ratings -> dropped
        + [(None, "x"), ("i1", None)]       # NULLs excluded up front
    )
    df = spark.createDataFrame(ratings, "item string, cat string")
    row = fleiss_kappa(df, item="item", category="cat", n_raters=3).collect()[0]
    n_items, dropped, ref = _fleiss_ppm_ref(
        [(i, c) for i, c in ratings if i is not None and c is not None], 3)
    assert (row["n_items"], row["n_items_dropped"]) == (n_items, dropped) == (6, 1)
    assert row["kappa_ppm"] == ref


def test_fleiss_kappa_edges(spark):
    from funcify_feature_eng_spark.operators.agreement import fleiss_kappa
    import pytest

    # degenerate: every rating one category -> p_e = 1 -> NULL
    const = spark.createDataFrame(
        [(f"i{k}", "x") for k in range(4) for _ in range(2)],
        "item string, cat string")
    row = fleiss_kappa(const, item="item", category="cat", n_raters=2).collect()[0]
    assert row["n_items"] == 4 and row["kappa_ppm"] is None
    # perfect disagreement, 2 raters, balanced labels: kappa = -1
    anti = spark.createDataFrame(
        [(f"i{k}", c) for k in range(4) for c in ("x", "y")],
        "item string, cat string")
    row = fleiss_kappa(anti, item="item", category="cat", n_raters=2).collect()[0]
    _, _, ref = _fleiss_ppm_ref(
        [(f"i{k}", c) for k in range(4) for c in ("x", "y")], 2)
    assert row["kappa_ppm"] == ref == -1_000_000
    # grouped: per-group stats independent
    g = spark.createDataFrame(
        [("g1", f"i{k}", "x") for k in range(3) for _ in range(2)]
        + [("g2", f"i{k}", c) for k in range(3) for c in ("x", "y")],
        "grp string, item string, cat string")
    rows = {r["grp"]: r for r in fleiss_kappa(
        g, item="item", category="cat", n_raters=2, group_by=["grp"]
    ).collect()}
    assert rows["g1"]["kappa_ppm"] is None
    assert rows["g2"]["kappa_ppm"] == -1_000_000
    with pytest.raises(ValueError):
        fleiss_kappa(g, item="item", category="cat", n_raters=1)


def test_fleiss_kappa_all_dropped_group_still_reported(spark):
    from funcify_feature_eng_spark.operators.agreement import fleiss_kappa

    rows = (
        [("g1", f"i{k}", c) for k in range(3) for c in ("x", "y")]
        + [("g2", "j1", "x"), ("g2", "j2", "y")]   # every g2 item partial
    )
    df = spark.createDataFrame(rows, "grp string, item string, cat string")
    out = {r["grp"]: r for r in fleiss_kappa(
        df, item="item", category="cat", n_raters=2, group_by=["grp"]
    ).collect()}
    # g2 must not vanish: zero eligible items, both reported dropped
    assert out["g2"]["n_items"] == 0
    assert out["g2"]["n_items_dropped"] == 2
    assert out["g2"]["kappa_ppm"] is None
    assert out["g1"]["n_items"] == 3
