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
