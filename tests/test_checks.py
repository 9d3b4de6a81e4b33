"""Declarative data-quality constraints (operators/checks.py)."""

import pytest

from funcify_feature_eng_spark.operators.checks import (
    check_constraints,
    complete,
    isin,
    matches,
    max_at_most,
    min_at_least,
    row_count_between,
    unique,
)


def _df(spark):
    rows = [
        (1, "view", 10.0, "a@b.co"),
        (2, "click", -5.0, None),
        (3, "view", 200.0, "x@y.io"),
        (3, "purchase", 50.0, "bad"),
        (None, "view", 1.0, "c@d.eu"),
    ]
    return spark.createDataFrame(
        rows, "id long, kind string, value double, email string"
    )


def test_constraints_single_pass_verdicts(spark):
    out = check_constraints(_df(spark), [
        complete("id", 0.8),                       # 4/5 = 800000 ppm
        complete("email", 1.0),                    # 4/5 -> fail
        unique("id"),                              # id 3 twice -> surplus 1
        min_at_least("value", 0.0),                # one negative
        max_at_most("value", 100.0),               # one above
        matches("email", r"^[^@]+@[^@]+\.[a-z]+$", 0.7),  # 3/4 non-null
        isin("kind", ["view", "click", "purchase"]),
        row_count_between(5, 10),
    ])
    rows = {r["check_id"]: r for r in out.collect()}
    assert len(rows) == 8
    assert (rows[0]["metric"], rows[0]["passed"]) == (800000, True)
    assert (rows[1]["metric"], rows[1]["passed"]) == (800000, False)
    assert (rows[2]["metric"], rows[2]["passed"]) == (1, False)
    assert (rows[3]["metric"], rows[3]["passed"]) == (1, False)
    assert (rows[4]["metric"], rows[4]["passed"]) == (1, False)
    assert (rows[5]["metric"], rows[5]["passed"]) == (750000, True)
    assert (rows[6]["metric"], rows[6]["passed"]) == (1000000, True)
    assert (rows[7]["metric"], rows[7]["passed"]) == (5, True)


def test_empty_input_is_vacuously_complete(spark):
    df = spark.createDataFrame([], "id long, kind string")
    rows = {r["check_id"]: r for r in check_constraints(df, [
        complete("kind"), unique("id"), row_count_between(1, 10),
    ]).collect()}
    assert rows[0]["passed"] is True and rows[0]["metric"] == 1000000
    assert rows[1]["passed"] is True
    assert rows[2]["passed"] is False


def test_multi_column_unique_excludes_null_bearing_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, None), (2, "b")], "x long, y string")
    rows = check_constraints(df, [unique("x", "y")]).collect()
    # (1,a) twice -> surplus 1; the (1, NULL) row is excluded
    assert rows[0]["metric"] == 1 and rows[0]["passed"] is False


def test_constraint_validation_errors(spark):
    with pytest.raises(ValueError, match="empty constraint"):
        check_constraints(_df(spark), [])
    with pytest.raises(ValueError, match="at least one column"):
        unique()
    with pytest.raises(ValueError, match="lo 5 > hi 1"):
        row_count_between(5, 1)
