"""k-anonymity / l-diversity audit (operators/privacy.py)."""

from __future__ import annotations

import pytest

from funcify_feature_eng_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymity_summary,
)


@pytest.fixture(scope="module")
def people(spark):
    # (zip, band, diagnosis)
    rows = [
        ("13053", "20-29", "flu"),
        ("13053", "20-29", "flu"),
        ("13053", "20-29", "cold"),       # group of 3, l=2
        ("13068", "30-39", "flu"),        # singleton
        ("14850", "40-49", "flu"),
        ("14850", "40-49", "flu"),        # group of 2, l=1 (homogeneous)
        (None, "20-29", "cold"),          # NULL zip is its own group
    ]
    return spark.createDataFrame(rows, "zip string, band string, diag string")


def test_report_violations(spark, people):
    got = {
        (r["zip"], r["band"]): (
            r["n"], r["l_distinct"], r["k_violation"], r["l_violation"]
        )
        for r in k_anonymity_report(
            people, ["zip", "band"], sensitive_col="diag", k=3, l=2
        ).collect()
    }
    # 13053 group: n=3 (meets k), l=2 (meets l) -> absent
    assert ("13053", "20-29") not in got
    assert got[("13068", "30-39")] == (1, 1, True, True)
    assert got[("14850", "40-49")] == (2, 1, True, True)
    assert got[(None, "20-29")] == (1, 1, True, True)


def test_report_all_groups_no_sensitive(spark, people):
    got = {
        (r["zip"], r["band"]): (r["n"], r["l_distinct"], r["l_violation"])
        for r in k_anonymity_report(
            people, ["zip", "band"], k=2, violations_only=False
        ).collect()
    }
    assert len(got) == 4
    assert got[("13053", "20-29")] == (3, None, None)


def test_summary(spark, people):
    row = k_anonymity_summary(
        people, ["zip", "band"], sensitive_col="diag"
    ).collect()[0]
    assert (
        row["n_rows"], row["n_groups"], row["k_anonymity"],
        row["l_diversity"], row["n_singletons"],
    ) == (7, 4, 1, 1, 2)
    assert row["singleton_row_ppm"] == 2 * 1_000_000 // 7


def test_summary_empty(spark):
    df = spark.createDataFrame([], "zip string, band string")
    row = k_anonymity_summary(df, ["zip", "band"]).collect()[0]
    assert (row["n_rows"], row["n_groups"], row["n_singletons"]) == (0, 0, 0)
    assert row["k_anonymity"] is None and row["singleton_row_ppm"] == 0


def test_validation(spark, people):
    with pytest.raises(ValueError, match="quasi"):
        k_anonymity_report(people, [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_report(people, ["zip"], k=0)
    with pytest.raises(ValueError, match="l must"):
        k_anonymity_report(people, ["zip"], l=0)
