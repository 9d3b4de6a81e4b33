"""allclose_audit semantics: presence kinds, tolerance rule, NULL handling."""

from __future__ import annotations

import pandas as pd

from funcify_feature_eng_spark.operators.parity import allclose_audit


def _pair(spark):
    a = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4, 5], "x": [1.0, 2.0, 3.0, None, 5.0]})
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 4, 5, 6],  # 3 missing on right, 6 extra
                "x": [1.0, 2.5, None, 5.0000001, 9.0],
            }
        )
    )
    return a, b


def test_allclose_audit_kinds_and_tolerance(spark):
    a, b = _pair(spark)
    got = (
        allclose_audit(a, b, keys=["k"], value_cols=["x"], atol=1e-3)
        .orderBy("k", "kind")
        .toPandas()
    )
    by = {(r["k"], r["kind"]): r for _, r in got.iterrows()}
    assert (3, "left_only") in by and (6, "right_only") in by
    assert (2, "value") in by and by[(2, "value")]["right_val"] == 2.5
    # NULL vs NULL is close (k=4 pairs None/None? no: left None, right None) —
    # k=4: left None, right None -> close; k=5 within atol -> close; k=1 equal
    assert {k for (k, kind) in by} == {2, 3, 6}


def test_allclose_audit_null_vs_value_and_rtol(spark):
    a, b = _pair(spark)
    # atol=0: k=5's 1e-7 absolute gap fails atol-only, passes with rtol=1e-6
    strict = allclose_audit(a, b, keys=["k"], value_cols=["x"], atol=0.0).toPandas()
    assert 5 in set(strict[strict["kind"] == "value"]["k"])
    loose = allclose_audit(
        a, b, keys=["k"], value_cols=["x"], atol=0.0, rtol=1e-6
    ).toPandas()
    assert 5 not in set(loose[loose["kind"] == "value"]["k"])
    # NULL vs non-NULL must be a value violation even at infinite tolerance:
    # plant one — k=4 left is NULL, make right non-NULL
    b2 = spark.createDataFrame(pd.DataFrame({"k": [4], "x": [7.0]}))
    a2 = spark.createDataFrame(pd.DataFrame({"k": [4], "x": [None]}).astype({"x": float}))
    got = allclose_audit(a2, b2, keys=["k"], value_cols=["x"], atol=1e18).toPandas()
    assert list(got["kind"]) == ["value"] and pd.isna(got["left_val"].iloc[0])
