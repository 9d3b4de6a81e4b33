"""Fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.linkage import (
    blocked_edit_pairs,
    canonicalize,
)

LAST_TOKEN = lambda c: F.regexp_extract(c, r"([^ ]+)$", 1)  # noqa: E731
# typo-robust block: a corrupted token corrupts an exact-token block key
# ("blue widgett" leaves the "widget" block entirely); soundex absorbs it
SOUNDEX_FIRST = lambda c: F.soundex(F.split(c, " ").getItem(0))  # noqa: E731


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "blue widget"),
        (2, "blue widgett"),   # dist 1 from blue widget
        (3, "blu widget"),     # dist 1 from blue widget, 2 from widgett
        (4, "red gear"),
        (5, "red gear"),       # exact dup row: distinct-name layer collapses
        (6, "rad gear"),       # dist 1 from red gear
        (7, "green plate"),    # alone in its block
        (8, "blue plate"),     # same block as 7, dist 3
        (9, None),
    ]
    return spark.createDataFrame(rows, "id int, name string")


def test_pairs_basic(spark, frame):
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in blocked_edit_pairs(
            frame, "name", block=SOUNDEX_FIRST, max_dist=2
        ).collect()
    }
    assert got == {
        ("blu widget", "blue widget", 1),
        ("blu widget", "blue widgett", 2),
        ("blue widget", "blue widgett", 1),
        ("rad gear", "red gear", 1),
    }
    # "blue plate" shares the B400 block with the widget trio but sits at
    # distance > 2; "green plate" is alone in G650
    # recall limit of exact-token blocking, pinned: "blue widgett"'s typo
    # corrupts a last-token block key, so LAST_TOKEN finds only the pairs
    # whose noun survived intact
    lt = {
        (r["name_a"], r["name_b"])
        for r in blocked_edit_pairs(
            frame, "name", block=LAST_TOKEN, max_dist=2
        ).collect()
    }
    assert lt == {("blu widget", "blue widget"), ("rad gear", "red gear")}


def test_length_band_respected(spark):
    # distance within band only because the band uses max_dist: "ab"/"abcd"
    # differ by 2 in length — included at max_dist=2, excluded at 1
    df = spark.createDataFrame([(1, "ab x"), (2, "abcd x")], "id int, name string")
    two = blocked_edit_pairs(df, "name", block=LAST_TOKEN, max_dist=2).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in two] == [
        ("ab x", "abcd x", 2)
    ]
    assert blocked_edit_pairs(df, "name", block=LAST_TOKEN, max_dist=1).count() == 0


def test_oversize_error_and_skip(spark):
    df = spark.createDataFrame(
        [(i, f"name{i} blk") for i in range(12)] + [(99, "solo other")],
        "id int, name string",
    )
    with pytest.raises(ValueError, match="exceed max_block=10"):
        blocked_edit_pairs(df, "name", block=LAST_TOKEN, max_dist=2, max_block=10)
    # skip drops the hot block whole; the surviving block has one member
    out = blocked_edit_pairs(
        df, "name", block=LAST_TOKEN, max_dist=2, max_block=10, on_oversize="skip"
    )
    assert out.count() == 0


def test_canonicalize_transitive_and_identity(spark, frame):
    pairs = blocked_edit_pairs(frame, "name", block=SOUNDEX_FIRST, max_dist=2)
    out = canonicalize(frame, "name", pairs)
    canon = {r["id"]: r["canonical"] for r in out.collect()}
    # widget chain {blu widget, blue widget, blue widgett} → min member
    assert canon[1] == canon[2] == canon[3] == "blu widget"
    assert canon[4] == canon[5] == canon[6] == "rad gear"
    # unmatched values canonicalize to themselves; NULL stays NULL
    assert canon[7] == "green plate" and canon[8] == "blue plate"
    assert canon[9] is None
    assert out.count() == frame.count()  # no row duplication or loss


def test_no_python_in_plan(spark, frame):
    plan = (
        blocked_edit_pairs(frame, "name", block=LAST_TOKEN, max_dist=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
