"""Calibration operators (operators/calibration.py)."""

from fractions import Fraction
from math import floor

import pytest

from funcify_feature_eng_spark.operators.calibration import (
    calibration_summary,
    reliability_bins,
)

_PPM = 1_000_000


def _ref(rows, n_bins):
    """Independent rational-arithmetic reliability + ECE reference."""
    bins = {}
    for s, y in rows:
        if s is None or y is None:
            continue
        b = max(0, min(n_bins - 1, (s * n_bins) // _PPM))
        n, pos, ssum = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, pos + y, ssum + s)
    table = {
        b: (
            n, pos,
            floor(Fraction(_PPM * pos, n)),
            floor(Fraction(ssum, n)),
            floor(Fraction(abs(_PPM * pos - ssum), n)),
        )
        for b, (n, pos, ssum) in bins.items()
    }
    ntot = sum(n for n, _, _ in bins.values())
    ece = floor(
        Fraction(sum(abs(_PPM * pos - ssum) for _, pos, ssum in bins.values()), ntot)
    ) if ntot else None
    mce = max(g for *_, g in table.values()) if table else None
    return table, ntot, ece, mce


_ROWS = [
    (50_000, 0), (120_000, 0), (180_000, 1),       # bins 0,1,1
    (450_000, 0), (470_000, 1), (499_999, 1),      # bin 4
    (500_000, 0), (730_000, 1),                    # bins 5,7
    (900_000, 1), (999_999, 1), (1_000_000, 1),    # bins 9,9,9 (clamped)
    (None, 1), (300_000, None),                    # excluded
]


def test_reliability_bins_match_rational_reference(spark):
    df = spark.createDataFrame(_ROWS, "s long, y int")
    out = {
        r["bin"]: (r["n"], r["n_pos"], r["acc_ppm"], r["conf_ppm"], r["gap_ppm"])
        for r in reliability_bins(df, score_e6="s", label="y", n_bins=10).collect()
    }
    table, *_ = _ref(_ROWS, 10)
    assert out == table
    # boundary score 1e6 clamps into bin 9, never a phantom bin 10
    assert 10 not in out and out[9][0] == 3


def test_calibration_summary_matches_reference(spark):
    df = spark.createDataFrame(_ROWS, "s long, y int")
    row = calibration_summary(df, score_e6="s", label="y", n_bins=10).collect()[0]
    _, ntot, ece, mce = _ref(_ROWS, 10)
    assert (row["n"], row["ece_ppm"], row["mce_ppm"]) == (ntot, ece, mce)
    # gap is computed on the exact rationals, not double-floored ppm:
    # a bin with pos6 % n != 0 distinguishes the two definitions
    assert row["ece_ppm"] is not None


def test_calibration_grouped_and_perfect(spark):
    # perfectly calibrated group: score 1e6 with label 1 -> ece = 0
    rows = [("a", 1_000_000, 1)] * 3 + [("a", 0, 0)] * 2 + [
        ("b", 800_000, 0), ("b", 800_000, 0),
    ]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    out = {r["g"]: r for r in calibration_summary(
        df, score_e6="s", label="y", group_by=["g"]).collect()}
    assert out["a"]["ece_ppm"] == 0 and out["a"]["mce_ppm"] == 0
    # group b: claims 0.8, delivers 0 -> gap exactly 800000 ppm
    assert out["b"]["ece_ppm"] == 800_000 == out["b"]["mce_ppm"]
    with pytest.raises(ValueError):
        reliability_bins(df, score_e6="s", label="y", n_bins=0)


def test_calibration_states_merge_equals_whole(spark):
    from funcify_feature_eng_spark.operators.calibration import (
        calibration_state,
        merge_calibration_states,
        reliability_from_state,
    )

    rows = [(i, (i * 131) % 1_000_001, 1 if i % 4 == 0 else 0)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    whole = {
        r["bin"]: r.asDict()
        for r in reliability_bins(df, score_e6="s", label="y").collect()
    }
    parts = [df.filter(f"id % 3 = {k}") for k in range(3)]
    states = None
    for p in parts:
        st = calibration_state(p, score_e6="s", label="y")
        states = st if states is None else states.unionByName(st)
    merged = reliability_from_state(merge_calibration_states(states))
    got = {r["bin"]: r.asDict() for r in merged.collect()}
    assert got == whole


def test_calibration_monitor_stream_matches_batch(spark, tmp_path):
    import os

    from funcify_feature_eng_spark.operators.calibration import (
        merge_calibration_states,
        reliability_from_state,
    )
    from funcify_feature_eng_spark.streaming.runner import (
        calibration_monitor_stream,
    )

    rows = [(i, (i * 37) % 1_000_001, 1 if i % 5 == 0 else 0)
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    src = str(tmp_path / "src")
    # two explicit micro-batch files
    df.filter("id < 150").coalesce(1).write.parquet(os.path.join(src, "b0"))
    df.filter("id >= 150").coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    ledger = str(tmp_path / "ledger")
    q = calibration_monitor_stream(
        stream, ledger, score_e6="s", label="y",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    states = spark.read.parquet(ledger)
    # ledger carries >= 2 batch stamps and merges to the batch answer
    assert states.select("batch_id").distinct().count() >= 2
    merged = reliability_from_state(
        merge_calibration_states(states.drop("batch_id"))
    )
    got = {r["bin"]: r.asDict() for r in merged.collect()}
    whole = {
        r["bin"]: r.asDict()
        for r in reliability_bins(df, score_e6="s", label="y").collect()
    }
    assert got == whole
