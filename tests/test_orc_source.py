"""ORC path format for read_table/write_table (sources/tables.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.sources.tables import read_table, write_table


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, "a", 0.0)],
        "id long, k string, v double",
    ).withColumn("ts", F.timestamp_seconds(F.col("id") * 100))
    loc = os.path.join(str(tmp_path), "t_orc")
    write_table(df, loc, mode="overwrite", file_format="orc")
    out = read_table(
        spark, loc, columns=["id", "k", "v", "ts"],
        predicate=F.col("k") == "a", file_format="orc",
    )
    rows = sorted((r["id"], r["k"], r["v"], r["ts"]) for r in out.collect())
    want = sorted(
        (r["id"], r["k"], r["v"], r["ts"])
        for r in df.filter("k = 'a'").collect()
    )
    assert rows == want  # values, doubles, and timestamps survive the trip
    # projection + predicate must reach the ORC scan itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(k)" in plan, plan
    assert "ReadSchema" in plan and "v:double" in plan.replace(" ", ""), plan


def test_unknown_format_rejected(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(ValueError, match="file_format"):
        write_table(df, str(tmp_path / "x"), file_format="avro")
    with pytest.raises(ValueError, match="file_format"):
        read_table(spark, str(tmp_path / "x"), file_format="csvish")


def test_bare_orc_filename_routes_to_path_reader(spark, tmp_path):
    # A bare filename with a data-file suffix is a PATH, not a catalog table.
    # Assert the routing branch itself (no relative-path write: Spark's JVM
    # resolves relative paths against ITS launch cwd, not Python's chdir —
    # a relative write here would land outside tmp_path).
    from funcify_feature_eng_spark.sources.tables import _is_path

    assert _is_path("events.orc") and _is_path("events.parquet")
    assert _is_path("file:relative") and _is_path("dir/t")
    assert not _is_path("catalog.db.events")
    # and the path branch is actually taken: a missing bare .orc name fails
    # as a PATH error, never as "table or view not found"
    with pytest.raises(Exception) as ei:
        read_table(spark, str(tmp_path / "nope.orc"), file_format="orc").collect()
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(ei.value)
