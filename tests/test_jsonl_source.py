"""JSON-lines source (sources/tables.py::read_jsonl)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from funcify_feature_eng_spark.sources.tables import read_jsonl

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _write(tmp_path, lines):
    p = tmp_path / "ev.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


GOOD = [
    '{"event_id": 1, "event_type": "view", "value": 1.5}',
    '{"event_id": 2, "event_type": "purchase", "value": 12.25}',
    '{"event_id": 3, "event_type": "view", "value": null}',
]


def test_read_jsonl_failfast_and_pushdown(spark, tmp_path):
    src = _write(tmp_path, GOOD)
    out = read_jsonl(spark, src, SCHEMA,
                     columns=["event_id", "value"],
                     predicate=F.col("event_type") == "purchase")
    rows = out.collect()
    assert [(r["event_id"], r["value"]) for r in rows] == [(2, 12.25)]
    assert out.columns == ["event_id", "value"]


def test_read_jsonl_failfast_raises_on_corrupt(spark, tmp_path):
    src = _write(tmp_path, GOOD + ['{"event_id": broken'])
    with pytest.raises(Exception):
        read_jsonl(spark, src, SCHEMA).collect()


def test_read_jsonl_permissive_quarantines(spark, tmp_path):
    bad = '{"event_id": broken'
    src = _write(tmp_path, GOOD + [bad])
    out = read_jsonl(spark, src, SCHEMA, permissive=True).collect()
    corrupt = [r for r in out if r["_corrupt_record"] is not None]
    assert len(out) == 4 and len(corrupt) == 1
    assert corrupt[0]["_corrupt_record"] == bad
    assert all(r["event_id"] in (1, 2, 3) for r in out
               if r["_corrupt_record"] is None)


def test_read_jsonl_permissive_predicate_keeps_quarantine(spark, tmp_path):
    """A caller predicate must filter VALID rows only: a malformed line
    parses to all-NULL declared fields, where the predicate evaluates
    NULL and a bare filter() would silently drop the quarantined row —
    the exact loss quarantine mode exists to prevent. Projection likewise
    must not drop the corrupt column."""
    from pyspark.sql import functions as F

    bad = '{"event_id": broken'
    src = _write(tmp_path, GOOD + [bad])
    out = read_jsonl(
        spark, src, SCHEMA, permissive=True,
        predicate=F.col("event_id") >= 2,
        columns=["event_id"],
    ).collect()
    corrupt = [r for r in out if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["_corrupt_record"] == bad
    assert sorted(r["event_id"] for r in out if r["_corrupt_record"] is None) \
        == [2, 3]
