"""REST data-element source (S3) — offline tests with injected transports.

The reference module is scaffolding only (``RestApiService.kt:12-47``
declares the WebClient shape, no callable); this engine completes it. No
network in these tests: the transport contract is exercised with fakes,
which also proves air-gapped clusters can inject their own client.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.sources.rest import rest_enrich, rest_fetch


def _fake_transport(calls):
    """Batch transport: plan = 'p<id>', ltv = id * 1.5; id 7 missing."""

    def transport(keys):
        calls.append(list(keys))
        return [
            {"user_id": k, "plan": f"p{k}", "ltv": k * 1.5}
            for k in keys
            if k != 7
        ]

    return transport


def test_rest_fetch_batches_distinct_keys(spark):
    # the transport runs on executors, so record batch metadata IN the
    # payload: each row carries the size of the batch that fetched it
    def transport(keys):
        return [{"user_id": k, "plan": f"batchsz{len(keys)}", "ltv": k * 1.5}
                for k in keys]

    df = spark.createDataFrame([(i % 5,) for i in range(50)], "user_id long")
    out = rest_fetch(
        spark, df, "user_id", {"plan": "string", "ltv": "double"},
        transport, batch_size=2, max_parallel_fetch=1,
    ).orderBy("user_id").collect()
    # one row per DISTINCT key (5), not per input row (50)
    assert [r["user_id"] for r in out] == [0, 1, 2, 3, 4]
    assert out[3]["ltv"] == 4.5
    # batching honored: no transport call saw more than batch_size keys
    sizes = {int(r["plan"].removeprefix("batchsz")) for r in out}
    assert max(sizes) <= 2


def test_rest_enrich_left_join_and_missing_keys(spark):
    calls = []
    df = spark.createDataFrame(
        [(1, "a"), (7, "b"), (2, "c")], "user_id long, tag string"
    )
    out = rest_enrich(
        df, "user_id", {"plan": "string", "ltv": "double"},
        _fake_transport(calls),
    ).orderBy("user_id").collect()
    assert [r["tag"] for r in out] == ["a", "c", "b"] or len(out) == 3
    by = {r["user_id"]: r for r in out}
    assert by[1]["plan"] == "p1"
    assert by[7]["plan"] is None and by[7]["ltv"] is None  # missing → NULL
    assert by[2]["ltv"] == 3.0


def test_rest_transport_unknown_key_raises(spark):
    def bad(keys):
        return [{"user_id": 999, "plan": "x", "ltv": 0.0}]

    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(Exception, match="unknown key"):
        rest_fetch(spark, df, "user_id", {"plan": "string", "ltv": "double"},
                   bad).collect()


def test_rest_source_wires_into_model_j1(spark):
    """The fetched frame registers as a J1 tier-5 source: a requested name
    resolves across it and joins automatically (broadcast)."""
    import datetime as dt

    from funcify_feature_eng_spark.plans.model import FeatureModel

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10), (2, dt.datetime(2024, 1, 2), 20)],
        "user_id long, ts timestamp, event_id long",
    )
    payloads = rest_fetch(
        spark, ev, "user_id", {"plan": "string"}, _fake_transport([]),
    )
    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"), event_time="ts")
    m.register_source("crm", payloads, join_key="user_id", broadcast=True)
    out = m.materialize(ev, ["user_id", "event_id", "plan"]).orderBy("user_id")
    rows = out.collect()
    assert [r["plan"] for r in rows] == ["p1", "p2"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dimension-sized payloads broadcast


def test_http_transport_retries_then_raises(monkeypatch):
    """Transport-level unit test: retry/backoff without a network."""
    import urllib.request

    from funcify_feature_eng_spark.sources.rest import http_json_transport

    attempts = []

    def boom(req, timeout):
        attempts.append(1)
        raise OSError("connection refused")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    t = http_json_transport("http://unit.test/batch", retries=3, backoff_s=0.0)
    with pytest.raises(RuntimeError, match="after 3 tries"):
        t([1, 2])
    assert len(attempts) == 3
