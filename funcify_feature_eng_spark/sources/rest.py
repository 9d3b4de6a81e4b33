"""REST data-element source (S3) — the reference module the reference
itself never finished.

Reference scaffolding: ``funcify-feature-eng-rest-data-source`` declares a
service shape (host/port/context-path/timeout WebClient builder,
``RestApiService.kt:12-47``; provider ``RestApiDataElementSourceProvider.kt``)
but ships no callable — no request is ever issued. This module is the
Spark-first completion of that intent: entity keys flow OUT of the frame in
Arrow batches, a transport fetches payloads per batch, and typed columns
flow back — so a REST-backed data element joins the same J1 wiring as any
table-backed source.

Design for 10^12-row reality:

* **The frame drives the fetch, batched.** ``mapInPandas`` over the
  DISTINCT key frame → one transport call per ``batch_size`` keys per Arrow
  batch. A row-at-a-time UDF issuing one HTTP call per row is the classic
  meltdown; the batch endpoint contract (ids in → documents out) is the
  only shape that survives.
* **Bounded fan-out.** Executors call out concurrently per partition;
  ``coalesce(max_parallel_fetch)`` before the fetch caps global concurrency
  against the remote service — backpressure by partition count, no
  client-side rate limiter needed.
* **Transport is injected.** ``transport(keys: list) -> list[dict]`` — the
  default (:func:`http_json_transport`) POSTs a JSON id batch with retries
  and timeout (``RestApiService.kt`` fields ``timeoutAfter``/host/port/
  context-path). Tests and air-gapped runs inject a fake; the Spark-side
  plumbing (schema, batching, distinct-fan-in, join-back) is identical and
  fully tested offline.
* **Missing keys → NULL columns** (left join semantics, like an absent
  store row); the transport returning extra keys is an error surfaced
  loudly (payload discipline, not silent truncation).

Usage::

    enriched = rest_enrich(
        df, key_col="user_id",
        fields={"plan": "string", "ltv": "double"},
        transport=my_transport,          # or http_json_transport(url)
        batch_size=512, max_parallel_fetch=8,
    )

or as a J1-wired source on a model::

    payloads = rest_fetch(spark, df.select("user_id"), "user_id",
                          {"plan": "string"}, transport)
    model.register_source("crm", payloads, join_key="user_id", broadcast=True)
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Transport = Callable[[list], list[dict]]


def http_json_transport(
    url: str,
    key_field: str = "ids",
    timeout_s: float = 20.0,
    retries: int = 3,
    backoff_s: float = 0.5,
    headers: dict[str, str] | None = None,
) -> Transport:
    """Default transport: POST ``{key_field: [...]}`` as JSON, expect a JSON
    list of row dicts back. 20 s default timeout mirrors the reference's
    request ceiling (``materializer`` 20 s dispatch timeout). Retries with
    exponential backoff on transient failures; raises after ``retries``.
    stdlib-only (urllib) so no client library is required on executors."""
    import json
    import urllib.request

    def transport(keys: list) -> list[dict]:
        import urllib.error

        body = json.dumps({key_field: list(keys)}).encode()
        last: Exception | None = None
        for attempt in range(retries):
            try:
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "application/json", **(headers or {})},
                )
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as e:
                if e.code < 500:  # 4xx: the request is wrong — never retry
                    raise RuntimeError(
                        f"REST transport client error {e.code}: {e.reason}"
                    ) from e
                last = e
            except Exception as e:  # transient network/5xx/timeout — retry
                last = e
            if attempt + 1 < retries:  # no pointless sleep after the last try
                time.sleep(backoff_s * (2 ** attempt))
        raise RuntimeError(f"REST transport failed after {retries} tries: {last}") from last

    return transport


def rest_fetch(
    spark: SparkSession,
    keys_df: DataFrame,
    key_col: str,
    fields: dict[str, str],
    transport: Transport,
    batch_size: int = 512,
    max_parallel_fetch: int = 8,
) -> DataFrame:
    """Fetch one payload row per DISTINCT key: returns a DataFrame
    ``(key_col, *fields)`` suitable for ``register_source`` / joins.

    ``fields`` maps payload field → Spark type (the S3 analog of the
    source's SDL type definitions). Fields the transport omits are NULL;
    keys the transport invents raise."""
    schema = ", ".join(
        [f"{key_col} {keys_df.schema[key_col].dataType.simpleString()}"]
        + [f"{name} {typ}" for name, typ in fields.items()]
    )
    field_names = list(fields)

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys = pdf[key_col].tolist()
            for i in range(0, len(keys), batch_size):
                chunk = keys[i : i + batch_size]
                rows = transport(chunk)
                chunk_set = set(chunk)
                by_key: dict[Any, dict] = {}
                for r in rows:
                    if r[key_col] not in chunk_set:
                        raise ValueError(
                            f"REST transport returned unknown key {r[key_col]!r}"
                        )
                    by_key[r[key_col]] = r
                out = {key_col: chunk}
                for f_ in field_names:
                    out[f_] = [by_key.get(k, {}).get(f_) for k in chunk]
                yield pd.DataFrame(out)

    distinct = keys_df.select(key_col).distinct()
    # bounded fan-out: at most max_parallel_fetch concurrent transports
    return distinct.coalesce(max_parallel_fetch).mapInPandas(fetch, schema)


def rest_enrich(
    df: DataFrame,
    key_col: str,
    fields: dict[str, str],
    transport: Transport,
    batch_size: int = 512,
    max_parallel_fetch: int = 8,
    broadcast: bool = True,
) -> DataFrame:
    """Attach REST payload columns to ``df`` (left join on ``key_col``) —
    the one-call data-element enrichment. The fetch runs over DISTINCT
    keys (a 10^12-row frame with 10^6 entities issues 10^6/batch_size
    calls, not 10^12), and the fetched side broadcasts by default
    (dimension-sized payloads; disable for huge key spaces)."""
    payloads = rest_fetch(
        df.sparkSession, df, key_col, fields, transport, batch_size,
        max_parallel_fetch,
    )
    right = F.broadcast(payloads) if broadcast else payloads
    return df.join(right, on=key_col, how="left")
