"""Token-bucket admission audit — "which requests would a rate limiter
have dropped", replayed deterministically over historical traffic.

Agent/transcript pipelines need this in two places: capacity planning
(what share of a hot conversation's turns exceed the per-entity budget)
and abuse triage (entities whose admitted-rate collapses under any sane
limit are bots). The classic token bucket is a SEQUENTIAL fold — state
``tokens_{i} = min(cap, tokens_{i-1} + rate·Δt) - cost·admitted_i`` — so
it cannot be a window prefix-sum; here it runs as a per-entity JVM
``F.aggregate`` fold over the time-sorted event array (the
``activity_streaks`` device: one shuffle, zero Python, per-entity cost =
its event count, which must fit an executor — the same bound every
collect-ordered operator in this repo carries).

Exactness: everything is integer. Token state lives on the
``rate_den·1e6`` micro-token grid — refill over Δt microseconds is
``rate_num·Δt_us`` units exactly, capacity is ``cap·rate_den·1e6``
units — so an independent engine (the DuckDB recursive-CTE oracle)
replays every admit/deny decision bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_bucket_audit"]


def token_bucket_audit(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    order_col: str,
    id_cols: Sequence[str],
    cap: int,
    rate_num: int,
    rate_den_s: int,
    cost: int = 1,
) -> DataFrame:
    """Replay a token bucket per entity: capacity ``cap`` tokens, refill
    ``rate_num`` tokens per ``rate_den_s`` seconds, each event costs
    ``cost`` tokens; buckets start FULL. An event is admitted iff the
    refilled balance covers its cost (denied events consume nothing —
    the standard drop semantics). Events order by (``ts_col``,
    ``order_col``); ties are processed in that pinned order.

    Output: one row per input event — (``entity_col``, ``id_cols``...,
    ``admitted`` boolean, ``tokens_after_e6den`` bigint = the post-event
    balance on the rate_den·1e6 micro-token grid).

    NULL entity/ts rows are excluded (a rate limiter can't key them).
    """
    if cap < 1 or rate_num < 1 or rate_den_s < 1 or cost < 1:
        raise ValueError(
            "token_bucket_audit: cap, rate_num, rate_den_s, cost must be >= 1"
        )
    if not list(id_cols):
        # an empty id list would build the cast type string
        # 'array<struct<,admitted:...>>' (leading comma) and die with an
        # opaque DDL parse error (ADVICE r5) — name the real problem
        raise ValueError("token_bucket_audit: id_cols must be non-empty")
    unit = int(rate_den_s) * 1_000_000
    cap_u = int(cap) * unit
    cost_u = int(cost) * unit
    ids = list(id_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = F.struct(
        us.alias("t"),
        F.col(order_col).alias("o"),
        *[F.col(c).alias(f"id{i}") for i, c in enumerate(ids)],
    )
    per_ent = (
        df.filter(F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(entity_col)
        .agg(F.array_sort(F.collect_list(ev)).alias("__evs"))
    )
    zero = F.struct(
        F.lit(cap_u).cast("bigint").alias("tok"),
        F.lit(None).cast("bigint").alias("prev"),
        F.array().cast(
            "array<struct<"
            + ",".join(f"id{i}:" + df.schema[c].dataType.simpleString()
                       for i, c in enumerate(ids))
            + ",admitted:boolean,tokens_after:bigint>>"
        ).alias("out"),
    )

    def _step(acc: Column, e: Column) -> Column:
        refill = F.when(
            acc["prev"].isNull(), F.lit(0).cast("bigint")
        ).otherwise((e["t"] - acc["prev"]) * F.lit(int(rate_num)))
        avail = F.least(F.lit(cap_u).cast("bigint"), acc["tok"] + refill)
        admitted = avail >= F.lit(cost_u)
        tok = F.when(admitted, avail - F.lit(cost_u)).otherwise(avail)
        rec = F.struct(
            *[e[f"id{i}"].alias(f"id{i}") for i in range(len(ids))],
            admitted.alias("admitted"),
            tok.alias("tokens_after"),
        )
        return F.struct(
            tok.alias("tok"),
            e["t"].alias("prev"),
            F.concat(acc["out"], F.array(rec)).alias("out"),
        )

    folded = per_ent.select(
        entity_col,
        F.aggregate(F.col("__evs"), zero, _step)["out"].alias("__out"),
    )
    rec = F.explode("__out")
    out = folded.select(entity_col, rec.alias("__r"))
    return out.select(
        entity_col,
        *[F.col(f"__r.id{i}").alias(c) for i, c in enumerate(ids)],
        F.col("__r.admitted").alias("admitted"),
        F.col("__r.tokens_after").alias("tokens_after_e6den"),
    )
