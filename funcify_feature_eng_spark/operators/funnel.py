"""Ordered-step funnels and retention cohorts, exactly.

Two classic product/behavior analytics shapes the event-stream feature
surface was missing; both are integer-exact, one-shuffle-per-side jobs:

**Funnel** (:func:`funnel_steps`): per entity, the furthest prefix of an
ordered step list reached by its event stream — "did this user signup,
THEN view, THEN purchase" — with an optional conversion window measured
from the first step. Semantics pinned so an independent engine reproduces
the hash bit-for-bit:

- Events order by the tuple ``(ts, order_col)`` — ``order_col`` must be
  unique per row (the repo-wide tie-break convention, cf. next_purchase).
- **First-touch anchoring**: step 1 matches the entity's EARLIEST step-1
  event, each later step matches the earliest qualifying event strictly
  after the previously matched tuple; there is no re-anchoring when a
  later start would convert further (the classic deterministic funnel —
  re-anchoring variants are a scan over the same fold).
- ``within_s`` bounds steps 2..k to ``within_s`` seconds of the matched
  step-1 event (conversion window from first touch).

Physical shape: filter to step types (tiny fraction of the stream), ONE
shuffle onto entity grain, ``collect_list`` + ``array_sort`` + an
``F.aggregate`` fold — all JVM higher-order functions, zero Python. The
per-entity array holds only step-typed events, and the fold is O(events);
at 100 TB the bound is the hottest entity's step-event count, the same
bound sessionization and collect_ordered already carry.

**Retention cohorts** (:func:`retention_cohorts`): users cohorted by the
fixed-width period of their first event; for each (cohort, period-offset)
the count of distinct users active in that offset. Period = integer
``floor(epoch_us / period_us)`` — NOT date_trunc, whose week-start anchor
is an engine-configuration detail; the epoch grid reproduces everywhere.
ONE data-sized shuffle (collect_set of periods per user, map-side
combined), from which cohort AND activity both derive; the remaining
aggregates run over (user, period) pairs and the cohort-size join-back
broadcasts an O(cohorts) table.

Reference parity anchor: the reference's stream/materializer has no
funnel or cohort operator (its temporal surface is point-in-time reads,
``materializer/.../TrackableValue.kt``); this extends the event-stream
family (SURVEY §2 extensions) beside sessionization and
event_transitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "retention_cohorts"]


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    within_s: int | None = None,
) -> DataFrame:
    """Per-entity funnel progress over ``steps`` (ordered event-type names).

    Output: one row per entity with at least one step-1 event —
    ``(user_col, steps_completed:int, ts_1..ts_k:timestamp)``; ``ts_i`` is
    the matched step-i event time (NULL past ``steps_completed``).
    Entities that never fire step 1 are absent (their funnel state is
    vacuous; left-join the entity universe if zeros are needed).

    NULL ``ts``/``type``/``user`` rows are excluded — an unordered event
    cannot sit in an ordered funnel. ``within_s`` (optional) requires
    steps 2..k to land within that many seconds of the matched step-1
    event. See the module doc for the exact first-touch semantics.
    """
    k = len(steps)
    if k < 1:
        raise ValueError("funnel_steps: need at least one step")
    if len(set(steps)) != k:
        # a repeated type is ambiguous under prefix matching ("view, view"
        # would re-match the SAME event without an occurrence discipline);
        # model repeat-steps explicitly upstream (e.g. dedup by occurrence)
        raise ValueError(f"funnel_steps: steps must be distinct, got {steps!r}")
    if within_s is not None and within_s < 1:
        raise ValueError(f"funnel_steps: within_s must be >= 1, got {within_s}")

    step_idx = None
    for i, s in enumerate(steps):
        c = F.when(F.col(type_col) == F.lit(s), F.lit(i))
        step_idx = c if step_idx is None else step_idx.when(
            F.col(type_col) == F.lit(s), F.lit(i)
        )

    ev = (
        df.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isin(list(steps))
        )
        .select(
            F.col(user_col),
            F.struct(
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
                F.col(order_col).cast("bigint").alias("oid"),
                step_idx.cast("int").alias("step"),
            ).alias("__e"),
        )
    )

    # ONE shuffle onto entity grain; array_sort orders by (us, oid, step) —
    # (us, oid) is unique per row, so the sort is total and the fold's
    # "later array position" IS the strictly-after-tuple relation.
    grouped = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e")).alias("__evs")
    )

    # fold state: the matched step timestamps so far (size = next step to
    # match). An event matches iff its step index equals that size and it
    # sits inside the conversion window (measured from matched[0]).
    win = F.lit(int(within_s) * 1_000_000) if within_s is not None else None

    def _step(acc: Column, e: Column) -> Column:
        matches = e["step"] == F.size(acc)
        if win is not None:
            matches = matches & (
                (F.size(acc) == 0) | (e["us"] <= F.element_at(acc, 1) + win)
            )
        return F.when(
            (F.size(acc) < F.lit(k)) & matches,
            F.concat(acc, F.array(e["us"])),
        ).otherwise(acc)

    matched = F.aggregate(
        F.col("__evs"), F.lit([]).cast("array<bigint>"), _step
    )
    out = grouped.select(
        F.col(user_col),
        matched.alias("__m"),
    ).filter(F.size("__m") > 0)
    cols: list[Column] = [
        F.col(user_col),
        F.size("__m").alias("steps_completed"),
    ]
    for i in range(1, k + 1):
        # element_at returns NULL past the array end — exactly the
        # "not reached" encoding the output contract wants
        cols.append(
            F.timestamp_micros(
                F.when(F.size("__m") >= i, F.element_at("__m", i))
            ).alias(f"ts_{i}")
        )
    return out.select(*cols).drop("__m")


def retention_cohorts(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohorted retention counts on a fixed epoch-aligned period grid.

    Output: ``(cohort:bigint, offset:bigint, n_active:bigint,
    cohort_size:bigint)`` — ``cohort`` = period index (``floor(epoch_us
    of the user's first event / period_us)``) of the user's first event,
    ``offset`` = periods since the cohort period (0 = the cohort period
    itself, so every cohort has an offset-0 row with ``n_active ==
    cohort_size``), ``n_active`` = distinct users of that cohort with any
    event in that offset. NULL ts/user rows are excluded.

    The grid is anchored at the Unix epoch, not a week-start — engine
    configuration (locale week starts) can never shift the buckets.
    """
    if period_s < 1:
        raise ValueError(f"retention_cohorts: period_s must be >= 1, got {period_s}")
    p_us = int(period_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # epoch_us is non-negative for any post-1970 stream, but keep floor
    # (toward -inf) semantics exact for pre-epoch timestamps too
    from .util import exact_floor_div

    base = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u"),
        exact_floor_div(us.cast("decimal(38,0)"), F.lit(p_us).cast("decimal(38,0)"))
        .alias("__p"),
    )
    # ONE data-sized shuffle: collect the user's distinct period set (map-side
    # combined; bounded by periods-per-user — a few thousand even for years of
    # daily grain), from which BOTH the cohort (array_min) and the activity
    # rows (explode) derive — no separate min-aggregate, no (u, p) distinct,
    # no user-grain re-join
    per_user = base.groupBy("__u").agg(F.collect_set("__p").alias("__ps"))
    exploded = per_user.select(
        F.array_min("__ps").alias("cohort"), F.explode("__ps").alias("__p")
    )
    ret = exploded.groupBy(
        "cohort", (F.col("__p") - F.col("cohort")).alias("offset")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    sizes = per_user.groupBy(F.array_min("__ps").alias("cohort")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    # sizes is O(number of cohorts) — always broadcast-able
    return ret.join(F.broadcast(sizes), on="cohort", how="inner").select(
        "cohort", "offset", "n_active", "cohort_size"
    )
