"""Touch attribution: credit each conversion to a marketing/interaction touch.

The funnel family's companion question — not "how far did the user get"
(operators/funnel.py) but "WHICH earlier touch gets the credit for this
conversion". Two standard single-touch models, both deterministic:

- ``last_touch``: the latest touch event strictly before the conversion
  (optionally within a lookback window) — "what finally drove it".
- ``first_touch``: the earliest touch event strictly before the
  conversion (within the same optional lookback) — "what started it".

Semantics pinned for cross-engine reproduction:

- "before" is strict on the ``(ts, order_col)`` tuple (repo-wide
  tie-break; ``order_col`` unique per row), so a touch sharing the
  conversion's timestamp attributes iff its order id is smaller.
- ``lookback_s`` bounds the credit window: a touch older than
  ``lookback_s`` seconds before the conversion is never credited
  (NULL attribution, not the next-older touch outside the window).
- Touch and conversion type sets must be disjoint — an event crediting
  itself is a modeling error, rejected at plan time.

Physical shape: ONE shuffle onto entity grain and one ordered window pass
(running ``last``/``first`` over touch-typed structs with ignorenulls) —
the sessionization cost envelope, linear in events. ``last_touch`` with a
lookback needs no second pass: the running-latest struct carries its
timestamp, and staleness is a post-filter. ``first_touch`` with a
lookback is genuinely harder (the earliest touch INSIDE a sliding window
is not a running aggregate): it uses an event-time RANGE frame lower
bound instead — still one window pass, same shuffle.

Reference parity anchor: the reference's temporal surface is
point-in-time reads (``schema/.../TrackableValue.kt``); attribution
extends the event-stream family beside funnel_steps and
event_transitions (SURVEY §2 extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attribute_conversions"]


def attribute_conversions(
    df: DataFrame,
    *,
    touch_types: Sequence[str],
    conversion_types: Sequence[str],
    model: str = "last_touch",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lookback_s: int | None = None,
) -> DataFrame:
    """One row per conversion event: ``(user_col, conversion_id,
    conversion_type, conversion_ts, touch_type, touch_ts)`` — the credited
    touch under ``model`` (NULL touch columns when no touch qualifies).

    NULL user/ts rows are excluded (unordered events can't attribute).
    See the module doc for the pinned strict-before / lookback semantics.
    """
    touches = list(touch_types)
    convs = list(conversion_types)
    if not touches or not convs:
        raise ValueError("attribute_conversions: touch/conversion types required")
    overlap = set(touches) & set(convs)
    if overlap:
        raise ValueError(
            f"attribute_conversions: types {sorted(overlap)} are both touch "
            "and conversion — an event must not credit itself"
        )
    if model not in ("last_touch", "first_touch"):
        raise ValueError(
            f"attribute_conversions: model must be last_touch|first_touch, "
            f"got {model!r}"
        )
    if lookback_s is not None and lookback_s < 1:
        raise ValueError(
            f"attribute_conversions: lookback_s must be >= 1, got {lookback_s}"
        )
    oid_t = df.schema[order_col].dataType.simpleString()
    if oid_t not in ("tinyint", "smallint", "int", "bigint"):
        # the bigint cast below would silently turn a string/UUID id into
        # NULL, degenerating the (ts, oid) tie-break AND emitting NULL
        # conversion_id for every row — fail loudly instead
        raise ValueError(
            f"attribute_conversions: order_col {order_col!r} must be an "
            f"integral event id (got {oid_t}); hash or index non-numeric "
            "ids first (e.g. F.xxhash64)"
        )

    base = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(touches + convs)
    ).select(
        F.col(user_col),
        F.col(type_col).alias("__type"),
        F.col(order_col).cast("bigint").alias("__oid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
    )
    is_touch = F.col("__type").isin(touches)
    touch_struct = F.when(
        is_touch, F.struct(F.col("__us"), F.col("__oid"), F.col("__type"))
    )
    w = Window.partitionBy(user_col).orderBy("__us", "__oid")
    if model == "last_touch":
        # running latest touch up to the PREVIOUS row — strict-before for
        # free, no self-credit even on (ts, oid) ties
        cred = F.last(touch_struct, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        if lookback_s is not None:
            lb = F.lit(int(lookback_s) * 1_000_000)
            cred = F.when(cred["__us"] >= F.col("__us") - lb, cred)
    else:
        if lookback_s is None:
            cred = F.first(touch_struct, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
        else:
            # earliest touch inside the sliding lookback: an event-time
            # RANGE frame on the micros axis, aggregated with MIN over the
            # (us, oid, type) struct — lexicographic struct-min is
            # order-INdependent, so ties at the frame's earliest instant
            # resolve deterministically (F.first over a range frame would
            # be partition-order-dependent among equal-us rows). The frame
            # includes the current instant, so the strict-before tuple
            # check is re-applied explicitly on the credited struct (the
            # running-last variant gets it free from rowsBetween(-1)).
            wr = Window.partitionBy(user_col).orderBy("__us").rangeBetween(
                -int(lookback_s) * 1_000_000, 0
            )
            cred = F.min(touch_struct).over(wr)
            cred = F.when(
                (cred["__us"] < F.col("__us"))
                | ((cred["__us"] == F.col("__us")) & (cred["__oid"] < F.col("__oid"))),
                cred,
            )
    out = base.withColumn("__cred", cred).filter(F.col("__type").isin(convs))
    return out.select(
        F.col(user_col),
        F.col("__oid").alias("conversion_id"),
        F.col("__type").alias("conversion_type"),
        F.timestamp_micros(F.col("__us")).alias("conversion_ts"),
        F.col("__cred.__type").alias("touch_type"),
        F.timestamp_micros(F.col("__cred.__us")).alias("touch_ts"),
    )
