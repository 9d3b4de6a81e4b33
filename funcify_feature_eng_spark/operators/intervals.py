"""Validity-interval (range) join: fact rows against interval-keyed state.

The reference's temporal alignment is point-in-time ("latest prior state",
``funcify-feature-eng``'s @lastUpdated lookup — our ``operators/asof.py``).
Its natural sibling, which the reference leaves to the caller, is the
*containment* lookup: attach every interval whose ``[start, end)`` span
covers the fact row's timestamp (SCD-2 dimension epochs, campaign/context
windows, maintenance periods). Spark has no native range join — a raw
``ts >= start AND ts < end`` condition plans as BroadcastNestedLoopJoin
(O(n·m) pairs even with an equi-key, when the key is skewed or absent).

Two explicit strategies, value-identical (pinned by tests):

``broadcast``
    Equi-join on the entity key with the containment filter applied post
    join; right side broadcast. Right for a small interval table (the
    common dimension-epoch case). With the equi-key this is a
    BroadcastHashJoin — the nested loop never appears.

``bucket`` (the 100 TB path)
    Time is cut into fixed-width buckets; each interval explodes to the
    buckets it touches (``sequence`` on epoch-floored longs), each fact row
    computes its single bucket, and the join becomes a pure equi-join on
    ``(key, bucket)`` — ONE shuffle per side, partial pruning for free,
    AQE-skew-splittable. The exact containment filter runs after the hash
    join. A (fact, interval) pair survives exactly once: the fact's single
    bucket either is or is not among the interval's exploded buckets, and
    those are distinct per interval. Pick ``bucket_s`` at or above the
    typical interval length — each interval produces
    ``span/bucket_s + 1`` rows, so a too-fine grid multiplies the right
    side (that amplification is the entire cost model; there is no
    quadratic term anywhere).

Containment is half-open ``start <= ts < end`` (the SCD-2 convention:
adjacent epochs share a boundary instant without double-matching).
Intervals with ``end <= start`` are empty under half-open semantics and are
dropped up front — this also keeps ``sequence`` from generating a
descending bucket range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _us(col: str) -> Column:
    """Epoch-micros of a timestamp column; TIMESTAMP_NTZ inputs (the parquet
    testdata's type) are cast first — applied to BOTH sides of every
    comparison, so the session-timezone offset cancels."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    start: str = "valid_from",
    end: str = "valid_to",
    how: str = "inner",
    strategy: str = "bucket",
    bucket_s: int = 3600,
    max_buckets_per_interval: int = 100_000,
    null_end_is_open: bool = False,
) -> DataFrame:
    """Attach every interval row whose ``[start, end)`` contains ``fact.ts``.

    Output = fact columns + the interval's non-key payload columns (callers
    select/rename payload before the call as usual). ``how`` is ``inner``
    (facts covered by no interval drop) or ``left`` (they survive with NULL
    payload). Multi-match fans out — one output row per covering interval.

    ``null_end_is_open=True`` reads a NULL ``end`` as +infinity — the SCD-2
    current-epoch convention (:func:`scd2_from_changes` emits it). Open
    intervals can't bucket-explode; under the ``bucket`` strategy they take
    a separate pure equi-join on the keys (per key there is at most one
    open epoch in a well-formed SCD-2 table, so that branch never fans
    out), unioned with the closed-interval path.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how must be inner|left, got {how!r}")
    if strategy not in ("broadcast", "bucket"):
        raise ValueError(
            f"interval_join: strategy must be broadcast|bucket, got {strategy!r}"
        )
    nonempty = F.col(end) > F.col(start)
    if null_end_is_open:
        right = intervals.filter(F.col(end).isNull() | nonempty)
        contains = (_us(ts) >= _us(start)) & (
            F.col(end).isNull() | (_us(ts) < _us(end))
        )
    else:
        right = intervals.filter(nonempty)
        # compare in epoch-micros so NTZ facts join TZ intervals (or vice
        # versa) without relying on Spark's implicit coercion
        contains = (_us(ts) >= _us(start)) & (_us(ts) < _us(end))

    if strategy == "broadcast":
        joined = fact.join(F.broadcast(right), on=keys, how="inner").filter(contains)
    else:
        w_us = int(bucket_s) * 1_000_000
        # end is exclusive: an interval ending exactly on a bucket boundary
        # never covers a ts in that next bucket, so floor((end-1µs)/W) is the
        # last bucket it can match in
        first_b = F.floor(_us(start) / F.lit(w_us))
        last_b = F.floor((_us(end) - F.lit(1)) / F.lit(w_us))
        # runtime span guard: ONE unbounded interval (an SCD-2 open epoch, a
        # sentinel end-of-time) would otherwise explode to millions of rows
        # and silently dominate the job. assert_true returns NULL when the
        # check passes; feeding it through the upper bound keeps Catalyst
        # from pruning it away.
        span_ok = (last_b - first_b) < F.lit(int(max_buckets_per_interval))
        msg = F.concat(
            F.lit(
                "interval_join: an interval spans >= "
                f"{max_buckets_per_interval} buckets of {bucket_s}s — raise "
                "bucket_s / max_buckets_per_interval, cap open-ended "
                "intervals, or use strategy='broadcast'; offending span: "
            ),
            F.col(start).cast("string"), F.lit(" .. "), F.col(end).cast("string"),
        )
        last_checked = last_b + F.coalesce(
            F.assert_true(span_ok, msg).cast("long"), F.lit(0)
        )
        closed = right.filter(F.col(end).isNotNull()) if null_end_is_open else right
        right_b = closed.withColumn(
            "__ij_bucket", F.explode(F.sequence(first_b, last_checked))
        )
        fact_b = fact.withColumn(
            "__ij_bucket", F.floor(_us(ts) / F.lit(w_us))
        )
        joined = (
            fact_b.join(right_b, on=keys + ["__ij_bucket"], how="inner")
            .filter(contains)
            .drop("__ij_bucket")
        )
        if null_end_is_open:
            # open epochs: plain equi-join on the keys + start filter — at
            # most one open epoch per key in a well-formed SCD-2 table, so
            # no fan-out and no bucket grid needed
            open_ep = right.filter(F.col(end).isNull())
            joined = joined.unionByName(
                fact.join(open_ep, on=keys, how="inner").filter(
                    _us(ts) >= _us(start)
                )
            )

    if how == "inner":
        return joined
    # left: re-attach uncovered facts with NULL payload via the matched set —
    # a second pass over `joined` (cheap: it is the already-joined frame),
    # never a second interval join
    payload = [c for c in intervals.columns if c not in keys]
    # backtick-quote every name-based reference below: a fact column whose
    # NAME contains a dot (legal in Spark) must not parse as a nested ref
    def _bq(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    matched_ids = joined.select(*[_bq(c) for c in fact.columns]).distinct()
    # NULL-safe anti-join: the fact spine routinely carries NULL-able feature
    # columns, and a null-unsafe `on=fact.columns` would fail to match a row
    # against itself whenever any column is NULL — emitting it twice (once
    # joined, once with NULL payload). eqNullSafe per column keeps this a
    # hash-joinable equi-condition (Catalyst rewrites EqualNullSafe into
    # coalesce'd join keys), so the plan stays a single hash/SMJ anti-join.
    f_side = fact.alias("__ij_f")
    m_side = matched_ids.alias("__ij_m")
    anti_cond = None
    for c in fact.columns:
        esc = c.replace("`", "``")
        eq = F.col(f"__ij_f.`{esc}`").eqNullSafe(F.col(f"__ij_m.`{esc}`"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = f_side.join(m_side, on=anti_cond, how="left_anti").select(
        *[_bq(c) for c in fact.columns]
    )
    for c in payload:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return joined.unionByName(unmatched)


def guarded_disjoint(
    intervals: DataFrame,
    on: str | list[str],
    start: str = "valid_from",
    end: str = "valid_to",
) -> DataFrame:
    """Return ``intervals`` with a runtime guarantee that per-key intervals
    do not overlap (``[start, end)``, NULL end = open): any row starting
    before its predecessor's end raises at execution. A NULL-end epoch that
    is not the key's last interval also raises (everything after it would
    overlap +infinity).

    Used by the plan layer before a point-in-time interval read — a feature
    is one value per (entity, ts), so an overlapping interval table is a
    declaration error, not a fan-out. The check is one key-partitioned
    window (sorted lag), folded into ``start`` via assert_true so Catalyst
    can't prune it."""
    keys = [on] if isinstance(on, str) else list(on)
    w = W.partitionBy(*keys).orderBy(F.col(start).asc())
    prev_end = F.lag(F.col(end)).over(w)
    prev_start = F.lag(F.col(start)).over(w)
    ok = prev_start.isNull() | (
        prev_end.isNotNull() & (_us(start) >= F.unix_micros(prev_end.cast("timestamp")))
    )
    msg = F.concat(
        F.lit("guarded_disjoint: overlapping intervals for key "),
        F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
        F.lit(" at start="), F.col(start).cast("string"),
        F.lit(" (previous interval ends "), prev_end.cast("string"), F.lit(")"),
    )
    checked = F.timestamp_micros(
        _us(start) + F.coalesce(F.assert_true(ok, msg).cast("long"), F.lit(0))
    )
    return intervals.withColumn(start, checked.cast(dict(intervals.dtypes)[start]))


def scd2_from_changes(
    changes: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    state_cols: list[str] | None = None,
    order: list[str] | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Turn a change log into SCD-2 validity intervals — the *builder* side
    of the containment pair (:func:`interval_join` is the reader).

    Each input row says "this key's state became X at ``ts``". Output is one
    row per epoch: keys + ``state_cols`` + half-open ``[valid_from,
    valid_to)``; the current (still-open) epoch has ``valid_to = NULL``.
    The half-open convention matches :func:`interval_join` exactly, so a
    point read on the built table never double-matches a boundary instant.

    Rules, all deterministic:

    - several changes at the same (key, ts) instant collapse to ONE — the
      last by ``order`` (default: the state columns themselves) wins, since
      under half-open semantics the earlier ones would be zero-length
      epochs anyway;
    - ``collapse_unchanged=True`` merges consecutive epochs with identical
      state (classic SCD-2 compaction — a "change" that changes nothing
      does not cut a new epoch).

    Scale: every window and the run-collapse groupBy partition on the key,
    so the whole build costs ONE hash exchange (Catalyst recognizes that
    HashPartitioning(keys) satisfies the (keys, run) clustering); no
    self-join, no driver state. At 10^12 rows this is a single shuffle of
    the change log.

    Reference anchor: the reference tracks only the *latest* state per key
    (@lastUpdated registry, ``materializer`` module); full epoch history is
    the capability a warehouse user layers on top — this builder makes it a
    one-call operator.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if state_cols is None:
        state_cols = [c for c in changes.columns if c not in keys and c != ts]
    if not state_cols:
        raise ValueError("scd2_from_changes: no state columns")
    order = list(order or [])
    tie_cols = order or state_cols

    # 1) one change per (key, instant): max-by-tie wins (lexicographic struct
    #    comparison == row_number over tie DESC, without a second exchange:
    #    the explicit keys-repartition below satisfies BOTH this (keys, ts)
    #    groupBy and every later keys-partitioned window, so the whole build
    #    costs ONE hash exchange of the change log)
    st = F.struct(*[F.col(c).alias(c) for c in state_cols])
    tie = F.struct(*[F.col(c) for c in tie_cols])
    df = (
        changes.select(
            *keys, ts,
            *[c for c in dict.fromkeys(state_cols + order) if c not in keys and c != ts],
        )
        .repartition(*keys)
        .groupBy(*keys, ts)
        .agg(F.max_by(st, tie).alias("__st"))
        .select(*keys, ts, *[F.col(f"__st.{c}").alias(c) for c in state_cols])
    )

    w_key = W.partitionBy(*keys).orderBy(ts)
    if collapse_unchanged:
        # 2) run-ids: a new run starts when the state struct differs from the
        #    previous instant's (NULL-safe: eqNullSafe handles NULL states)
        st = F.struct(*[F.col(c) for c in state_cols])
        # eqNullSafe is false when lag is NULL (first row) and per-field
        # null-safe otherwise, so `changed` is true exactly at run starts
        changed = ~st.eqNullSafe(F.lag(st).over(w_key))
        df = df.withColumn(
            "__run",
            F.sum(F.when(changed, 1).otherwise(0)).over(w_key),
        )
        # 3) collapse runs: epoch starts at the run's first change
        df = df.groupBy(*keys, "__run").agg(
            F.min(ts).alias("valid_from"),
            *[F.first(c).alias(c) for c in state_cols],
        )
    else:
        df = df.withColumnRenamed(ts, "valid_from")

    w_from = W.partitionBy(*keys).orderBy("valid_from")
    return df.withColumn("valid_to", F.lead("valid_from").over(w_from)).select(
        *keys, *state_cols, "valid_from", "valid_to"
    )


def scd2_apply_changes(
    current: DataFrame,
    changes: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    state_cols: list[str] | None = None,
    collapse_unchanged: bool = True,
    on_late: str = "error",
) -> DataFrame:
    """Apply an incremental change batch to an EXISTING SCD-2 table — the
    CDC merge that keeps epoch history current without rebuilding from
    the full change log (the incremental counterpart of
    :func:`scd2_from_changes`, same half-open conventions).

    Only AFFECTED keys (those present in ``changes``) are touched: their
    CLOSED epochs pass through untouched, and the open epoch is re-built
    through :func:`scd2_from_changes` over (open-epoch row ∪ new
    changes) — so an unchanged-state change still collapses into the open
    epoch instead of cutting a zero-value epoch. Keys absent from the
    batch are moved verbatim (one anti-join, no shuffle of their epochs
    beyond it); brand-new keys appear with their first epoch.

    Contract: every change must be AT-OR-AFTER its key's open epoch start
    (CDC streams are append-ordered per key). ``on_late="error"`` (default)
    fails the job at execution time naming the contract; ``"ignore"``
    drops late rows. For genuinely out-of-order history, rebuild with
    :func:`scd2_from_changes` over the full log. Same-instant ties use
    the state columns (the builder's default ``order``).

    Pinned law (pytest): applying batches incrementally ≡ one
    whole-log :func:`scd2_from_changes` build whenever the contract
    holds.

    Scale: each batch shuffles O(changes + open epochs of affected keys);
    the closed-epoch history — the table's bulk — crosses no exchange.
    """
    if on_late not in ("error", "ignore"):
        raise ValueError(f"scd2_apply_changes: on_late must be error|ignore, got {on_late!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if state_cols is None:
        state_cols = [c for c in current.columns
                      if c not in keys and c not in ("valid_from", "valid_to")]
    if not state_cols:
        raise ValueError("scd2_apply_changes: no state columns")

    # the semi/anti/left joins below all re-reference `current` and
    # `changes` inside ONE combined plan; right-side key columns are
    # RENAMED (no USING-style dedup) so repeated-lineage resolution can
    # never conflate the legs (observed: the union plan otherwise
    # mis-resolved the anti join and duplicated the open epoch)
    kk = {c: f"__ck_{c}" for c in keys}
    ch_keys = changes.select(
        *[F.col(c).alias(n) for c, n in kk.items()]
    ).distinct()
    cond = None
    for c, n in kk.items():
        e = F.col(c).eqNullSafe(F.col(n))
        cond = e if cond is None else (cond & e)
    untouched = current.join(ch_keys, cond, "left_anti")
    affected = current.join(ch_keys, cond, "left_semi")
    closed = affected.where(F.col("valid_to").isNotNull())
    open_e = affected.where(F.col("valid_to").isNull())

    # late-change guard / drop: compare each change against the key's
    # latest boundary — the open epoch's start when one exists, else (a
    # TERMINATED key: every epoch closed) the max valid_to, so a change
    # landing inside closed history cannot silently rebuild an
    # overlapping open epoch. Brand-new keys (no epochs at all) pass.
    bk = {c: f"__bk_{c}" for c in keys}
    bound = affected.groupBy(
        *[F.col(c).alias(n) for c, n in bk.items()]
    ).agg(
        F.max(
            F.when(F.col("valid_to").isNull(), F.col("valid_from"))
        ).alias("__open_vf"),
        F.max("valid_to").alias("__max_vt"),
    )
    bcond = None
    for c, n in bk.items():
        e = F.col(c).eqNullSafe(F.col(n))
        bcond = e if bcond is None else (bcond & e)
    ch = (
        changes.select(*keys, ts, *state_cols)
        .join(bound, bcond, "left")
        .drop(*bk.values())
    )
    in_order = F.when(
        F.col("__open_vf").isNotNull(), F.col(ts) >= F.col("__open_vf")
    ).when(
        F.col("__max_vt").isNotNull(), F.col(ts) >= F.col("__max_vt")
    ).otherwise(F.lit(True))
    if on_late == "error":
        # assert rides the ts column actually used downstream, so column
        # pruning cannot drop it (the budget_mixture guard convention)
        ch = ch.withColumn(
            ts,
            F.when(
                F.assert_true(
                    in_order,
                    F.lit(
                        "scd2_apply_changes: change earlier than its key's "
                        "latest epoch boundary (open-epoch start, or last "
                        "valid_to for a terminated key) — CDC batches must "
                        "be per-key ordered; rebuild from the full log for "
                        "out-of-order history"
                    ),
                ).isNull(),
                F.col(ts),
            ),
        )
    else:
        ch = ch.where(in_order)
    ch = ch.drop("__open_vf", "__max_vt")

    # re-open the open epoch as a change row at its own start instant and
    # rebuild just that slice; closed history never enters the build
    open_as_change = open_e.select(
        *keys, F.col("valid_from").alias(ts), *state_cols
    )
    rebuilt = scd2_from_changes(
        open_as_change.unionByName(ch),
        on=keys,
        ts=ts,
        state_cols=state_cols,
        collapse_unchanged=collapse_unchanged,
    )
    cols = [*keys, *state_cols, "valid_from", "valid_to"]
    return (
        untouched.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(rebuilt.select(*cols))
    )


def session_windows(
    events: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    session_col: str = "session_id",
    margin_s: int = 0,
) -> DataFrame:
    """Per-(key, session) context windows: ``[min ts − margin, max ts +
    margin)`` — the transcript-shaped interval source (sessionize first via
    ``operators.windows.session_id``). With ``margin_s > 0`` adjacent
    windows can overlap, so the downstream :func:`interval_join` genuinely
    multi-matches (an event near a boundary belongs to both contexts)."""
    keys = [on] if isinstance(on, str) else list(on)
    m = F.lit(int(margin_s)).cast("long")
    return events.groupBy(*keys, session_col).agg(
        F.timestamp_micros(
            F.unix_micros(F.min(F.col(ts).cast("timestamp"))) - m * 1_000_000
        ).alias("valid_from"),
        F.timestamp_micros(
            F.unix_micros(F.max(F.col(ts).cast("timestamp"))) + m * 1_000_000
        ).alias("valid_to"),
    )


def concurrency_profile(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    bucket: str = "day",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Max-concurrency sweep over half-open intervals ``[start, end)`` —
    "how many sessions / conversations / jobs were live at once", the
    interval-stacking readout behind capacity planning and contention
    audits. Returns one row per (``group_by``..., ``bucket_ts``) with
    ``max_concurrent`` (peak simultaneously-open intervals at ANY instant
    inside the bucket — including the carry-in level that holds before
    the bucket's first sweep event: a bucket whose events are all ends
    still peaked at the carried-in open count), ``n_starts`` and
    ``n_ends`` — exact integers.

    Half-open convention: an interval ending at instant t and another
    starting at t do NOT overlap (the -1 sweep event sorts before the +1
    at equal timestamps).

    Scale: the classic sweep line needs ONE totally-ordered running sum —
    a single-partition window at 100 TB. This implementation splits it
    into (1) a running sum WITHIN each time bucket (window partitioned by
    bucket — parallel across buckets), and (2) the carry-in offset per
    bucket = cumulative net open count of all earlier buckets, a window
    over BUCKET-GRAIN rows only (days/hours — thousands of rows, not
    billions). max_concurrent = carry_in + max(within-bucket running sum);
    buckets with no events are absent (their concurrency is constant =
    the carry-in, peakless). Two shuffles, both bucket-grain.
    """
    # intervals with a NULL endpoint are undefined under the half-open
    # convention and are dropped up front (interval_join's posture)
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    sweep = intervals.select(
        *group_by,
        F.date_trunc(bucket, F.col(start_col)).alias("__b"),
        F.col(start_col).cast("timestamp").alias("__t"),
        F.lit(1).alias("__d"),
    ).unionByName(
        intervals.select(
            *group_by,
            F.date_trunc(bucket, F.col(end_col)).alias("__b"),
            F.col(end_col).cast("timestamp").alias("__t"),
            F.lit(-1).alias("__d"),
        )
    )
    w_run = (
        W.partitionBy(*group_by, "__b")
        .orderBy(F.col("__t").asc(), F.col("__d").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = sweep.withColumn("__run", F.sum("__d").over(w_run))
    per_bucket = run.groupBy(*group_by, "__b").agg(
        F.max("__run").alias("__peak"),
        F.sum("__d").alias("__net"),
        F.sum(F.when(F.col("__d") == 1, 1).otherwise(0)).alias("n_starts"),
        F.sum(F.when(F.col("__d") == -1, 1).otherwise(0)).alias("n_ends"),
    )
    w_carry = (
        W.partitionBy(*group_by)
        .orderBy(F.col("__b").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = per_bucket.withColumn(
        "__carry", F.coalesce(F.sum("__net").over(w_carry), F.lit(0))
    )
    return out.select(
        *group_by,
        F.col("__b").alias("bucket_ts"),
        # greatest(carry, carry+peak): when the bucket opens with end
        # events the within-bucket running max is negative and the true
        # peak is the carry-in itself (the level held before the first
        # event) — carry + peak alone would under-report it
        F.greatest(
            F.col("__carry"), F.col("__carry") + F.col("__peak")
        ).cast("bigint").alias("max_concurrent"),
        F.col("n_starts").cast("bigint").alias("n_starts"),
        F.col("n_ends").cast("bigint").alias("n_ends"),
    )
