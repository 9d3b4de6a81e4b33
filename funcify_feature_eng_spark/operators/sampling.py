"""Deterministic splitting & sampling for training-data pipelines.

Train/val/test assignment and subsampling at 100 TB must be (a) stable
across reruns and cluster layouts, (b) a pure map over the id — never a
global shuffle or a random() that changes per task retry. Both operators key
on a 64-bit content hash of the id (xxhash64, same family the dedup
fingerprints use): bucket = pmod(xxhash64(id), resolution).

``bucket_expr(..., hash=False)`` switches to plain ``pmod(id, resolution)``
for cross-engine oracle checks (modulo is SQL-universal; the hash variant is
what production uses and is covered by tests/fixtures).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(id_col: str | Column, resolution: int = 10_000, hash: bool = True) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.xxhash64(c) if hash else c
    return F.pmod(key, F.lit(resolution))


def knuth_key(id_col: str | Column, modulus: int = 2**32) -> Column:
    """The SQL-universal pseudo-random key shared by every ``hash=False``
    oracle mode in this module: ``((id mod 2^31) * 2654435761) mod modulus``.
    The inner mod keeps the product below 2^63 so the arithmetic is exact
    (and ANSI-safe) in any engine's BIGINT for ALL 64-bit ids."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c, F.lit(2**31)) * F.lit(2654435761), F.lit(modulus))


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    out_col: str = "split",
    resolution: int = 10_000,
    hash: bool = True,
) -> DataFrame:
    """Stable split assignment: id → bucket → first split whose cumulative
    weight covers the bucket. Weights must sum to 1 (±1e-9)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = bucket_expr(id_col, resolution, hash)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < int(round(acc * resolution))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    resolution: int = 10_000,
    hash: bool = True,
) -> DataFrame:
    """Keep ~fraction of rows, stably (same ids every run, layout-independent
    — unlike ``df.sample`` whose output depends on partitioning)."""
    return df.filter(bucket_expr(id_col, resolution, hash) < int(round(fraction * resolution)))


def quota_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    hash: bool = True,
) -> DataFrame:
    """Per-group quota sampling — the corpus-mixing primitive: keep at most
    ``n_per_group`` rows of each group (domain, language, source), chosen in
    a deterministic pseudo-random order so reruns and layout changes keep
    the SAME rows and no group dominates the mix.

    Order key is ``xxhash64(id)`` (production) or Knuth multiplicative
    hashing ``((id mod 2^31) * 2654435761) mod 2^32`` (``hash=False`` — the
    inner mod keeps the product below 2^63 so the arithmetic is exact (and
    ANSI-safe) in any engine's BIGINT for ALL 64-bit ids; used by
    cross-engine oracle checks, same convention as ``bucket_expr``). One
    shuffle on the
    group key + a per-group sort bounded by group size; at web scale groups
    are domains (thousands) over billions of rows — if a single group is
    shuffle-hot, pre-filter with ``deterministic_sample`` to an upper bound
    first, then apply the exact quota.
    """
    from pyspark.sql import Window

    c = F.col(id_col)
    key = F.xxhash64(c) if hash else knuth_key(c)
    w = Window.partitionBy(group_col).orderBy(key.asc(), c.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    hash: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global training-order shuffle: every row gets a dense
    position ``pos`` (0..n-1) in a pseudorandom permutation keyed only on
    the id — stable across reruns, cluster layouts and task retries.

    Training pipelines shuffle the corpus ONCE before sequence packing so
    batches don't inherit source/time locality; a ``rand()``-ordered sort
    silently reshuffles on retry, and a driver-side permutation doesn't
    exist at 10^12 rows. Spark-first shape: the global rank decomposes over
    DETERMINISTIC key-prefix buckets (the key's high bits) — never over
    physical partition ids, whose range-sampled boundaries can differ
    between the counting job and the output job. One aggregation counts
    rows per bucket (uniform hash → uniform buckets), the driver turns the
    ≤2^16 counts into cumulative offsets (O(buckets) metadata, same
    legitimacy class as IVF centroid init), and one window per bucket
    assigns local ranks: ``pos = offset[bucket] + local_rank``. Order key:
    multiplicative (Knuth) hash with the mod-2^31 inner step that stays
    ANSI-safe and SQL-universal (``hash=False``) or xxhash64
    (``hash=True``, the production default).

    ``n_partitions`` is accepted for call-site compatibility but the
    result is layout-independent by construction.
    """
    from pyspark.sql import Window

    c = F.col(id_col)
    if hash:
        key = F.xxhash64(c, F.lit(seed))
        shift = 48  # 64-bit key → 2^16 buckets
    else:
        # inner mod keeps the product under 2^63 for 64-bit ids (ANSI-safe;
        # same guard as quota_per_group) — identical values for ids < 2^31
        key = F.pmod(
            F.pmod(c + F.lit(seed), F.lit(2**31)) * F.lit(2654435761),
            F.lit(2**31),
        )
        shift = 16  # 31-bit key → 2^15 buckets
    keyed = df.withColumn("__shuf_key", key).withColumn(
        "__shuf_b", F.shiftright(F.col("__shuf_key"), shift).cast("long")
    )
    counts = {
        r["__shuf_b"]: r["cnt"]
        for r in keyed.groupBy("__shuf_b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    acc = 0
    items = []
    for b in sorted(counts):
        items.append((b, acc))
        acc += counts[b]
    spark = df.sparkSession
    offsets = spark.createDataFrame(items, "__shuf_b long, __shuf_off long")
    w = Window.partitionBy("__shuf_b").orderBy(F.col("__shuf_key"), c)
    return (
        keyed.join(F.broadcast(offsets), "__shuf_b")
        .withColumn(
            "pos",
            (F.row_number().over(w).cast("long") - 1 + F.col("__shuf_off")),
        )
        .drop("__shuf_key", "__shuf_b", "__shuf_off")
    )


def interleave_by_ratio(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    out_col: str = "mix_pos",
) -> DataFrame:
    """Corpus mixing: a deterministic global training order in which each
    source appears at its target rate (weighted fair interleave / deficit
    round-robin — the "sample source s with probability w_s" schedule, made
    reproducible). Every row gets virtual time
    ``(rank_within_source - 1 + 0.5) / weight`` — sorting by ``mix_pos``
    yields the mixed order; rank is per-source (one window exchange
    partitioned by source; at 10^12 rows substitute the
    deterministic_shuffle offset technique per source). Sources absent
    from ``weights`` get NULL ``mix_pos`` (excluded from the schedule);
    int/double division is IEEE-exact cross-engine (oracle-safe).
    """
    from pyspark.sql import Window

    cases = None
    for s, w_ in weights.items():
        if w_ <= 0:
            raise ValueError(f"weight for source {s!r} must be > 0")
        cond = F.col(source_col) == s
        cases = F.when(cond, F.lit(float(w_))) if cases is None else cases.when(cond, F.lit(float(w_)))
    w = Window.partitionBy(source_col).orderBy(
        knuth_key(id_col, 2**31), F.col(id_col)
    )
    rank = F.row_number().over(w).cast("double")
    weight = cases  # NULL for unlisted sources → NULL mix_pos
    return df.withColumn(out_col, (rank - F.lit(1.0) + F.lit(0.5)) / weight)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    rate_num: int,
    rate_denom: int,
    hash: bool = True,
) -> DataFrame:
    """Weighted Bernoulli sampling — the importance-sampling primitive for
    corpus mixing: keep each row with probability
    ``min(1, weight * rate_num / rate_denom)``, decided deterministically
    from the id (same ids every rerun, any layout, any retry — never
    ``rand()``). Up-weighting high-quality or long documents when
    downsampling a 100 TB corpus is exactly this op with
    weight = quality score or token count.

    A pure map — no shuffle, no state. ``hash=True`` (production) draws
    u from ``xxhash64(id)``; ``hash=False`` draws :func:`knuth_key` (the
    quota_per_group convention) and decides by the INTEGER comparison
    ``key * rate_denom < weight * rate_num * 2^32`` — exact in any
    engine's BIGINT, which is what makes the gate oracle engine-portable
    with zero float arithmetic. Rows whose probability caps at 1
    (``weight * rate_num >= rate_denom``) short-circuit to kept BEFORE the
    multiply, so the operands provably stay under 2^63 for ANY weight
    (in the multiply branch ``w * num < denom < 2^31``).
    """
    if rate_num <= 0 or rate_denom <= 0:
        raise ValueError(f"rate must be positive, got {rate_num}/{rate_denom}")
    if rate_num >= 2**31 or rate_denom >= 2**31:
        # key < 2^32 multiplied by denom — a rate component >= 2^31 could
        # wrap the BIGINT comparison silently under non-ANSI arithmetic
        raise ValueError(
            f"rate components must be < 2^31, got {rate_num}/{rate_denom}"
        )
    c = F.col(id_col)
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    if hash:
        u = F.xxhash64(c).bitwiseAND(F.lit((1 << 63) - 1)).cast("double") / F.lit(
            float(1 << 63)
        )
        return df.filter(
            u * F.lit(float(rate_denom)) < w.cast("double") * F.lit(float(rate_num))
        )
    # hash=False is the integer-exact gate path: it casts the weight to
    # long, so a fractional weight in (0,1) would truncate to 0 and NEVER
    # be kept — silently diverging from hash=True. Require an integral
    # weight dtype up front (pre-scale fractional scores onto a fixed-point
    # grid, the cumulative_target_encode convention).
    wtype = df.select(w.alias("__w")).schema["__w"].dataType.simpleString()
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            "weighted_sample(hash=False) requires an integral weight column "
            f"(got {wtype}): fractional weights truncate to 0 under the "
            "integer-exact comparison — pre-scale onto a fixed-point grid "
            "(e.g. round(score * 1000) with rate_denom scaled by 1000)"
        )
    # p >= 1 short-circuit: w >= ceil(denom/num) keeps the row without the
    # multiply (whose RHS would wrap 2^63 for w*num >= 2^31 and silently
    # DROP always-keep rows under Spark's default non-ANSI long arithmetic)
    always = w.cast("long") >= F.lit((rate_denom + rate_num - 1) // rate_num)
    return df.filter(
        always
        | (
            knuth_key(c) * F.lit(int(rate_denom))
            < w.cast("long") * F.lit(int(rate_num) * 2**32)
        )
    )


def weighted_topk(
    df: DataFrame,
    group_col: str | None,
    id_col: str,
    weight_col: str | Column,
    k: int,
    hash: bool = True,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: per group, keep exactly
    ``min(k, group size)`` rows where each row's inclusion odds are
    proportional to its weight — Efraimidis & Spirakis (2006, public): draw
    u ~ U(0,1] per row, keep the k largest ``u^(1/w)``, implemented in log
    space (order by ``ln(u)/w`` descending; monotone-equivalent, no pow
    underflow at large weights). u derives deterministically from
    ``xxhash64(id)`` (or the Knuth key under ``hash=False``), so the chosen
    set is stable across reruns and layouts.

    One shuffle on the group key, per-group top-k sort. Value-gated
    (q_weighted_topk, round 5): the only float step is ``ln`` over an input
    u that is bit-identical across engines (a dyadic rational
    ``(knuth+1)/2^32``), so a cross-engine ``ln`` drifts <= 1 ulp — and the
    gate fixture's min adjacent-key gap is ~1e11 ulps
    (tests/test_sampling_weighted.py::test_topk_oracle_gap_margin), so no
    boundary rank can flip. Determinism and proportional-odds properties
    stay pytest-pinned for the production hash=True path.

    NULL or non-positive weights drop (zero odds).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = F.col(id_col)
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    if hash:
        # u in (0, 1]: (h + 1) / 2^63 with h in [0, 2^63) — never ln(0)
        u = (F.xxhash64(c).bitwiseAND(F.lit((1 << 63) - 1)) + F.lit(1)).cast(
            "double"
        ) / F.lit(float(1 << 63))
    else:
        u = (knuth_key(c) + F.lit(1)).cast("double") / F.lit(float(2**32))
    key = F.log(u) / w
    part = [group_col] if group_col else [F.lit(1)]
    win = Window.partitionBy(*part).orderBy(key.desc(), c.asc())
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def budget_mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    size_col: str | Column,
    budget: int,
    weights: dict[str, int],
    hash: bool = True,
) -> DataFrame:
    """Budgeted corpus mixing — the training-data mixture PLANNER + sampler
    in one op: given relative source shares ``weights`` (integers, e.g.
    ``{"web": 5, "code": 2, "books": 1}``) and a global ``budget`` (total
    tokens/bytes, in ``size_col`` units), keep each row of source s with
    probability ``p_s = min(1, budget·w_s / (W·T_s))`` where ``W = Σw`` and
    ``T_s`` is the source's total size — so the EXPECTED kept size per
    source is ``budget·w_s/W``: the mixture lands on target without anyone
    hand-tuning per-source rates. Sources absent from ``weights`` drop.
    A source too small to fill its share keeps everything (p caps at 1 —
    the standard under-budget carve-out; re-run with re-normalized weights
    over the remaining sources to redistribute its unused share).

    Scale shape: ONE combinable aggregate (per-source totals, ≤ |sources|
    rows) broadcast back, then a pure map — the decision is a deterministic
    function of (id, size, source totals), stable across reruns/layouts/
    retries. ``hash=False`` decides by the pure-BIGINT comparison
    ``key·W·T_s < budget·w_s·2^32`` (engine-portable zero-float oracle
    mode; raises if the operands could reach 2^63 — at that scale use
    ``hash=True``, whose double arithmetic is exact to 2^53 and never
    wraps). Deterministic u from ``xxhash64(id)`` / :func:`knuth_key`,
    same convention as :func:`weighted_sample`.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive ints")
    total_w = int(sum(weights.values()))
    c = F.col(id_col)
    size = F.col(size_col) if isinstance(size_col, str) else size_col

    totals = (
        df.filter(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .agg(F.sum(size.cast("long")).alias("__t_s"))
    )
    if not hash:
        # LHS guard: key < 2^32 times W*T_s must stay under 2^63. Asserted
        # on the |sources|-row totals frame (zero per-row cost) because T_s
        # is data-dependent — unlike the static budget*max_weight RHS check
        totals = totals.withColumn(
            "__t_s",
            F.when(
                F.assert_true(
                    F.lit(total_w) * F.col("__t_s") < F.lit(2**31),
                    F.lit(
                        "budget_mixture_sample hash=False needs "
                        "sum(weights)*source_total < 2^31 — use hash=True"
                    ),
                ).isNull(),
                F.col("__t_s"),
            ),
        )
    wmap = F.create_map(
        *[x for s, w in weights.items() for x in (F.lit(s), F.lit(int(w)))]
    )
    j = (
        df.join(F.broadcast(totals), source_col, "inner")
        .withColumn("__w_s", wmap[F.col(source_col)].cast("long"))
    )
    # p_s >= 1 short-circuit keeps the multiply operands bounded (same
    # non-ANSI-wrap defense as weighted_sample)
    always = F.lit(int(budget)) * F.col("__w_s") >= F.lit(total_w) * F.col("__t_s")
    if hash:
        u = F.xxhash64(c).bitwiseAND(F.lit((1 << 63) - 1)).cast("double") / F.lit(
            float(1 << 63)
        )
        keep = always | (
            u * F.lit(float(total_w)) * F.col("__t_s").cast("double")
            < F.lit(float(budget)) * F.col("__w_s").cast("double")
        )
    else:
        max_w = max(weights.values())
        if budget * max_w * 2**32 >= 2**63:
            raise ValueError(
                "hash=False integer mode needs budget*max_weight < 2^31; "
                f"got {budget}*{max_w} — use hash=True at this scale"
            )
        keep = always | (
            knuth_key(c) * F.lit(total_w) * F.col("__t_s")
            < F.lit(int(budget)) * F.col("__w_s") * F.lit(2**32)
        )
    return j.filter(keep).drop("__t_s", "__w_s")


def temporal_split(
    df: DataFrame,
    *,
    keys: Sequence[str],
    order: Sequence[str],
    eval_fraction_pct: int = 20,
    out_col: str = "split",
) -> DataFrame:
    """Per-entity TEMPORAL train/eval split: each entity's last
    ``eval_fraction_pct`` percent of rows (in time order) become ``eval``,
    the rest ``train`` — the leakage-safe evaluation protocol for temporal
    features (a hash split would let the model train on events LATER than
    its eval rows for the same entity; see [[assign_split]] for the
    i.i.d.-document case where hashing is correct).

    Pure integer rule, deterministic under any layout:
    row is eval iff ``rn * 100 > n * (100 - pct)`` with ``rn`` the 1-based
    time rank and ``n`` the entity's row count. One window pass (rank and
    count share the entity partitioning).
    """
    from pyspark.sql import Window

    pct = int(eval_fraction_pct)
    if not 0 < pct < 100:
        raise ValueError(f"eval_fraction_pct must be in (0, 100), got {pct}")
    wo = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    wa = Window.partitionBy(*keys)
    rn = F.row_number().over(wo)
    n = F.count(F.lit(1)).over(wa)
    return df.withColumn(
        out_col,
        F.when(rn * 100 > n * (100 - pct), F.lit("eval")).otherwise(F.lit("train")),
    )
