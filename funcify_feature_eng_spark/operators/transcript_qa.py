"""Conversation-grain QA and curation for transcript corpora.

The north rule's payload is multi-turn conversation / agent transcripts
(conv_id, turn_idx, role, text, tool, ts). Before any of those turns feed
feature engineering or SFT assembly, a production pipeline runs
conversation-STRUCTURE checks and conversation-grain curation that the
document-grain operators (:mod:`.dedup`, :mod:`.selection`) don't cover:

- :func:`role_sequence_audit` — validate each conversation's role
  transition sequence against a declared role machine (e.g. a ``tool``
  turn must follow an ``assistant`` tool call; a conversation must open
  with ``system`` or ``user``). One window pass (lag over the turn
  order) + one map-side-combined aggregate per conversation.
- :func:`conversation_fingerprints` / :func:`conversation_dedup` —
  exact whole-conversation dedup: the unit of duplication is the ORDERED
  (payload...) turn sequence, not any single turn. Production
  (``hashed=True``) hashes every turn to 8 bytes JVM-side before the
  grouping shuffle, so a 10^12-turn corpus shuffles ~16 B/turn instead
  of text; ``hashed=False`` keeps the joined payload string so a
  cross-engine oracle (``string_agg(... ORDER BY ...)``) reproduces the
  grouping exactly (the ``knuth_key`` hash=False convention).
- :func:`truncate_to_budget` — the SFT preprocessing step that keeps the
  longest SUFFIX of turns whose cumulative cost (tokens, bytes) fits a
  budget, optionally pinning the opening turn (the system prompt) with
  its cost reserved. One window exchange; no join, no collect.
- :func:`boilerplate_stats` / :func:`drop_boilerplate` — template-turn
  detection: exact turn payloads that appear in at least ``min_entities``
  DISTINCT conversations (navigation chrome, canned tool banners,
  disclaimer turns). Distinct-entity threshold, not global dup count —
  that distinction is what separates boilerplate from an in-conversation
  retry loop. Two-level exact distinct aggregate with map-side combine.

The reference has no conversation-structure surface (its grain is the
GraphQL data-element graph, `materializer/.../DefaultSingleRequestMaterializationGraphService.kt`);
this family is part of the beyond-reference transcript-pipeline tier
alongside :mod:`.windows` (turn features) and :mod:`.substrings`.

All outputs are deterministic (explicit tie-breaks, no floats) so an
independent engine reproduces them bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "role_sequence_audit",
    "state_transitions",
    "conversation_fingerprints",
    "conversation_dedup",
    "truncate_to_budget",
    "boilerplate_stats",
    "drop_boilerplate",
    "render_offsets",
    "render_text",
    "context_examples",
    "tool_call_loops",
    "self_repetition_stats",
    "retry_similarity",
    "path_ngrams",
]

# Unit separators for payload joins: chosen outside any plausible payload
# alphabet; chr(31)/chr(30) are reproducible in ANSI SQL via chr().
_TURN_SEP = "\x1f"
_FIELD_SEP = "\x1e"
_NULL_SENTINEL = "\x00null"


def _order_cols(order: Sequence[str]) -> list[Column]:
    return [F.col(c) for c in order]


def role_sequence_audit(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    allowed: Iterable[tuple[str, str]],
    allowed_start: Iterable[str] | None = None,
) -> DataFrame:
    """Per-conversation audit of the role transition sequence.

    ``allowed`` lists the legal ``(prior_role, role)`` transitions;
    ``allowed_start`` (optional) restricts which role may open a
    conversation. A NULL role is always a violation. Returns one row per
    entity: ``n_turns``, ``n_violations``, ``first_violation_ord``
    (1-based turn position of the first violating turn; 0 when valid)
    and ``is_valid``.

    Scale: one window exchange on ``entity_col`` (lag + row_number share
    the sort) and one map-side-combined aggregate on the same key — AQE
    coalesces the two into a single shuffle's worth of movement. The
    transition check is a literal IN over ``len(allowed)`` strings
    (role alphabets are tiny), entirely JVM-side.
    """
    allowed = sorted(set(allowed))
    if not allowed:
        raise ValueError("role_sequence_audit: allowed transitions must be non-empty")
    for a, b in allowed:
        if _TURN_SEP in (a or "") or _TURN_SEP in (b or ""):
            raise ValueError("role_sequence_audit: role names may not contain chr(31)")
    w = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    role = F.col(role_col)
    prev = F.lag(role).over(w)
    pos = F.row_number().over(w)
    trans_key = F.concat_ws(_TURN_SEP, prev, role)
    ok_trans = trans_key.isin([f"{a}{_TURN_SEP}{b}" for a, b in allowed])
    if allowed_start is None:
        ok_start = role.isNotNull()
    else:
        ok_start = role.isin(sorted(set(allowed_start)))
    # NULL role: trans_key/isin stays false-ish only via isNotNull guard
    ok = F.when(prev.isNull(), ok_start).otherwise(
        role.isNotNull() & prev.isNotNull() & ok_trans
    )
    viol = (~F.coalesce(ok, F.lit(False))).cast("int")
    per_turn = df.select(
        F.col(entity_col),
        pos.alias("__pos"),
        viol.alias("__viol"),
    )
    return per_turn.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("__viol").cast("bigint").alias("n_violations"),
        F.coalesce(
            F.min(F.when(F.col("__viol") == 1, F.col("__pos"))), F.lit(0)
        ).cast("int").alias("first_violation_ord"),
    ).withColumn("is_valid", F.col("n_violations") == 0)


def state_transitions(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    state_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Row-normalized Markov transition matrix over per-entity state
    sequences — the corpus-shape descriptor for transcript turn-taking
    ("after an assistant tool call, how often does a tool turn actually
    follow?") and the statistical twin of :func:`role_sequence_audit`
    (that one enforces a declared machine; this one MEASURES the
    empirical machine so the owner knows what to declare).

    Counts consecutive (state, next_state) pairs within each entity,
    ordered by ``order``; pairs with a NULL state on either side are
    excluded (NULL roles are completeness's problem — same contract as
    the agreement family). Output: ``group_by + (from_state, to_state,
    n, prob_ppm)`` where ``prob_ppm = floor(1e6·n / Σ n over the same
    from_state)`` — exact integer division, so rows of the matrix are
    reproducible bit-for-bit by an independent engine.

    Scale: one window exchange on ``entity_col`` (shared with any other
    lag features over the same sort), one groupBy onto alphabet²-sized
    rows (map-side combined), one broadcast-sized totals join. The
    ``group_by`` keys must be constant per entity (they ride along the
    entity window).
    """
    gb = list(group_by)
    w = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    pairs = df.select(
        *gb,
        F.lag(F.col(state_col)).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(
        F.col("from_state").isNotNull() & F.col("to_state").isNotNull()
    )
    cell = pairs.groupBy(*gb, "from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cell.groupBy(*gb, "from_state").agg(F.sum("n").alias("__tot"))
    j = cell.join(F.broadcast(tot), on=gb + ["from_state"], how="inner")
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    return j.select(
        *gb, "from_state", "to_state", "n",
        exact_floor_div(
            F.col("n").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("__tot").cast("decimal(38,0)"),
        ).alias("prob_ppm"),
    )


def conversation_fingerprints(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    payload_cols: Sequence[str],
    hashed: bool = True,
) -> DataFrame:
    """One row per entity with its order-sensitive payload fingerprint.

    ``hashed=True`` (production): each turn's payload tuple is hashed to
    8 bytes JVM-side (``xxhash64``) BEFORE the grouping shuffle — the
    aggregate moves (order, 8-byte hash) per turn, never text — then the
    sorted per-turn hashes are joined and hashed again into one
    ``fingerprint: bigint``. ``hashed=False``: the fingerprint is the
    joined payload string itself (``fingerprint: string``), which an
    independent SQL engine reproduces with
    ``string_agg(payload, chr(31) ORDER BY ...)``. NULL payload fields
    map to a reserved sentinel so ``NULL`` and ``'null'`` never collide.

    Separator caveat: in ``hashed=False`` mode a payload VALUE containing
    chr(31) can make two differently-segmented conversations join to the
    same string (turn-boundary injection) — it exists so a SQL oracle can
    reproduce the grouping, and inherits string_agg's own limitation.
    Production ``hashed=True`` is injection-safe: the joined units are
    per-turn decimal hash strings, which never contain the separator.

    The per-entity sorted collect is bounded by conversation length —
    the same bound the window operators already rely on.
    """
    if not payload_cols:
        raise ValueError("conversation_fingerprints: payload_cols must be non-empty")
    payload = F.concat_ws(
        _FIELD_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
                      for c in payload_cols]
    )
    turn_val = F.xxhash64(payload).cast("string") if hashed else payload
    sortable = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order)],
        turn_val.alias("__v"),
    )
    agg = df.groupBy(entity_col).agg(
        F.sort_array(F.collect_list(sortable)).alias("__turns")
    )
    joined = F.array_join(
        F.transform(F.col("__turns"), lambda s: s["__v"]), _TURN_SEP
    )
    fp = F.xxhash64(joined) if hashed else joined
    return agg.select(F.col(entity_col), fp.alias("fingerprint"))


def conversation_dedup(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    payload_cols: Sequence[str],
    hashed: bool = True,
) -> DataFrame:
    """Exact whole-conversation dedup: per entity, the winning entity id
    among all entities with an identical ordered payload sequence.

    Returns one row per entity: ``winner_id`` (the MIN entity id in its
    fingerprint group — deterministic) and ``is_dup`` (true for every
    non-winner). Joining losers out of the turn table is a broadcast-able
    semi-join for the caller (dup groups are tiny relative to corpora).

    Scale: :func:`conversation_fingerprints` (8-byte turn shuffle in
    production mode) + one aggregate of ONE ROW PER ENTITY on the
    fingerprint + a self-join of the entity-grain frame — never a
    turn-grain shuffle beyond the first.
    """
    fps = conversation_fingerprints(
        df, entity_col=entity_col, order=order,
        payload_cols=payload_cols, hashed=hashed,
    )
    winners = fps.groupBy("fingerprint").agg(
        F.min(entity_col).alias("winner_id")
    )
    return (
        fps.join(winners, "fingerprint")
        .select(
            F.col(entity_col),
            F.col("winner_id"),
            (F.col(entity_col) != F.col("winner_id")).alias("is_dup"),
        )
    )


def truncate_to_budget(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    cost: str | Column,
    budget: int,
    pin_first: bool = False,
    kept_col: str = "kept",
) -> DataFrame:
    """Mark the longest SUFFIX of turns whose cumulative cost fits
    ``budget`` (the standard context-window truncation for SFT: keep the
    most recent turns, drop the oldest).

    A turn is kept iff the total cost of it plus every LATER turn in its
    conversation is <= ``budget``. With ``pin_first=True`` the opening
    turn (the system prompt) is always kept, its cost is deducted from
    the budget first (floored at 0), and the suffix rule applies to the
    remaining turns — so a pinned opener plus a recency suffix, the
    chat-template convention. NULL costs count as 0 (documented; pass a
    coalesced column for other semantics). ``budget < 0`` raises.

    Adds ``kept_col`` (boolean); no rows are dropped — filter on it.
    Scale: one window exchange on ``entity_col`` shared by the
    descending cumulative sum, the (pin_first-only) opener lookup, and
    nothing else; zero joins.
    """
    if budget < 0:
        raise ValueError(f"truncate_to_budget: budget must be >= 0, got {budget}")
    c = F.coalesce(
        (F.col(cost) if isinstance(cost, str) else cost).cast("bigint"), F.lit(0)
    )
    w_desc = Window.partitionBy(entity_col).orderBy(
        *[F.col(o).desc() for o in order]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # suffix sum: this turn + every later turn (desc order => rows from
    # the conversation end up to and including the current row); ROWS
    # frame — the default RANGE frame would merge order-key peers
    sfx = F.sum(c).over(w_desc)
    if not pin_first:
        return df.withColumn(kept_col, sfx <= F.lit(int(budget)))
    w_asc = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    pos = F.row_number().over(w_asc)
    w_all = Window.partitionBy(entity_col).orderBy(
        *_order_cols(order)
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first_cost = F.max(F.when(pos == 1, c)).over(w_all)
    rem = F.greatest(F.lit(int(budget)) - first_cost, F.lit(0))
    # pos > 1 rows: their suffix sum never includes the opener (the
    # opener is the LAST row in desc order), so sfx is the correct
    # rest-of-conversation suffix cost as-is
    return df.withColumn(
        kept_col, F.when(pos == 1, F.lit(True)).otherwise(sfx <= rem)
    )


def boilerplate_stats(
    df: DataFrame,
    *,
    entity_col: str,
    text_col: str,
    min_entities: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Turn payloads appearing in at least ``min_entities`` DISTINCT
    conversations: one row per boilerplate text with ``turn_text``,
    ``n_entities`` (exact distinct) and ``n_rows``.

    ``normalize=True`` compares on whitespace-collapsed trimmed text
    (the :mod:`.dedup` normalization); the emitted ``turn_text`` is the
    normalized form. NULL/empty texts are excluded. The distinct-ENTITY
    threshold (not global occurrence count) is what separates template
    chrome from a single conversation's retry loop.

    Scale: exact two-level aggregate — groupBy(text, entity) with
    map-side combine collapses each conversation's repeats locally, then
    groupBy(text) counts survivors. Shuffle volume is bounded by
    distinct (text, entity) pairs; at 100 TB run it over
    ``F.xxhash64(text)`` keys by pre-hashing upstream if texts are
    large — the gate path keeps text for the cross-engine oracle.
    """
    if min_entities < 1:
        raise ValueError(
            f"boilerplate_stats: min_entities must be >= 1, got {min_entities}"
        )
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    base = (
        df.select(t.alias("turn_text"), F.col(entity_col).alias("__e"))
        .where(F.col("turn_text").isNotNull() & (F.col("turn_text") != ""))
    )
    pairs = base.groupBy("turn_text", "__e").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        pairs.groupBy("turn_text")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_entities"),
            F.sum("__c").cast("bigint").alias("n_rows"),
        )
        .where(F.col("n_entities") >= min_entities)
    )


def drop_boilerplate(
    df: DataFrame,
    *,
    entity_col: str,
    text_col: str,
    min_entities: int = 2,
    normalize: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Remove boilerplate turns (per :func:`boilerplate_stats`) from the
    turn table via a left-anti join on the (normalized) text. Non-text
    rows (NULL/empty) always survive. The boilerplate side is tiny at any
    sane threshold — broadcast by default; pass ``broadcast=False`` when
    a permissive ``min_entities`` makes it large (AQE then picks the
    join)."""
    bp = boilerplate_stats(
        df, entity_col=entity_col, text_col=text_col,
        min_entities=min_entities, normalize=normalize,
    ).select("turn_text")
    if broadcast:
        bp = F.broadcast(bp)
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return (
        df.withColumn("__bp_key", t)
        .join(bp, F.col("__bp_key") == F.col("turn_text"), "left_anti")
        .drop("__bp_key")
    )


def render_offsets(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    text_col: str,
    trainable_roles: Sequence[str] = ("assistant",),
    sep: str = "\n",
) -> DataFrame:
    """Per-turn character offsets of each turn's CONTENT inside the
    rendered conversation — the loss-mask geometry for SFT training.

    Every turn renders as ``<|role|>content<sep>`` (NULL content renders
    empty); ``start_off``/``end_off`` are 0-based character offsets of
    the content span inside the concatenation of the conversation's
    rendered turns in ``order``, and ``trainable`` marks roles the loss
    applies to (assistant turns, classically). Offsets are exact integer
    arithmetic over ``length()`` (codepoints), so an independent engine
    reproduces them with window sums.

    Adds ``start_off``, ``end_off`` (bigint), ``trainable`` (boolean).
    NULL roles render as an empty role tag ``<||>`` (both here and in
    :func:`render_text`, so offsets stay consistent) and are never
    trainable. Scale: ONE window exchange (the prior-length cumulative
    sum); no join, no collect — composes with :func:`truncate_to_budget`
    (mask after truncation) and :func:`render_text` (which materializes
    the text the offsets index into).
    """
    role = F.coalesce(F.col(role_col), F.lit(""))
    content = F.coalesce(F.col(text_col), F.lit(""))
    rendered_len = (
        F.length(role) + F.lit(4 + len(sep)) + F.length(content)
    )  # <| + role + |> + content + sep
    w = Window.partitionBy(entity_col).orderBy(*_order_cols(order)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = F.coalesce(F.sum(rendered_len).over(w), F.lit(0))
    start = (prior + F.length(role) + F.lit(4)).cast("bigint")
    return (
        df.withColumn("start_off", start)
        .withColumn("end_off", (start + F.length(content)).cast("bigint"))
        .withColumn("trainable", role.isin(list(trainable_roles)))
    )


def render_text(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation with the rendered training text
    (``<|role|>content<sep>`` per turn, in ``order``) and its character
    length — the string :func:`render_offsets` indexes into
    (``offset-consistency`` is pytest-pinned: every content slice equals
    the turn's content).

    Scale: one grouping aggregate; the per-entity sorted collect is
    bounded by conversation length (the window operators' standing
    bound)."""
    role = F.coalesce(F.col(role_col), F.lit(""))
    content = F.coalesce(F.col(text_col), F.lit(""))
    rendered = F.concat(F.lit("<|"), role, F.lit("|>"), content, F.lit(sep))
    sortable = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order)],
        rendered.alias("__r"),
    )
    return (
        df.groupBy(entity_col)
        .agg(F.sort_array(F.collect_list(sortable)).alias("__t"))
        .select(
            F.col(entity_col),
            F.array_join(
                F.transform(F.col("__t"), lambda s: s["__r"]), ""
            ).alias("conv_text"),
        )
        .withColumn("conv_chars", F.length("conv_text").cast("bigint"))
    )


def context_examples(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    text_col: str,
    target_roles: Sequence[str] = ("assistant",),
    k: int = 4,
    sep: str = "\n",
) -> DataFrame:
    """Sliding-context SFT example extraction: ONE training example per
    target-role turn — ``context`` = the rendered previous ≤ ``k`` turns
    (same ``<|role|>content<sep>`` rendering as :func:`render_text`, so a
    context is a verbatim substring of the full rendered conversation) and
    ``target`` = the turn's own content. This is the canonical multi-turn
    SFT exploder: a conversation with T assistant turns yields T examples,
    each seeing only strictly-PRIOR turns (zero temporal leakage by
    construction — the frame ends at -1).

    Adds ``context`` (string, '' for a conversation-opening target),
    ``target`` (string), ``n_context_turns`` (int). ``order`` must be a
    total order within each conversation (the (ts, turn_idx) convention) —
    the frame walks rows in that order, so the context string is
    deterministic.

    Scale: ONE window Exchange on the conversation key — no join, no
    collect, no second pass; the ≤k-row frame bounds per-row memory by
    k·turn_len regardless of conversation length. Compose with
    :func:`truncate_to_budget` upstream to bound turn cost first.
    """
    if k < 1:
        raise ValueError(f"context_examples: k must be >= 1, got {k}")
    role = F.coalesce(F.col(role_col), F.lit(""))
    content = F.coalesce(F.col(text_col), F.lit(""))
    rendered = F.concat(F.lit("<|"), role, F.lit("|>"), content, F.lit(sep))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*_order_cols(order))
        .rowsBetween(-k, -1)
    )
    out = (
        df.withColumn("context", F.array_join(F.collect_list(rendered).over(w), ""))
        .withColumn("n_context_turns", F.count(F.lit(1)).over(w).cast("int"))
        .withColumn("target", content)
    )
    return out.filter(F.col(role_col).isin(list(target_roles)))


def tool_call_loops(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    tool_col: str,
    min_run: int = 3,
) -> DataFrame:
    """Agent-trajectory loop detection: per conversation, the run-length
    structure of CONSECUTIVE identical non-NULL tool calls. An agent stuck
    re-issuing the same tool is the classic trajectory failure; its
    signature is a long run in the turn-ordered tool sequence (a NULL tool
    — a non-tool turn — BREAKS a run, so two calls separated by assistant
    text do not merge).

    One row per conversation that has at least one tool turn:
    ``n_tool_turns``, ``n_runs``, ``max_run_len``, ``n_loops`` (runs with
    length ≥ ``min_run``), ``loop_tool`` (the tool of the longest run;
    ties break to the EARLIEST run — deterministic). Conversations with no
    tool turns are absent (nothing to loop).

    Scale: gaps-and-islands — one window Exchange on the conversation key
    (lag + running sum share it), then two aggregates at RUN grain (rows =
    number of runs, not turns). No join, no collect.
    """
    w_seq = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    tool = F.col(tool_col)
    prev = F.lag(tool).over(w_seq)
    # null-safe change flag: any transition (incl. NULL<->value) starts a run
    chg = F.when(tool.eqNullSafe(prev), F.lit(0)).otherwise(F.lit(1))
    run_id = F.sum(chg).over(
        Window.partitionBy(entity_col)
        .orderBy(*_order_cols(order))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = (
        df.select(F.col(entity_col), tool.alias("__tool"), run_id.alias("__run"))
        .filter(F.col("__tool").isNotNull())
        .groupBy(entity_col, "__run")
        .agg(
            F.min("__tool").alias("__tool"),  # constant within a run
            F.count(F.lit(1)).alias("__len"),
        )
    )
    w_top = Window.partitionBy(entity_col).orderBy(
        F.col("__len").desc(), F.col("__run").asc()
    )
    return (
        runs.withColumn("__rk", F.row_number().over(w_top))
        .groupBy(entity_col)
        .agg(
            F.sum("__len").cast("long").alias("n_tool_turns"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("__len").cast("long").alias("max_run_len"),
            F.sum((F.col("__len") >= F.lit(int(min_run))).cast("long"))
            .cast("long")
            .alias("n_loops"),
            F.max(F.when(F.col("__rk") == 1, F.col("__tool"))).alias("loop_tool"),
        )
    )


def self_repetition_stats(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    text_col: str,
    roles: Sequence[str] = ("assistant",),
) -> DataFrame:
    """Within-conversation self-repetition: per conversation, how many of
    its ``roles``-turns repeat the EXACT text of an earlier same-filter
    turn in the same conversation (a model stuck emitting the same reply —
    the turn-grain cousin of :func:`boilerplate_stats`, which is
    cross-conversation). NULL-text turns are excluded (no payload to
    repeat).

    One row per conversation with ≥1 counted turn: ``n_turns``,
    ``n_repeated`` (occurrences after each text's first), ``n_distinct``,
    and ``repetition_ppm`` = floor(1e6·n_repeated/n_turns) — exact integer
    arithmetic, engine-portable.

    Scale: one window Exchange on (conversation, text) + one aggregate at
    conversation grain. The window's ORDER BY is only a first-occurrence
    tie-break; counts are order-free.
    """
    from .util import exact_floor_div

    base = df.filter(
        F.col(role_col).isin(list(roles)) & F.col(text_col).isNotNull()
    )
    w = Window.partitionBy(entity_col, text_col).orderBy(*_order_cols(order))
    occ = base.select(
        F.col(entity_col), (F.row_number().over(w) > 1).alias("__rep")
    )
    agg = occ.groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.col("__rep").cast("long")).cast("long").alias("n_repeated"),
    )
    return agg.select(
        F.col(entity_col),
        "n_turns",
        "n_repeated",
        (F.col("n_turns") - F.col("n_repeated")).cast("long").alias("n_distinct"),
        exact_floor_div(
            F.col("n_repeated") * F.lit(1_000_000), F.col("n_turns")
        ).cast("long").alias("repetition_ppm"),
    )


def retry_similarity(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    role_col: str,
    text_col: str,
    roles: Sequence[str] = ("assistant",),
    near_ppm: int = 200_000,
    max_chars: int = 2000,
) -> DataFrame:
    """Consecutive same-role near-retry detection: for each counted turn
    after its conversation's first, the Levenshtein distance to the
    PREVIOUS counted turn's text and the relative distance
    ``rel_dist_ppm = floor(1e6·dist / max(len_prev, len_cur, 1))`` —
    near-identical consecutive responses (``rel_dist_ppm <= near_ppm``)
    are the regenerate-loop signature that exact matching
    (:func:`self_repetition_stats`) misses.

    Adds ``lev_dist`` (bigint, NULL on each conversation's first counted
    turn), ``rel_dist_ppm`` (bigint, NULL likewise) and ``is_near_retry``
    (boolean, False on firsts). NULL text compares as '' (a blank retry
    of a blank is a retry). Both texts are truncated to ``max_chars``
    first — Levenshtein is O(len²) per pair, so the cap bounds per-row
    cost at scale (state it in the feature doc; 2000 chars covers the
    overwhelming mass of single turns).

    Engine-portability note: Spark's ``levenshtein`` counts CODEPOINT
    edits, DuckDB's counts BYTE edits — they agree exactly on ASCII
    text. The driver gate runs on ASCII testdata; for non-ASCII corpora
    the Spark semantics are the correct ones (a one-character accent
    edit is one edit).

    Scale: ONE window Exchange on the conversation key; the distance is
    a JVM-side expression (no Python, no join).
    """
    from .util import exact_floor_div

    base = df.filter(F.col(role_col).isin(list(roles)))
    txt = F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, int(max_chars))
    w = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    prev = F.lag(txt).over(w)
    dist = F.levenshtein(prev, txt).cast("long")
    denom = F.greatest(F.length(prev), F.length(txt), F.lit(1)).cast("long")
    rel = exact_floor_div(dist * F.lit(1_000_000), denom)
    return (
        base.withColumn("lev_dist", dist)
        .withColumn("rel_dist_ppm", rel.cast("long"))
        .withColumn(
            "is_near_retry",
            F.coalesce(F.col("rel_dist_ppm") <= F.lit(int(near_ppm)), F.lit(False)),
        )
    )


def path_ngrams(
    df: DataFrame,
    *,
    entity_col: str,
    order: Sequence[str],
    state_col: str,
    n: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Trajectory motif mining: corpus-wide counts of every length-``n``
    window of consecutive states along each entity's ordered sequence —
    the n-gram generalization of :func:`state_transitions` (which is the
    n=2 row-normalized case). "What three-step tool paths dominate the
    corpus?" is the question this answers before anyone hand-writes a
    role machine for :func:`role_sequence_audit`.

    Windows containing a NULL state are excluded (same contract as
    state_transitions). Output: ``ngram`` (states joined by ``sep``),
    ``n_occurrences`` — counts, not probabilities, so rows merge by
    addition across corpus shards (mergeable-sketch posture).

    Scale: one window Exchange on the entity key (n−1 lags share one
    sort), then one map-side-combined aggregate onto alphabet^n rows.
    ``sep`` must not occur in state names (validated against the data at
    runtime via assert_true — a separator collision would alias two
    different paths).
    """
    if n < 2:
        raise ValueError(f"path_ngrams: n must be >= 2, got {n}")
    if not sep:
        raise ValueError("path_ngrams: sep must be non-empty")
    w = Window.partitionBy(entity_col).orderBy(*_order_cols(order))
    state = F.col(state_col)
    # fold the separator-collision guard into the current state so Catalyst
    # cannot prune it: state names containing `sep` would alias paths
    ok = ~F.coalesce(state.contains(sep), F.lit(False))
    msg = F.concat(
        F.lit(f"path_ngrams: state name contains the separator {sep!r}: "),
        state,
    )
    checked = F.concat(
        state,
        F.coalesce(F.assert_true(ok, msg).cast("string"), F.lit("")),
    )
    lags = [F.lag(checked, n - 1 - i).over(w) for i in range(n - 1)] + [checked]
    all_present = lags[0].isNotNull()
    for c in lags[1:]:
        all_present = all_present & c.isNotNull()
    grams = df.select(
        F.when(all_present, F.concat_ws(sep, *lags)).alias("ngram")
    ).filter(F.col("ngram").isNotNull())
    return grams.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
