"""Property-based invariants (hypothesis) for the corpus operators —
complements the fixed-case tests the way the reference's randomized
round-trip tests complement its golden files (SURVEY.md §5).

All examples are deterministic (``derandomize=True`` — failures are
reproducible run-to-run) and sized for the shared local[4] session.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTLE = settings(
    derandomize=True,
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

line_alphabet = st.sampled_from(["a", "b", "c", "dd", ""])
doc_lines = st.lists(line_alphabet, min_size=0, max_size=5)
corpus = st.lists(doc_lines, min_size=1, max_size=8)


@SETTLE
@given(corpus=corpus)
def test_line_dedup_invariants(spark, corpus):
    from funcify_feature_eng_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}

    def kept_lines(i):
        # "" is a legitimate line: a doc that KEPT one empty line re-joins
        # to "" exactly like a doc that kept nothing — disambiguate via the
        # row's own accounting columns
        n_kept = out[i]["n_lines"] - out[i]["n_dropped"]
        if n_kept == 0:
            return []
        lines = out[i]["text"].split("\n")
        assert len(lines) == n_kept
        return lines

    # 1) every document survives
    assert set(out) == {i for i, _ in rows}
    # 2) across the whole output corpus, no line occurs twice
    seen: set[str] = set()
    for i, _ in rows:
        for ln in kept_lines(i):
            assert ln not in seen, f"line {ln!r} survived twice"
            seen.add(ln)
    # 3) the surviving set is exactly the distinct lines of the input
    all_lines = {ln for _, t in rows for ln in t.split("\n")}
    assert seen == all_lines
    # 4) per-doc accounting: n_lines is the input count
    for i, t in rows:
        assert out[i]["n_lines"] == len(t.split("\n"))
    # 5) first-occurrence-wins: each surviving line sits in the doc where it
    # first appeared (scanning docs in id order, positions in order)
    first_doc: dict[str, int] = {}
    for i, t in rows:
        for ln in t.split("\n"):
            first_doc.setdefault(ln, i)
    for i, _ in rows:
        for ln in kept_lines(i):
            assert first_doc[ln] == i


@SETTLE
@given(
    toks=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=20),
    budget=st.integers(min_value=5, max_value=15),
)
def test_pack_documents_prefix_invariants(spark, toks, budget):
    from funcify_feature_eng_spark.operators.packing import pack_documents

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = (
        pack_documents(df, "doc_id", "n_tokens", budget=budget)
        .orderBy("doc_id")
        .collect()
    )
    # replay the prefix-sum: pack boundaries must match exactly
    prefix = 0
    for r, (_, t) in zip(out, rows):
        assert r["pack_id"] == prefix // budget
        assert r["offset_in_pack"] == prefix % budget
        prefix += t
    # pack ids are non-decreasing and dense enough: every pack below the
    # final one has its full budget covered by the concatenated stream
    assert out[-1]["pack_id"] == (prefix - toks[-1]) // budget


@SETTLE
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["c1", "c2"]),          # conv
            st.integers(min_value=0, max_value=40),  # ts seconds
            st.sampled_from(["user", "tool", None]),  # tool value (nullable)
        ),
        min_size=1,
        max_size=16,
    )
)
def test_segmented_windows_equal_plain_random(spark, rows):
    """Segmented (skew-proof) window features must be VALUE-identical to the
    plain single-window formulation on arbitrary contract-conforming inputs
    — including duplicate timestamps and NULL runs. Time bucketing requires
    ts non-decreasing in turn order (the ingest contract, see the operator
    docstring), so turn_idx is assigned in ts order; the bucket_rows
    variant is exercised on the RAW (unsorted-ts) assignment, since row
    bucketing needs no such assumption."""
    import datetime as dt

    from funcify_feature_eng_spark.operators.windows_segmented import (
        turn_features_segmented,
    )
    from funcify_feature_eng_spark.operators.windows import turn_features

    base = dt.datetime(2024, 1, 1)

    def check(df, **seg_kw):
        plain = turn_features(df).orderBy("conv_id", "turn_idx").collect()
        seg = (
            turn_features_segmented(df, **seg_kw)
            .orderBy("conv_id", "turn_idx")
            .collect()
        )
        assert len(plain) == len(seg)
        for p, s in zip(plain, seg):
            for col in p.asDict():
                if col in s.asDict():
                    assert s[col] == p[col], f"{col}: {s[col]!r} != {p[col]!r}"

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    # time-bucketed: turn order follows ts (ties keep generation order)
    ordered = sorted(enumerate(rows), key=lambda kv: (kv[1][0], kv[1][1], kv[0]))
    idx_within: dict[str, int] = {}
    data = []
    for orig_i, (c, s, tool) in ordered:
        i = idx_within.get(c, 0)
        idx_within[c] = i + 1
        data.append((c, i, "user", f"t{orig_i}", tool, base + dt.timedelta(seconds=s)))
    check(spark.createDataFrame(data, schema), bucket_seconds=7)

    # row-bucketed: arbitrary ts-vs-turn order is allowed
    raw = [
        (c, i, "user", f"t{i}", tool, base + dt.timedelta(seconds=s))
        for i, (c, s, tool) in enumerate(rows)
    ]
    check(spark.createDataFrame(raw, schema), bucket_rows=3)


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
base_doc = st.lists(st.sampled_from(WORDS), min_size=4, max_size=9)


@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(base_doc, min_size=2, max_size=5),
    mutate_at=st.integers(min_value=0, max_value=6),
)
def test_minhash_lsh_vs_exact_jaccard_random(spark, docs, mutate_at):
    """Randomized precision/recall contract for minhash_lsh_pairs:
    every reported pair's jaccard is the EXACT value and ≥ threshold
    (the verify stage guarantees precision), and every pair whose true
    jaccard is comfortably above threshold is found (banding miss odds at
    J ≥ 0.75 with 64 hashes / 16 bands ≈ 2e-4; derandomized, so green
    once = green always). A forced near-dup (one-word mutation) keeps the
    positive class populated."""
    from funcify_feature_eng_spark.operators.dedup import minhash_lsh_pairs

    texts = [" ".join(w) for w in docs]
    mutated = list(docs[0])
    mutated[mutate_at % len(mutated)] = "OMEGA"
    texts.append(" ".join(mutated))

    def sh(t, k=3):
        tk = t.lower().split()
        if len(tk) >= k:
            return {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}
        return {" ".join(tk)}

    def jac(a, b):
        sa, sb = sh(a), sh(b)
        return len(sa & sb) / len(sa | sb)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", verify_threshold=0.5
        ).collect()
    }
    # precision: reported jaccard is exact and above threshold
    for (a, b), j in got.items():
        true_j = jac(texts[a], texts[b])
        assert abs(j - round(true_j, 6)) < 1e-9
        assert j >= 0.5
    # recall: comfortably-similar pairs must be present
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if jac(texts[a], texts[b]) >= 0.75:
                assert (a, b) in got, f"missed pair ({a},{b})"


rolling_rows = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),      # entity
        st.integers(min_value=0, max_value=50),  # offset seconds
        st.integers(min_value=0, max_value=100),  # integer value
    ),
    min_size=1,
    max_size=12,
)


@SETTLE
@given(rows=rolling_rows, window_s=st.sampled_from([1, 5, 20]))
def test_rolling_time_agg_matches_brute_force(spark, rows, window_s):
    """Randomized clocks with heavy ties: the RANGE frame must equal the
    brute-force 'all rows of my entity in [es-w, es-1]' definition."""
    import datetime as dt

    from funcify_feature_eng_spark.operators.windows import rolling_time_agg

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, u, t0 + dt.timedelta(seconds=off), v)
        for i, (u, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, u string, ts timestamp, v long")
    got = {
        r["event_id"]: (r["prev_cnt"], r["prev_sum"])
        for r in rolling_time_agg(
            df, keys=["u"], ts_col="ts", value_col="v", window_s=window_s
        ).collect()
    }
    for i, u, ts, _v in data:
        es = int(ts.timestamp())
        prior = [
            v2 for (_j, u2, ts2, v2) in data
            if u2 == u and es - window_s <= int(ts2.timestamp()) <= es - 1
        ]
        assert got[i] == (len(prior), sum(prior)), (i, window_s)


@SETTLE
@given(rows=rolling_rows)
def test_cumulative_target_encode_matches_brute_force(spark, rows):
    """Strictly-prior per-category smoothed mean over a random total order
    (category reused as the entity column; ties broken by event_id)."""
    import datetime as dt

    from funcify_feature_eng_spark.operators.encoding import cumulative_target_encode

    M, PRIOR = 3, 7
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, u, t0 + dt.timedelta(seconds=off), v)
        for i, (u, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, cat string, ts timestamp, v long")
    got = {
        r["event_id"]: (r["enc_cnt"], r["enc_sum"], r["enc"])
        for r in cumulative_target_encode(
            df, category_col="cat", target_col="v", order=("ts", "event_id"),
            smoothing_m=M, prior=PRIOR, out_col="enc",
        ).collect()
    }
    for cat in {u for _i, u, _t, _v in data}:
        sub = sorted(
            [(ts, i, v) for (i, u, ts, v) in data if u == cat],
            key=lambda t: (t[0], t[1]),
        )
        cnt = ssum = 0
        for ts, i, v in sub:
            assert got[i] == (cnt, ssum, (ssum + M * PRIOR) // (cnt + M)), i
            cnt += 1
            ssum += v


# ------------------------------------------------ transcript_qa invariants

conv_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # conv_id
        st.sampled_from(["user", "assistant", "tool"]),   # role
        st.integers(min_value=0, max_value=9),            # cost
    ),
    min_size=1, max_size=12,
)


@SETTLE
@given(rows=conv_rows, budget=st.integers(min_value=0, max_value=30))
def test_truncate_to_budget_matches_reference(spark, rows, budget):
    """Suffix rule vs a pure-Python reference: kept = longest suffix whose
    cumulative cost <= budget, per conversation."""
    from funcify_feature_eng_spark.operators.transcript_qa import (
        truncate_to_budget,
    )

    data = [(cid, i, role, cost) for i, (cid, role, cost) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "conv_id int, turn_idx int, role string, cost int")
    got = {(r["conv_id"], r["turn_idx"]): r["kept"]
           for r in truncate_to_budget(
               df, entity_col="conv_id", order=("turn_idx",),
               cost="cost", budget=budget).collect()}
    by_conv = {}
    for cid, i, _role, cost in data:
        by_conv.setdefault(cid, []).append((i, cost))
    for cid, turns in by_conv.items():
        turns.sort()
        acc = 0
        expect = {}
        for i, cost in reversed(turns):
            acc += cost
            expect[i] = acc <= budget
        for i, _ in turns:
            assert got[(cid, i)] == expect[i]


@SETTLE
@given(rows=conv_rows)
def test_role_audit_matches_reference(spark, rows):
    """Window formulation vs a pure-Python replay of the same machine."""
    from funcify_feature_eng_spark.operators.transcript_qa import (
        role_sequence_audit,
    )

    allowed = {("user", "assistant"), ("assistant", "user"),
               ("assistant", "tool"), ("tool", "assistant")}
    data = [(cid, i, role) for i, (cid, role, _c) in enumerate(rows)]
    df = spark.createDataFrame(data, "conv_id int, turn_idx int, role string")
    got = {r["conv_id"]: (r["n_turns"], r["n_violations"],
                          r["first_violation_ord"], r["is_valid"])
           for r in role_sequence_audit(
               df, entity_col="conv_id", order=("turn_idx",),
               role_col="role", allowed=sorted(allowed),
               allowed_start=("user",)).collect()}
    by_conv = {}
    for cid, i, role in data:
        by_conv.setdefault(cid, []).append((i, role))
    for cid, turns in by_conv.items():
        turns.sort()
        n = v = ford = 0
        last = None
        for pos, (_i, role) in enumerate(turns, start=1):
            n += 1
            ok = (role == "user") if pos == 1 else (last, role) in allowed
            if not ok:
                v += 1
                if ford == 0:
                    ford = pos
            last = role
        assert got[cid] == (n, v, ford, v == 0)


@SETTLE
@given(rows=conv_rows)
def test_render_offsets_always_slice_render_text(spark, rows):
    """Offset/text consistency on arbitrary conversations: every content
    span slices back to the turn's own content."""
    from funcify_feature_eng_spark.operators.transcript_qa import (
        render_offsets,
        render_text,
    )

    data = [(cid, i, role, f"t{cost}" * cost)
            for i, (cid, role, cost) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "conv_id int, turn_idx int, role string, text string")
    kw = dict(entity_col="conv_id", order=("turn_idx",),
              role_col="role", text_col="text")
    texts = {r["conv_id"]: r["conv_text"]
             for r in render_text(df, **kw).collect()}
    for r in render_offsets(df, **kw).collect():
        assert texts[r["conv_id"]][r["start_off"]:r["end_off"]] == r["text"]


scale_rows = st.lists(
    st.tuples(
        st.sampled_from(["g0", "g1"]),
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    ),
    min_size=1,
    max_size=24,
)


@SETTLE
@given(rows=scale_rows)
def test_scaling_family_invariants(spark, rows):
    """Range/NULL/idempotence invariants of the conditioning transforms vs
    a pure-Python reference on random grouped integer data."""
    from funcify_feature_eng_spark.operators.scaling import (
        minmax_scale,
        rank_normalize,
        standardize,
        winsorize,
    )

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id bigint, g string, v long"
    )
    mm = minmax_scale(df, "v", group_by=["g"])
    rn = rank_normalize(mm, "v", tiebreak="id", group_by=["g"])
    zs = standardize(rn, "v", group_by=["g"])
    ws = winsorize(
        zs, "v", lower_ppm=100_000, upper_ppm=900_000, tiebreak="id",
        group_by=["g"],
    )
    out = ws.collect()
    assert len(out) == len(rows)
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for r in out:
        vals = [v for v in by_g[r["g"]] if v is not None]
        if r["v"] is None:
            assert (r["minmax_e6"] is None and r["rank_ppm"] is None
                    and r["zscore"] is None and r["winsorized"] is None)
            continue
        assert 0 <= r["minmax_e6"] <= 1_000_000
        assert 0 <= r["rank_ppm"] <= 1_000_000
        # winsorized stays inside the group's value range and clips order-
        # preservingly: original min/max rows map to clipped min/max
        assert min(vals) <= r["winsorized"] <= max(vals)
        if len(vals) >= 2 and len(set(vals)) >= 2:
            assert r["zscore"] is not None
        # extremes hit the grid ends exactly when distinct values exist
        if len(set(vals)) >= 2:
            if r["v"] == max(vals):
                assert r["minmax_e6"] == 1_000_000
            if r["v"] == min(vals):
                assert r["minmax_e6"] == 0
    # z-scores sum to ~0 per group (exact integer moments -> tiny fp error)
    for g, vals in by_g.items():
        zs_g = [r["zscore"] for r in out if r["g"] == g and r["zscore"] is not None]
        if zs_g:
            assert abs(sum(zs_g)) < 1e-9 * max(1.0, max(abs(z) for z in zs_g)) * len(zs_g)


@SETTLE
@given(rows=scale_rows)
def test_winsorize_idempotent(spark, rows):
    """Winsorizing an already-winsorized column at the same band is the
    identity (the thresholds are data values, so re-clipping moves
    nothing... with ranks recomputed over the CLIPPED distribution the
    band can only widen coverage, never move values)."""
    from funcify_feature_eng_spark.operators.scaling import winsorize

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id bigint, g string, v long"
    )
    once = winsorize(
        df, "v", lower_ppm=200_000, upper_ppm=800_000, tiebreak="id",
        group_by=["g"], out_col="w1",
    ).drop("v").withColumnRenamed("w1", "v")
    twice = winsorize(
        once, "v", lower_ppm=200_000, upper_ppm=800_000, tiebreak="id",
        group_by=["g"], out_col="w2",
    )
    for r in twice.collect():
        if r["v"] is not None:
            assert r["w2"] == r["v"], r
