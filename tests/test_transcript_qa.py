"""Tests for operators/transcript_qa.py (conversation-grain QA)."""

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.transcript_qa import (
    boilerplate_stats,
    conversation_dedup,
    conversation_fingerprints,
    drop_boilerplate,
    role_sequence_audit,
    truncate_to_budget,
)

ALLOWED = [
    ("system", "user"),
    ("user", "assistant"),
    ("assistant", "user"),
    ("assistant", "tool"),
    ("tool", "assistant"),
]


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id: long, turn_idx: int, role: string, text: string"
    )


def test_role_sequence_audit_hand_computed(spark):
    df = _turns(spark, [
        # conv 1: fully valid
        (1, 0, "system", "s"), (1, 1, "user", "u"), (1, 2, "assistant", "a"),
        (1, 3, "tool", "t"), (1, 4, "assistant", "a2"),
        # conv 2: opens wrong (tool), then user->user violation at pos 3
        (2, 0, "tool", "t"), (2, 1, "assistant", "a"),
        (2, 2, "user", "u"), (2, 3, "user", "u2"),
        # conv 3: NULL role mid-conversation (two violations: into + out of)
        (3, 0, "user", "u"), (3, 1, None, "x"), (3, 2, "assistant", "a"),
    ])
    got = {
        r["conv_id"]: (r["n_turns"], r["n_violations"],
                       r["first_violation_ord"], r["is_valid"])
        for r in role_sequence_audit(
            df, entity_col="conv_id", order=("turn_idx",), role_col="role",
            allowed=ALLOWED, allowed_start=("system", "user"),
        ).collect()
    }
    assert got[1] == (5, 0, 0, True)
    # conv 2: pos 1 bad start; tool->assistant ok; assistant->user ok;
    # user->user bad -> 2 violations, first at 1
    assert got[2] == (4, 2, 1, False)
    # conv 3: user->NULL and NULL->assistant both violate
    assert got[3] == (3, 2, 2, False)


def test_role_audit_default_start_accepts_any_role(spark):
    df = _turns(spark, [(1, 0, "tool", "t"), (1, 1, "assistant", "a")])
    row = role_sequence_audit(
        df, entity_col="conv_id", order=("turn_idx",), role_col="role",
        allowed=ALLOWED,
    ).collect()[0]
    assert row["is_valid"] and row["n_violations"] == 0


def _dup_convs(spark):
    # convs 1 and 3 are identical journeys; 2 differs in order; 4 differs
    # in payload; 5 is a single-turn conv whose text equals a turn of 1
    return _turns(spark, [
        (1, 0, "user", "hi"), (1, 1, "assistant", "hello"),
        (2, 0, "assistant", "hello"), (2, 1, "user", "hi"),
        (3, 0, "user", "hi"), (3, 1, "assistant", "hello"),
        (4, 0, "user", "hi"), (4, 1, "assistant", "hey"),
        (5, 0, "user", "hi"),
    ])


def test_conversation_dedup_hand_computed(spark):
    got = {
        r["conv_id"]: (r["winner_id"], r["is_dup"])
        for r in conversation_dedup(
            _dup_convs(spark), entity_col="conv_id", order=("turn_idx",),
            payload_cols=("role", "text"), hashed=False,
        ).collect()
    }
    assert got == {1: (1, False), 2: (2, False), 3: (1, True),
                   4: (4, False), 5: (5, False)}


def test_conversation_dedup_hashed_equals_plain(spark):
    df = _dup_convs(spark)
    kw = dict(entity_col="conv_id", order=("turn_idx",),
              payload_cols=("role", "text"))
    plain = {(r["conv_id"], r["winner_id"], r["is_dup"])
             for r in conversation_dedup(df, hashed=False, **kw).collect()}
    hashed = {(r["conv_id"], r["winner_id"], r["is_dup"])
              for r in conversation_dedup(df, hashed=True, **kw).collect()}
    assert plain == hashed


def test_fingerprint_null_vs_literal_null_text(spark):
    df = _turns(spark, [(1, 0, "user", None), (2, 0, "user", "null")])
    fps = conversation_fingerprints(
        df, entity_col="conv_id", order=("turn_idx",),
        payload_cols=("role", "text"), hashed=False,
    ).collect()
    vals = {r["conv_id"]: r["fingerprint"] for r in fps}
    assert vals[1] != vals[2]


def _costed(spark):
    # conv 1 costs oldest->newest: 50, 40, 30, 20, 10
    rows = [(1, i, "user", "x", c) for i, c in enumerate([50, 40, 30, 20, 10])]
    rows += [(2, 0, "system", "s", 100), (2, 1, "user", "u", 60),
             (2, 2, "assistant", "a", 30)]
    return spark.createDataFrame(
        rows, "conv_id: long, turn_idx: int, role: string, text: string, cost: int"
    )


def test_truncate_suffix_hand_computed(spark):
    out = truncate_to_budget(
        _costed(spark), entity_col="conv_id", order=("turn_idx",),
        cost="cost", budget=60,
    )
    kept = {(r["conv_id"], r["turn_idx"]): r["kept"] for r in out.collect()}
    # conv1 suffix sums (from end): 10, 30, 60, 100, 150 -> keep idx 2,3,4
    assert [kept[(1, i)] for i in range(5)] == [False, False, True, True, True]
    # conv2 suffix sums: 30, 90, 190 -> keep only idx 2
    assert [kept[(2, i)] for i in range(3)] == [False, False, True]


def test_truncate_pin_first_reserves_opener_cost(spark):
    out = truncate_to_budget(
        _costed(spark), entity_col="conv_id", order=("turn_idx",),
        cost="cost", budget=120, pin_first=True,
    )
    kept = {(r["conv_id"], r["turn_idx"]): r["kept"] for r in out.collect()}
    # conv2: opener cost 100 always kept; remaining budget 20 -> neither
    # the 60 nor the 30+60 suffix fits, but the 30-cost tail... 30 > 20
    assert [kept[(2, i)] for i in range(3)] == [True, False, False]
    # conv1: opener 50 kept, remaining 70 -> suffix sums 10,30,60 fit
    assert [kept[(1, i)] for i in range(5)] == [True, False, True, True, True]


def test_truncate_opener_larger_than_budget_still_pinned(spark):
    out = truncate_to_budget(
        _costed(spark), entity_col="conv_id", order=("turn_idx",),
        cost="cost", budget=50, pin_first=True,
    )
    kept = {(r["conv_id"], r["turn_idx"]): r["kept"] for r in out.collect()}
    assert kept[(2, 0)] is True and kept[(2, 1)] is False and kept[(2, 2)] is False


def test_truncate_rejects_negative_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        truncate_to_budget(
            _costed(spark), entity_col="conv_id", order=("turn_idx",),
            cost="cost", budget=-1,
        )


def _bp(spark):
    return _turns(spark, [
        (1, 0, "assistant", "I  am an AI assistant."),
        (1, 1, "assistant", "unique one"),
        (2, 0, "assistant", "I am an AI  assistant."),
        (2, 1, "assistant", "I am an AI assistant."),   # repeat in same conv
        (3, 0, "assistant", "unique two"),
        (3, 1, "assistant", None),
        (3, 2, "assistant", ""),
    ])


def test_boilerplate_distinct_entity_threshold(spark):
    got = {
        r["turn_text"]: (r["n_entities"], r["n_rows"])
        for r in boilerplate_stats(
            _bp(spark), entity_col="conv_id", text_col="text", min_entities=2,
        ).collect()
    }
    # whitespace-normalized banner: convs {1, 2} distinct, 3 rows total;
    # conv 2's in-conversation repeat does NOT create a second entity
    assert got == {"I am an AI assistant.": (2, 3)}


def test_drop_boilerplate_keeps_non_text_rows(spark):
    out = drop_boilerplate(
        _bp(spark), entity_col="conv_id", text_col="text", min_entities=2,
    )
    texts = sorted((r["conv_id"], r["turn_idx"]) for r in out.collect())
    assert texts == [(1, 1), (3, 0), (3, 1), (3, 2)]
    assert out.columns == ["conv_id", "turn_idx", "role", "text"]


# ----------------------------------------------- SFT rendering / loss mask


def test_render_offsets_index_into_render_text(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import (
        render_offsets,
        render_text,
    )

    df = _turns(spark, [
        (1, 0, "system", "be good"),
        (1, 1, "user", "hi"),
        (1, 2, "assistant", "héllo"),   # multibyte: offsets are codepoints
        (1, 3, "tool", None),           # NULL content renders empty
        (2, 0, "user", "solo"),
    ])
    kw = dict(entity_col="conv_id", order=("turn_idx",),
              role_col="role", text_col="text")
    offs = render_offsets(df, **kw).collect()
    texts = {r["conv_id"]: r["conv_text"]
             for r in render_text(df, **kw).collect()}
    for r in offs:
        t = texts[r["conv_id"]]
        assert t[r["start_off"]:r["end_off"]] == (r["text"] or "")
    tr = {(r["conv_id"], r["turn_idx"]): r["trainable"] for r in offs}
    assert tr[(1, 2)] is True and tr[(1, 1)] is False and tr[(1, 3)] is False
    assert texts[1] == "<|system|>be good\n<|user|>hi\n<|assistant|>héllo\n<|tool|>\n"
    assert texts[2] == "<|user|>solo\n"


def test_render_text_conv_chars(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import render_text

    df = _turns(spark, [(1, 0, "user", "ab")])
    row = render_text(df, entity_col="conv_id", order=("turn_idx",),
                      role_col="role", text_col="text").collect()[0]
    assert row["conv_chars"] == len("<|user|>ab\n")


def test_render_null_role_consistent_between_offsets_and_text(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import (
        render_offsets,
        render_text,
    )

    df = _turns(spark, [(1, 0, None, "x"), (1, 1, "assistant", "y")])
    kw = dict(entity_col="conv_id", order=("turn_idx",),
              role_col="role", text_col="text")
    text = render_text(df, **kw).collect()[0]["conv_text"]
    assert text == "<||>x\n<|assistant|>y\n"
    for r in render_offsets(df, **kw).collect():
        assert text[r["start_off"]:r["end_off"]] == (r["text"] or "")
        if r["turn_idx"] == 0:
            assert r["trainable"] is False


def test_state_transitions_counts_and_probs(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import (
        state_transitions,
    )

    rows = [
        # conv A: u -> a -> t -> a   |  conv B: u -> a -> u
        ("A", 1, "u"), ("A", 2, "a"), ("A", 3, "t"), ("A", 4, "a"),
        ("B", 1, "u"), ("B", 2, "a"), ("B", 3, "u"),
        ("C", 1, None), ("C", 2, "a"),   # NULL-adjacent pairs excluded
    ]
    df = spark.createDataFrame(rows, "conv string, idx int, role string")
    out = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob_ppm"])
        for r in state_transitions(
            df, entity_col="conv", order=("idx",), state_col="role"
        ).collect()
    }
    # from u: ->a twice (prob 1.0); from a: ->t, ->u, (A4 ends, B3 end)
    assert out[("u", "a")] == (2, 1_000_000)
    assert out[("a", "t")] == (1, 500_000)
    assert out[("a", "u")] == (1, 500_000)
    assert out[("t", "a")] == (1, 1_000_000)
    # C's (NULL -> a) pair is excluded entirely
    assert len(out) == 4
    assert sum(n for n, _ in out.values()) == 5


def test_state_transitions_grouped_rows_sum_to_one(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import (
        state_transitions,
    )

    rows = [
        ("g1", "A", 1, "x"), ("g1", "A", 2, "y"), ("g1", "A", 3, "x"),
        ("g2", "B", 1, "x"), ("g2", "B", 2, "x"), ("g2", "B", 3, "y"),
        ("g2", "B", 4, "y"),
    ]
    df = spark.createDataFrame(rows, "g string, conv string, idx int, role string")
    out = state_transitions(
        df, entity_col="conv", order=("idx",), state_col="role",
        group_by=["g"],
    ).collect()
    # per (group, from_state), probs sum to 1e6 minus flooring dust
    from collections import defaultdict
    sums = defaultdict(int)
    for r in out:
        sums[(r["g"], r["from_state"])] += r["prob_ppm"]
    for (_, _), s in sums.items():
        assert 1_000_000 - 3 <= s <= 1_000_000


# ---------------------------------------------------------------- wave 6


def _turns_tool(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id: long, turn_idx: int, role: string, text: string, tool: string"
    )


def test_context_examples_hand_computed(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import context_examples

    df = _turns(spark, [
        (1, 0, "system", "S"), (1, 1, "user", "U1"), (1, 2, "assistant", "A1"),
        (1, 3, "user", "U2"), (1, 4, "assistant", "A2"),
        # conv 2 OPENS with the target role: context must be ''
        (2, 0, "assistant", "A"), (2, 1, "user", "U"),
    ])
    out = context_examples(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text", target_roles=("assistant",), k=2,
    ).orderBy("conv_id", "turn_idx").collect()
    got = [(r["conv_id"], r["turn_idx"], r["context"], r["target"],
            r["n_context_turns"]) for r in out]
    assert got == [
        (1, 2, "<|system|>S\n<|user|>U1\n", "A1", 2),
        # k=2 window slides: system turn falls out
        (1, 4, "<|assistant|>A1\n<|user|>U2\n", "A2", 2),
        (2, 0, "", "A", 0),
    ]


def test_context_examples_is_substring_of_render_text(spark):
    """Every context must be a VERBATIM substring of the full rendered
    conversation (shared rendering contract with render_text)."""
    from funcify_feature_eng_spark.operators.transcript_qa import (
        context_examples, render_text,
    )

    df = _turns(spark, [
        (7, i, ["user", "assistant"][i % 2], f"t{i}") for i in range(6)
    ])
    full = render_text(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text",
    ).collect()[0]["conv_text"]
    for r in context_examples(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text", k=3,
    ).collect():
        assert r["context"] in full


def test_context_examples_no_leakage_and_null_text(spark):
    """The frame ends at -1: a target's own text never appears in its
    context; NULL text renders empty, role NULL renders <||>."""
    from funcify_feature_eng_spark.operators.transcript_qa import context_examples

    df = _turns(spark, [
        (1, 0, "user", None), (1, 1, None, "x"), (1, 2, "assistant", "ONLY_IN_TARGET"),
    ])
    [r] = context_examples(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text", k=5,
    ).collect()
    assert r["context"] == "<|user|>\n<||>x\n"
    assert "ONLY_IN_TARGET" not in r["context"] and r["target"] == "ONLY_IN_TARGET"
    with pytest.raises(ValueError, match="k must be"):
        context_examples(
            df, entity_col="conv_id", order=("turn_idx",),
            role_col="role", text_col="text", k=0,
        )


def test_tool_call_loops_hand_computed(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import tool_call_loops

    df = _turns_tool(spark, [
        # conv 1: search x3 (a loop), break by NULL, search x2 again, fetch x1
        (1, 0, "assistant", "a", "search"),
        (1, 1, "assistant", "a", "search"),
        (1, 2, "assistant", "a", "search"),
        (1, 3, "user", "u", None),
        (1, 4, "assistant", "a", "search"),
        (1, 5, "assistant", "a", "search"),
        (1, 6, "assistant", "a", "fetch"),
        # conv 2: no tool turns at all -> absent from output
        (2, 0, "user", "u", None),
        # conv 3: two runs of equal length 2 -> tie breaks to the EARLIEST
        (3, 0, "assistant", "a", "b_tool"),
        (3, 1, "assistant", "a", "b_tool"),
        (3, 2, "assistant", "a", "a_tool"),
        (3, 3, "assistant", "a", "a_tool"),
    ])
    out = {r["conv_id"]: r for r in tool_call_loops(
        df, entity_col="conv_id", order=("turn_idx",), tool_col="tool", min_run=3,
    ).collect()}
    assert set(out) == {1, 3}
    r1 = out[1]
    assert (r1["n_tool_turns"], r1["n_runs"], r1["max_run_len"],
            r1["n_loops"], r1["loop_tool"]) == (6, 3, 3, 1, "search")
    r3 = out[3]
    assert (r3["n_tool_turns"], r3["n_runs"], r3["max_run_len"],
            r3["n_loops"], r3["loop_tool"]) == (4, 2, 2, 0, "b_tool")


def test_tool_call_loops_null_breaks_run(spark):
    """Two identical tools separated by a non-tool turn are TWO runs —
    filtering NULLs before the islands would wrongly merge them."""
    from funcify_feature_eng_spark.operators.transcript_qa import tool_call_loops

    df = _turns_tool(spark, [
        (1, 0, "assistant", "a", "t"),
        (1, 1, "user", "u", None),
        (1, 2, "assistant", "a", "t"),
    ])
    [r] = tool_call_loops(
        df, entity_col="conv_id", order=("turn_idx",), tool_col="tool", min_run=2,
    ).collect()
    assert (r["n_runs"], r["max_run_len"], r["n_loops"]) == (2, 1, 0)


def test_self_repetition_hand_computed(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import (
        self_repetition_stats,
    )

    df = _turns(spark, [
        # conv 1: assistant says "hi" 3x and "bye" 1x -> 2 repeated of 4
        (1, 0, "assistant", "hi"), (1, 1, "user", "hi"),
        (1, 2, "assistant", "hi"), (1, 3, "assistant", "bye"),
        (1, 4, "assistant", "hi"),
        # conv 2: all distinct; NULL text excluded
        (2, 0, "assistant", "x"), (2, 1, "assistant", None),
        (2, 2, "assistant", "y"),
    ])
    out = {r["conv_id"]: r for r in self_repetition_stats(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text",
    ).collect()}
    r1, r2 = out[1], out[2]
    assert (r1["n_turns"], r1["n_repeated"], r1["n_distinct"]) == (4, 2, 2)
    assert r1["repetition_ppm"] == 500_000
    assert (r2["n_turns"], r2["n_repeated"], r2["n_distinct"]) == (2, 0, 2)
    assert r2["repetition_ppm"] == 0


def test_retry_similarity_hand_computed(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import retry_similarity

    df = _turns(spark, [
        (1, 0, "assistant", "hello world"),
        (1, 1, "user", "IGNORED"),           # not counted: no effect on lag
        (1, 2, "assistant", "hello worlds"), # 1 edit / 12 chars
        (1, 3, "assistant", "zzz"),          # 12 edits / 12 chars
        (2, 0, "assistant", None),           # NULL text -> ''
        (2, 1, "assistant", ""),             # '' vs '' -> 0/1 = retry
    ])
    out = {(r["conv_id"], r["turn_idx"]): r for r in retry_similarity(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text", near_ppm=200_000,
    ).collect()}
    assert len(out) == 5  # user turn excluded
    first = out[(1, 0)]
    assert first["lev_dist"] is None and first["is_near_retry"] is False
    r2 = out[(1, 2)]
    assert (r2["lev_dist"], r2["rel_dist_ppm"], r2["is_near_retry"]) == (
        1, 83_333, True)  # floor(1e6/12)
    r3 = out[(1, 3)]
    assert (r3["lev_dist"], r3["rel_dist_ppm"], r3["is_near_retry"]) == (
        12, 1_000_000, False)
    rb = out[(2, 1)]
    assert (rb["lev_dist"], rb["rel_dist_ppm"], rb["is_near_retry"]) == (
        0, 0, True)


def test_retry_similarity_truncation_bounds_cost(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import retry_similarity

    df = _turns(spark, [
        (1, 0, "assistant", "a" * 50 + "X"),
        (1, 1, "assistant", "a" * 50 + "Y"),
    ])
    [_, r] = retry_similarity(
        df, entity_col="conv_id", order=("turn_idx",),
        role_col="role", text_col="text", max_chars=50,
    ).orderBy("turn_idx").collect()
    # both truncated to 'a'*50 -> identical
    assert r["lev_dist"] == 0 and r["is_near_retry"] is True


def test_path_ngrams_hand_computed(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import path_ngrams

    df = _turns(spark, [
        (1, 0, "u", "x"), (1, 1, "a", "x"), (1, 2, "u", "x"), (1, 3, "a", "x"),
        (2, 0, "u", "x"), (2, 1, "a", "x"), (2, 2, "u", "x"),
        # conv 3: NULL state breaks every window containing it
        (3, 0, "u", "x"), (3, 1, None, "x"), (3, 2, "u", "x"), (3, 3, "a", "x"),
    ])
    out = {r["ngram"]: r["n_occurrences"] for r in path_ngrams(
        df, entity_col="conv_id", order=("turn_idx",), state_col="role", n=3,
    ).collect()}
    assert out == {"u>a>u": 2, "a>u>a": 1}
    # n=2 reduces to transition counts
    out2 = {r["ngram"]: r["n_occurrences"] for r in path_ngrams(
        df, entity_col="conv_id", order=("turn_idx",), state_col="role", n=2,
    ).collect()}
    # conv1 u,a,u,a -> u>a x2, a>u x1; conv2 u,a,u -> one each;
    # conv3 u,NULL,u,a -> only (u,a) survives the NULL exclusion
    assert out2 == {"u>a": 4, "a>u": 2}
    with pytest.raises(ValueError, match="n must be"):
        path_ngrams(df, entity_col="conv_id", order=("turn_idx",),
                    state_col="role", n=1)


def test_path_ngrams_separator_collision_raises(spark):
    from funcify_feature_eng_spark.operators.transcript_qa import path_ngrams

    df = _turns(spark, [(1, 0, "a>b", "x"), (1, 1, "c", "x")])
    with pytest.raises(Exception, match="separator"):
        path_ngrams(df, entity_col="conv_id", order=("turn_idx",),
                    state_col="role", n=2).collect()
