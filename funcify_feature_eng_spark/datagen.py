"""Deterministic synthetic fixtures (seed=42) for the transcript workload.

Generates the exact BASELINE.json ``input_hint`` schema::

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

plus the ``feature_store`` table (the TrackableValue analog — reference
``schema/tracking/TrackableValue.kt:109-155``) and the Netflix-demo-shaped
``shows`` table used to port the reference's golden transformer cases
(reference corpus ``funcify-feature-eng-stream/src/main/resources/
netflix_movies_and_tv_shows_202306091725/netflix_titles.csv``).

All generation is numpy/pyarrow on the driver — these are *test* fixtures
(≤ a few million rows); the engine itself never generates data. Conversation
sizes are Zipf-distributed so a few hot conv_ids exercise skew handling, and
duplicate timestamps within a conversation exercise the zero-leakage
tie-break (FIXTURES.md §1 edge cases).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value stream "
    "agg column vector tool call reply plan think act observe answer"
).split()

_ROLES = np.array(["user", "assistant", "tool", "system"])
_TOOLS = np.array(["search", "code", "browser", "calculator"])

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def gen_transcripts(
    n_convs: int = 2000,
    seed: int = 42,
    zipf_a: float = 1.2,
    max_turns: int = 500,
    hot_conv_turns: int = 0,
) -> pa.Table:
    """Seeded transcript table; one row per turn.

    ``hot_conv_turns`` > 0 appends one extra conversation with that many
    turns (the >10^4-turn hot-key edge case from FIXTURES.md §1).
    """
    rng = np.random.default_rng(seed)
    sizes = np.minimum(rng.zipf(zipf_a, n_convs), max_turns).astype(np.int64)
    sizes = np.maximum(sizes, 1)
    if hot_conv_turns > 0:
        sizes = np.append(sizes, hot_conv_turns)
    n = int(sizes.sum())
    conv_ord = np.repeat(np.arange(len(sizes)), sizes)
    conv_id = np.char.add("conv_", np.char.zfill(conv_ord.astype("U8"), 8))
    # dense 0..k-1 turn_idx within each conversation
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    role = _ROLES[rng.integers(0, 4, n)]
    # make turn 0 of each conv a 'user' turn for realism/determinism of firsts
    role[turn_idx == 0] = "user"

    tool = _TOOLS[rng.integers(0, 4, n)].astype(object)
    tool[rng.random(n) < 0.7] = None

    # text: 0..~2000 chars of seeded lorem; include empty strings. A seeded
    # pool of 4096 distinct texts keeps generation O(pool) instead of O(rows)
    # (13M-row bench fixtures) while preserving determinism and skew.
    pool_rng = np.random.default_rng(seed + 7)
    pool: list[str] = []
    for _ in range(4096):
        k = int(pool_rng.integers(0, 60))
        pool.append(" ".join(_WORDS[w] for w in pool_rng.integers(0, len(_WORDS), k)))
    texts = np.array(pool, dtype=object)[rng.integers(0, len(pool), n)]

    # ts: monotone non-decreasing within conversation; gaps 1s..3h, with
    # ~5% zero-gap (duplicate ts) adjacent turns to exercise tie-breaks.
    gaps = rng.integers(1, 10800, n).astype("int64")
    gaps[rng.random(n) < 0.05] = 0
    gaps[turn_idx == 0] = 0
    conv_offsets = rng.integers(0, 86400 * 30, len(sizes))  # conv start within a month
    base = np.repeat(conv_offsets, sizes)
    # cumulative gap within conversation = cumsum - cumsum_at_conv_start
    cum = np.cumsum(gaps)
    cum_at_start = np.repeat(cum[starts] - gaps[starts], sizes)
    ts = EPOCH_2024 + ((base + cum - cum_at_start) * 1_000_000).astype("timedelta64[us]")

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def gen_feature_store(transcripts: pa.Table, seed: int = 42, coverage: float = 0.3) -> pa.Table:
    """Sparse Tracked-value rows for the as-of read-through (FIXTURES.md §2).

    ~``coverage`` of conversations get store rows; some rows are stamped
    *after* request timestamps on purpose — the leakage witnesses.
    """
    rng = np.random.default_rng(seed + 1)
    conv = transcripts.column("conv_id").to_numpy(zero_copy_only=False)
    ts = transcripts.column("ts").to_numpy(zero_copy_only=False)
    uniq = np.unique(conv)
    chosen = uniq[rng.random(len(uniq)) < coverage]
    rows_conv, rows_ts, rows_val = [], [], []
    conv_to_ts: dict[str, np.ndarray] = {}
    order = np.argsort(conv, kind="stable")
    conv_s, ts_s = conv[order], ts[order]
    bounds = np.searchsorted(conv_s, chosen)
    bounds_hi = np.searchsorted(conv_s, chosen, side="right")
    for c, lo, hi in zip(chosen, bounds, bounds_hi):
        conv_to_ts[c] = ts_s[lo:hi]
    for c in chosen:
        tspan = conv_to_ts[c]
        k = int(rng.integers(1, 4))
        for j in range(k):
            # half the rows land inside the conversation's span, half after
            # its end (those must never be visible to any request row)
            if rng.random() < 0.5 and len(tspan) > 0:
                t = tspan[int(rng.integers(0, len(tspan)))]
            else:
                t = tspan[-1] + np.timedelta64(int(rng.integers(1, 7200)), "s")
            rows_conv.append(c)
            rows_ts.append(t)
            rows_val.append(f'{{"v": {int(rng.integers(0, 1000))}}}')
    n = len(rows_conv)
    return pa.table(
        {
            "feature_id": pa.array(["features/convFeatures/storeValue"] * n, pa.string()),
            "conv_id": pa.array(rows_conv, pa.string()),
            "params_hash": pa.array(["default"] * n, pa.string()),
            "value": pa.array(rows_val, pa.string()),
            "value_at_ts": pa.array(np.array(rows_ts, dtype="datetime64[us]"), pa.timestamp("us")),
            "calculated_ts": pa.array(
                np.array(rows_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
        }
    )


def gen_shows(n: int = 200, seed: int = 42) -> pa.Table:
    """Netflix-demo-shaped fixture (FIXTURES.md §3) for golden transformer cases."""
    rng = np.random.default_rng(seed + 2)
    show_id = [f"s{i + 1}" for i in range(n)]
    is_movie = rng.random(n) < 0.7
    typ = np.where(is_movie, "Movie", "TV Show")
    years = rng.integers(1895, 2024, n)  # includes <1900 → extract_decade NULL branch
    years[rng.random(n) < 0.02] = 0  # garbage-coerced years
    casts = [
        [f"actor_{int(a)}" for a in rng.integers(0, 500, int(k))] for k in rng.integers(0, 8, n)
    ]
    duration = np.where(is_movie, rng.integers(45, 200, n), 0)
    seasons = np.where(~is_movie, rng.integers(1, 15, n), 0)
    date_added = EPOCH_2024 - (rng.integers(0, 3650, n) * 86400 * 1_000_000).astype(
        "timedelta64[us]"
    )
    return pa.table(
        {
            "show_id": pa.array(show_id, pa.string()),
            "type": pa.array(typ, pa.string()),
            "title": pa.array([f"title_{i}" for i in range(n)], pa.string()),
            "director": pa.array(
                [None if rng.random() < 0.3 else f"dir_{i % 40}" for i in range(n)], pa.string()
            ),
            "cast": pa.array(casts, pa.list_(pa.string())),
            "country": pa.array(
                [None if rng.random() < 0.2 else "US" for _ in range(n)], pa.string()
            ),
            "date_added": pa.array(date_added, pa.timestamp("us")).cast(pa.date32()),
            "release_year": pa.array(years, pa.int32()),
            "rating": pa.array(rng.choice(["PG", "R", "TV-MA", "PG-13"], n), pa.string()),
            "duration_min": pa.array(
                [int(d) if m else None for d, m in zip(duration, is_movie)], pa.int32()
            ),
            "num_seasons": pa.array(
                [int(s) if not m else None for s, m in zip(seasons, is_movie)], pa.int32()
            ),
            "listed_in": pa.array(
                [["Drama", "Comedy"][: int(k)] for k in rng.integers(1, 3, n)],
                pa.list_(pa.string()),
            ),
            "description": pa.array([f"desc {i}" for i in range(n)], pa.string()),
        }
    )


def ensure_dataset(
    out_dir: str, n_convs: int = 2000, seed: int = 42, hot: int = 0, n_files: int = 1
) -> str:
    """Write transcripts/feature_store/shows parquet under ``out_dir`` once.

    Idempotent (content is a pure function of the args); returns out_dir.
    ``n_files`` > 1 splits transcripts into conv-contiguous files (a dir of
    parquet parts) so scan parallelism isn't capped by row-group count.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".done_{n_convs}_{seed}_{hot}_{n_files}")
    if os.path.exists(marker):
        return out_dir
    tr = gen_transcripts(n_convs=n_convs, seed=seed, hot_conv_turns=hot)
    tr_path = os.path.join(out_dir, "transcripts.parquet")
    if n_files <= 1:
        pq.write_table(tr, tr_path)
    else:
        # split on conversation boundaries so files stay conv-contiguous
        conv = tr.column("conv_id").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(conv[1:] != conv[:-1]) + 1
        cuts = [0] + [
            int(bounds[min(len(bounds) - 1, int(i * len(bounds) / n_files))])
            for i in range(1, n_files)
        ] + [len(conv)]
        os.makedirs(tr_path, exist_ok=True)
        for i in range(n_files):
            if cuts[i + 1] > cuts[i]:
                pq.write_table(
                    tr.slice(cuts[i], cuts[i + 1] - cuts[i]),
                    os.path.join(tr_path, f"part-{i:05d}.parquet"),
                )
    pq.write_table(gen_feature_store(tr, seed=seed), os.path.join(out_dir, "feature_store.parquet"))
    pq.write_table(gen_shows(seed=seed), os.path.join(out_dir, "shows.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
