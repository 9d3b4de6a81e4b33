"""Numeric feature transforms (operators/scaling.py, encoding.py additions,
decay.py) vs pure-Python oracles: binning, min-max, z-score, winsorize,
count encoding, hash crosses, time-decay rollups."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.decay import decay_weight_q, time_decay_agg
from funcify_feature_eng_spark.operators.encoding import count_encode, hash_cross
from funcify_feature_eng_spark.operators.scaling import (
    bin_by_cuts,
    minmax_scale,
    quantile_bin,
    rank_normalize,
    standardize,
    winsorize,
)


def _vals_df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, g string, v bigint")


ROWS = [
    (1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 40), (5, "a", 100),
    (6, "b", 7), (7, "b", 7), (8, "b", 7),
    (9, "c", 5), (10, "c", None),
]


def test_bin_by_cuts_golden(spark):
    df = _vals_df(spark, ROWS)
    out = {r["id"]: r["bin"] for r in bin_by_cuts(df, "v", [10, 30]).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 0, 7: 0, 8: 0, 9: 0, 10: None}
    with pytest.raises(ValueError):
        bin_by_cuts(df, "v", [])
    with pytest.raises(ValueError):
        bin_by_cuts(df, "v", [5, 5])


def test_quantile_bin_matches_pure_python(spark):
    df = _vals_df(spark, ROWS)
    got = {
        r["id"]: r["bin"]
        for r in quantile_bin(df, "v", n_bins=2, tiebreak="id", group_by=["g"]).collect()
    }

    # pure-Python NTILE: first (n % b) buckets get ceil(n/b) rows
    def ntile(ordered_ids, b):
        n = len(ordered_ids)
        out, i = {}, 0
        for bucket in range(1, b + 1):
            size = n // b + (1 if bucket <= n % b else 0)
            for _ in range(size):
                if i < n:
                    out[ordered_ids[i]] = bucket
                    i += 1
        return out

    expect = {}
    for g in ("a", "b", "c"):
        rows = sorted(
            [(v, i) for i, gg, v in ROWS if gg == g and v is not None]
        )
        expect.update(ntile([i for _, i in rows], 2))
    expect[10] = None
    assert got == expect


def test_quantile_bin_tie_determinism(spark):
    # a tie run straddling the bucket boundary: tiebreak id decides
    df = _vals_df(spark, [(i, "t", 5) for i in range(1, 5)])
    got = {r["id"]: r["bin"] for r in quantile_bin(
        df, "v", n_bins=2, tiebreak="id", group_by=["g"]).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_minmax_scale_exact(spark):
    df = _vals_df(spark, ROWS)
    got = {r["id"]: r["minmax_e6"] for r in minmax_scale(
        df, "v", group_by=["g"]).collect()}
    # group a: min 10 max 100 -> floor(1e6*(x-10)/90)
    for i, v in ((1, 10), (2, 20), (3, 20), (4, 40), (5, 100)):
        assert got[i] == (v - 10) * 1_000_000 // 90
    # constant group b -> 0; single-value group c -> 0; NULL -> NULL
    assert got[6] == got[7] == got[8] == 0
    assert got[9] == 0
    assert got[10] is None
    # keyless: global min 5 max 100
    g = {r["id"]: r["minmax_e6"] for r in minmax_scale(df, "v").collect()}
    assert g[5] == 1_000_000 and g[9] == 0 and g[10] is None
    with pytest.raises(ValueError, match="integral"):
        minmax_scale(df.withColumn("v", F.col("v").cast("double")), "v")


def test_standardize_matches_pure_python(spark):
    df = _vals_df(spark, ROWS)
    got = {r["id"]: r["zscore"] for r in standardize(df, "v", group_by=["g"]).collect()}
    a = [10, 20, 20, 40, 100]
    n, s1, s2 = len(a), sum(a), sum(x * x for x in a)
    for i, v in ((1, 10), (2, 20), (3, 20), (4, 40), (5, 100)):
        assert got[i] == (n * v - s1) / math.sqrt(n * s2 - s1 * s1)
    # zero variance / singleton / NULL -> NULL
    assert got[6] is None and got[9] is None and got[10] is None


def test_winsorize_matches_pure_python(spark):
    import random

    rng = random.Random(7)
    rows = [(i, "g" + str(i % 2), rng.randrange(0, 1000)) for i in range(1, 201)]
    rows.append((201, "g0", None))
    df = _vals_df(spark, rows)
    got = {r["id"]: r["winsorized"] for r in winsorize(
        df, "v", lower_ppm=50_000, upper_ppm=950_000, tiebreak="id",
        group_by=["g"]).collect()}

    def pct(vals, ppm):
        n = len(vals)
        k = max(1, -(-ppm * n // 1_000_000))  # ceil
        return sorted(vals)[k - 1]

    for g in ("g0", "g1"):
        vals = [v for i, gg, v in rows if gg == g and v is not None]
        lo, hi = pct(vals, 50_000), pct(vals, 950_000)
        for i, gg, v in rows:
            if gg == g and v is not None:
                assert got[i] == min(hi, max(lo, v)), (i, v, lo, hi)
    assert got[201] is None
    with pytest.raises(ValueError):
        winsorize(df, "v", lower_ppm=-1, upper_ppm=10, tiebreak="id")


def test_count_encode_counts_and_shares(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, None)], "id bigint, cat string"
    )
    got = {r["id"]: (r["cat_cnt"], r["cat_share_ppm"]) for r in count_encode(
        df, "cat").collect()}
    assert got[1] == got[2] == (2, 500_000)
    assert got[3] == (1, 250_000)
    assert got[4] == (1, 250_000)  # NULL is a real level
    # grouped: totals within the group
    df2 = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "x")],
        "id bigint, g string, cat string",
    )
    got2 = {r["id"]: (r["cat_cnt"], r["cat_share_ppm"]) for r in count_encode(
        df2, "cat", group_by=["g"]).collect()}
    assert got2[1] == (2, 666_666) and got2[3] == (1, 333_333)
    assert got2[4] == (1, 1_000_000)


def test_hash_cross_is_stable_and_bounded(spark):
    from funcify_feature_eng_spark.functions.xxh64 import spark_xxhash64

    df = spark.createDataFrame(
        [(1, "u1", "click"), (2, "u2", "view"), (3, "u1", "click")],
        "id bigint, u string, e string",
    )
    out = {r["id"]: r["cross_bucket"] for r in hash_cross(
        df, ["u", "e"], n_buckets=16).collect()}
    assert out[1] == out[3]  # same inputs, same bucket
    assert all(0 <= b < 16 for b in out.values())
    # pure-Python twin of Spark's chained xxhash64 pins the exact bucket
    assert out[1] == spark_xxhash64("u1", "click") % 16
    with pytest.raises(ValueError):
        hash_cross(df, [], n_buckets=4)


def test_decay_weight_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00"),  # fresh: k=0
            (2, "2024-01-09 00:00:01"),  # < 1 day: k=0
            (3, "2024-01-08 23:59:59"),  # just over 1 halflife: k=1
            (4, "2024-01-05 00:00:00"),  # 5 days: k=5
            (5, "2023-01-01 00:00:00"),  # ancient: k > max_pow -> 0
            (6, None),
        ],
        "id bigint, ts string",
    )
    w = decay_weight_q(
        F.col("ts").cast("timestamp"),
        ref_ts="2024-01-10 00:00:00", halflife_s=86400, max_pow=10,
    )
    got = {r["id"]: r["w"] for r in df.select("id", w.alias("w")).collect()}
    assert got[1] == 1024 and got[2] == 1024
    assert got[3] == 512
    assert got[4] == 32
    assert got[5] == 0
    assert got[6] is None


def test_time_decay_agg_matches_pure_python(spark):
    rows = [
        ("u1", "2024-01-10 00:00:00", 100),
        ("u1", "2024-01-08 00:00:00", 200),   # k=2
        ("u1", "2024-01-01 00:00:00", 1000),  # k=9
        ("u1", "2024-01-11 00:00:00", 7777),  # FUTURE: excluded
        ("u1", "2024-01-09 00:00:00", None),  # NULL value: weight only
        ("u2", None, 5),                      # NULL ts: excluded
    ]
    df = spark.createDataFrame(rows, "u string, ts string, v bigint").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = time_decay_agg(
        df, value_col="v", ts_col="ts", keys=["u"],
        ref_ts="2024-01-10 00:00:00", halflife_s=86400, max_pow=10,
    ).collect()
    assert len(out) == 1  # u2 has no usable row
    r = out[0]
    sum_q = 100 * 1024 + 200 * 256 + 1000 * 2
    wsum_q = 1024 + 256 + 2 + 512  # incl. the NULL-value row (k=1)
    assert r["u"] == "u1" and r["n_rows"] == 4
    assert r["decayed_sum_q"] == sum_q
    assert r["decayed_wsum_q"] == wsum_q
    assert r["decayed_sum"] == sum_q / 1024
    assert r["decayed_mean"] == sum_q / (1024 + 256 + 2)
    with pytest.raises(ValueError, match="integral"):
        time_decay_agg(
            df.withColumn("v", F.col("v").cast("double")), value_col="v",
            ts_col="ts", keys=["u"], ref_ts="2024-01-10 00:00:00",
            halflife_s=86400,
        )


def test_time_decay_agg_mergeable(spark):
    rows = [("u1", f"2024-01-{d:02d} 00:00:00", d * 10) for d in range(1, 10)]
    df = spark.createDataFrame(rows, "u string, ts string, v bigint").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    kw = dict(value_col="v", ts_col="ts", keys=["u"],
              ref_ts="2024-01-10 00:00:00", halflife_s=86400, max_pow=20)
    whole = time_decay_agg(df, **kw).collect()[0]
    a = time_decay_agg(df.filter(F.dayofmonth("ts") <= 4), **kw).collect()[0]
    b = time_decay_agg(df.filter(F.dayofmonth("ts") > 4), **kw).collect()[0]
    assert whole["decayed_sum_q"] == a["decayed_sum_q"] + b["decayed_sum_q"]
    assert whole["decayed_wsum_q"] == a["decayed_wsum_q"] + b["decayed_wsum_q"]
    assert whole["n_rows"] == a["n_rows"] + b["n_rows"]


def test_rank_normalize_first_and_average(spark):
    df = _vals_df(spark, [
        (1, "g", 10), (2, "g", 20), (3, "g", 20), (4, "g", 40), (5, "g", None),
    ])
    first = {r["id"]: r["rank_ppm"] for r in rank_normalize(
        df, "v", tiebreak="id", group_by=["g"], method="first").collect()}
    # ranks 1..4 over n=4 -> (rn-1)/3
    assert first == {1: 0, 2: 333_333, 3: 666_666, 4: 1_000_000, 5: None}
    avg = {r["id"]: r["rank_ppm"] for r in rank_normalize(
        df, "v", tiebreak="id", group_by=["g"], method="average").collect()}
    # tie run {2,3} has ranks [2,3] -> avg 2.5 -> (2.5-1)/3 = 0.5
    assert avg == {1: 0, 2: 500_000, 3: 500_000, 4: 1_000_000, 5: None}
    # singleton group -> 0
    one = _vals_df(spark, [(1, "s", 99)])
    assert rank_normalize(one, "v", tiebreak="id", group_by=["g"]).collect()[0][
        "rank_ppm"] == 0
    with pytest.raises(ValueError):
        rank_normalize(df, "v", tiebreak="id", method="median")


def test_pearson_corr_matches_pure_python(spark):
    from funcify_feature_eng_spark.operators.correlation import pearson_corr

    rows = [
        ("g1", 1, 2), ("g1", 2, 4), ("g1", 3, 7), ("g1", 4, 8), ("g1", 5, 9),
        ("g2", 1, 9), ("g2", 2, 5), ("g2", 3, 1),     # perfectly anti-linear
        ("g3", 7, 1), ("g3", 7, 2),                    # zero x-variance
        ("g4", 1, None), ("g4", None, 3), ("g4", 2, 5),  # pairwise deletion
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {r["g"]: (r["n_pairs"], r["pearson_r"]) for r in pearson_corr(
        df, "x", "y", group_by=["g"]).collect()}

    def ref(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            return None
        return (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))

    assert got["g1"] == (5, ref([(1, 2), (2, 4), (3, 7), (4, 8), (5, 9)]))
    assert got["g2"][0] == 3 and abs(got["g2"][1] + 1.0) < 1e-12
    assert got["g3"] == (2, None)
    assert got["g4"] == (1, None)  # one complete pair: zero variance
    with pytest.raises(ValueError, match="integral"):
        pearson_corr(df.withColumn("x", F.col("x").cast("double")), "x", "y")


def test_corr_matrix_one_pass_and_values(spark):
    from funcify_feature_eng_spark.operators.correlation import (
        corr_matrix,
        pearson_corr,
    )

    rows = [(i, i * 2, 100 - i, (i * 7) % 13) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint, d bigint")
    out = corr_matrix(df, ["a", "b", "c", "d"]).collect()
    assert len(out) == 6
    m = {(r["col_x"], r["col_y"]): (r["n_pairs"], r["pearson_r"]) for r in out}
    # matrix entries equal the pairwise operator exactly
    for x, y in [("a", "b"), ("a", "c"), ("c", "d")]:
        lone = pearson_corr(df, x, y).collect()[0]
        assert m[(x, y)] == (lone["n_pairs"], lone["pearson_r"])
    # perfectly (anti-)linear: |r| within one ulp of 1 (the formula does
    # not clamp; the contract is bit-identity across engines, not |r|<=1)
    assert abs(m[("a", "b")][1] - 1.0) < 1e-12
    assert abs(m[("a", "c")][1] + 1.0) < 1e-12
    # single aggregate: exactly one Exchange in the plan
    plan = corr_matrix(df, ["a", "b", "c", "d"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") <= 1
    with pytest.raises(ValueError):
        corr_matrix(df, ["a"])
    with pytest.raises(ValueError):
        corr_matrix(df, ["a", "a"])


def test_pearson_corr_overflow_guard(spark):
    from funcify_feature_eng_spark.operators.correlation import pearson_corr

    big = spark.createDataFrame(
        [(1, 2**31, 5), (2, 3, 6)], "id bigint, x bigint, y bigint"
    )
    with pytest.raises(Exception, match="2\\^31|LONG-product"):
        pearson_corr(big, "x", "y").collect()
    # boundary-1 passes
    ok = spark.createDataFrame(
        [(1, 2**31 - 1, 5), (2, 3, 6)], "id bigint, x bigint, y bigint"
    )
    assert pearson_corr(ok, "x", "y").collect()[0]["n_pairs"] == 2


def test_decay_state_merge_equals_whole(spark):
    from funcify_feature_eng_spark.operators.decay import (
        decay_from_state,
        decay_state,
        merge_decay_states,
        time_decay_agg,
    )

    rows = [("u%d" % (d % 3), f"2024-01-{d:02d} 00:00:00", d * 10)
            for d in range(1, 10)]
    df = spark.createDataFrame(rows, "u string, ts string, v bigint").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    kw = dict(value_col="v", ts_col="ts", keys=["u"],
              ref_ts="2024-01-10 00:00:00", halflife_s=86400, max_pow=20)
    whole = sorted(map(tuple, time_decay_agg(df, **kw).collect()))
    a = decay_state(df.filter(F.dayofmonth("ts") <= 4), **kw)
    b = decay_state(df.filter(F.dayofmonth("ts") > 4), **kw)
    merged = decay_from_state(
        merge_decay_states(a.unionByName(b), keys=["u"]), keys=["u"], max_pow=20
    )
    assert sorted(map(tuple, merged.collect())) == whole


def test_null_group_keys_get_their_own_stats(spark):
    """Regression (wave-11 self-review): groupBy treats NULL as a real
    group, so the broadcast join-backs must be NULL-SAFE — a name-based
    join silently handed NULL-keyed rows NULL stats."""
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 30), (3, "g", 7)],
        "id bigint, g string, v bigint",
    )
    mm = {r["id"]: r["minmax_e6"] for r in minmax_scale(
        df, "v", group_by=["g"]).collect()}
    assert mm[1] == 0 and mm[2] == 1_000_000 and mm[3] == 0
    z = {r["id"]: r["zscore"] for r in standardize(
        df, "v", group_by=["g"]).collect()}
    assert z[1] is not None and z[1] == -z[2]
    w = {r["id"]: r["winsorized"] for r in winsorize(
        df, "v", lower_ppm=0, upper_ppm=1_000_000, tiebreak="id",
        group_by=["g"]).collect()}
    assert w == {1: 10, 2: 30, 3: 7}
    ce = {r["id"]: (r["cat_cnt"], r["cat_share_ppm"]) for r in count_encode(
        spark.createDataFrame(
            [(1, "a", None), (2, "a", None), (3, "a", "x"), (4, None, "x")],
            "id bigint, g string, cat string",
        ), "cat", group_by=["g"]).collect()}
    assert ce[1] == ce[2] == (2, 666_666)   # NULL category within group a
    assert ce[4] == (1, 1_000_000)          # NULL group key is its own group


def test_spearman_corr_matches_pure_python(spark):
    from funcify_feature_eng_spark.operators.correlation import spearman_corr

    rows = [
        # monotone but non-linear (rho 1, pearson < 1), with ties
        ("m", 1, 1), ("m", 2, 8), ("m", 3, 27), ("m", 3, 27), ("m", 5, 125),
        # anti-monotone
        ("a", 1, 9), ("a", 2, 4), ("a", 3, 1),
        # NULLs drop before ranking
        ("n", 1, None), ("n", 2, 5), ("n", 3, 1), ("n", None, 7),
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {r["g"]: (r["n_pairs"], r["spearman_rho"]) for r in spearman_corr(
        df, "x", "y", group_by=["g"]).collect()}

    def ref(pts):
        import math

        def avg_ranks(vals):
            s = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(s):
                j = i
                while j < len(s) and vals[s[j]] == vals[s[i]]:
                    j += 1
                for k in range(i, j):
                    ranks[s[k]] = (i + 1 + j) / 2
                i = j
            return ranks
        rx = avg_ranks([p[0] for p in pts]); ry = avg_ranks([p[1] for p in pts])
        n = len(pts)
        mx = sum(rx) / n; my = sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
            sum((b - my) ** 2 for b in ry))
        return num / den if den else None

    m = ref([(1, 1), (2, 8), (3, 27), (3, 27), (5, 125)])
    assert got["m"][0] == 5 and abs(got["m"][1] - m) < 1e-12
    assert abs(got["m"][1] - 1.0) < 1e-12  # perfectly monotone incl. tie
    assert abs(got["a"][1] + 1.0) < 1e-12
    assert got["n"][0] == 2 and abs(got["n"][1] + 1.0) < 1e-12


def test_decay_weight_ancient_row_short_halflife(spark):
    """Regression: k past 2^31 must give weight 0, not wrap negative via
    an INT cast (which silently turned 'weight 0' into 'weight NULL')."""
    df = spark.createDataFrame(
        [(1, "1970-01-02 00:00:00"), (2, "2024-01-10 00:00:00")],
        "id bigint, ts string",
    )
    w = decay_weight_q(
        F.col("ts").cast("timestamp"),
        ref_ts="2100-01-01 00:00:00", halflife_s=1, max_pow=10,
    )
    got = {r["id"]: r["w"] for r in df.select("id", w.alias("w")).collect()}
    assert got[1] == 0 and got[2] == 0


def test_rank_quantiles_matches_pure_python(spark):
    from funcify_feature_eng_spark.operators.scaling import rank_quantiles

    import random
    rng = random.Random(11)
    rows = [(i, "g" + str(i % 2), rng.randrange(0, 500)) for i in range(1, 102)]
    rows.append((102, "g0", None))
    df = _vals_df(spark, rows)
    pts = [0, 250_000, 500_000, 750_000, 1_000_000]
    got = {(r["g"], r["ppm"]): (r["value"], r["n_values"]) for r in rank_quantiles(
        df, "v", ppms=pts, tiebreak="id", group_by=["g"]).collect()}

    for g in ("g0", "g1"):
        vals = sorted(v for i, gg, v in rows if gg == g and v is not None)
        n = len(vals)
        for p in pts:
            k = max(1, -(-p * n // 1_000_000))
            assert got[(g, p)] == (vals[k - 1], n), (g, p)
    assert len(got) == 10
    # endpoints are exact min / max
    g0 = sorted(v for i, gg, v in rows if gg == "g0" and v is not None)
    assert got[("g0", 0)][0] == g0[0] and got[("g0", 1_000_000)][0] == g0[-1]
    with pytest.raises(ValueError):
        rank_quantiles(df, "v", ppms=[], tiebreak="id")
    with pytest.raises(ValueError):
        rank_quantiles(df, "v", ppms=[2_000_000], tiebreak="id")
    # producer->consumer loop: cuts from rank_quantiles feed bin_by_cuts
    cuts = sorted({got[("g0", p)][0] for p in (250_000, 500_000, 750_000)})
    binned = bin_by_cuts(df.filter(F.col("g") == "g0"), "v", cuts)
    assert binned.filter(F.col("bin").isNull()).count() == 1  # the NULL row


class TestMadOutliers:
    def _brute(self, vals, k):
        import statistics

        med = statistics.median(vals)
        devs = [abs(v - med) for v in vals]
        mad = statistics.median(devs)
        return [abs(v - med) > k * mad for v in vals]

    def test_matches_bruteforce(self, spark):
        import random

        from funcify_feature_eng_spark.operators.scaling import mad_outliers

        rng = random.Random(7)
        rows = []
        for g in ["a", "b"]:
            base = [round(rng.uniform(10, 20), 2) for _ in range(51 if g == "a" else 40)]
            base += [999.99, -500.25]  # gross outliers
            rows += [(g, i, v) for i, v in enumerate(base)]
        df = spark.createDataFrame(rows, ["g", "i", "v"])
        got = (
            mad_outliers(df, "v", k_num=7, k_den=2, group_by=["g"])
            .orderBy("g", "i")
            .collect()
        )
        import collections

        by_g = collections.defaultdict(list)
        for g, i, v in rows:
            by_g[g].append(v)
        exp = {g: self._brute(vs, 3.5) for g, vs in by_g.items()}
        for r in got:
            assert r["is_outlier"] == exp[r["g"]][r["i"]], (r["g"], r["i"])

    def test_nulls_pass_through_unflagged(self, spark):
        from funcify_feature_eng_spark.operators.scaling import mad_outliers

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None), ("a", 100.0)],
            ["g", "v"],
        )
        got = {r["v"]: r["is_outlier"] for r in mad_outliers(
            df, "v", k_num=3, group_by=["g"]
        ).collect()}
        assert got[None] is None
        assert got[100.0] is True and got[2.0] is False

    def test_even_count_doubled_median(self, spark):
        from funcify_feature_eng_spark.operators.scaling import mad_outliers

        df = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (10.0,)], ["v"]
        )
        r = mad_outliers(df, "v", k_num=3).collect()[0]
        # median = 2.5 -> median_x2 = 5.00 exactly on the decimal grid
        assert str(r["median_x2"]) == "5.00"


class TestAcf:
    def test_matches_numpy_pearson_on_lagged_pairs(self, spark):
        import numpy as np

        from funcify_feature_eng_spark.operators.correlation import acf

        rng = np.random.default_rng(11)
        series = {
            "a": rng.integers(0, 1000, 80),
            "b": np.arange(60) * 7 % 101,  # strong periodic structure
        }
        rows = [
            (g, int(i), int(v)) for g, vs in series.items() for i, v in enumerate(vs)
        ]
        df = spark.createDataFrame(rows, ["g", "i", "v"])
        got = {
            (r["g"], r["lag"]): (r["n_pairs"], r["acf_r"])
            for r in acf(
                df, "v", ts_col="i", order_col="i", max_lag=3, group_by=["g"]
            ).collect()
        }
        for g, vs in series.items():
            for k in (1, 2, 3):
                x, y = vs[:-k].astype(float), vs[k:].astype(float)
                exp = np.corrcoef(x, y)[0, 1]
                n, r = got[(g, k)]
                assert n == len(x)
                assert abs(r - exp) < 1e-12, (g, k, r, exp)

    def test_degenerate_constant_series_null(self, spark):
        from funcify_feature_eng_spark.operators.correlation import acf

        df = spark.createDataFrame([(i, 5) for i in range(10)], ["i", "v"])
        rows = acf(df, "v", ts_col="i", order_col="i", max_lag=2).collect()
        assert all(r["acf_r"] is None for r in rows)


class TestSeasonalityProfile:
    def test_hour_of_day_exact(self, spark):
        import datetime as dt

        from funcify_feature_eng_spark.operators.profiling import (
            seasonality_profile,
        )

        base = dt.datetime(2024, 3, 4)  # a Monday
        rows = [(base + dt.timedelta(hours=9, minutes=m),) for m in range(6)]
        rows += [(base + dt.timedelta(hours=18, minutes=m),) for m in range(2)]
        df = spark.createDataFrame(rows, ["ts"])
        got = {r["slot"]: r for r in seasonality_profile(df, "ts").collect()}
        assert got[9]["n"] == 6 and got[18]["n"] == 2
        assert got[9]["share_ppm"] == 750_000
        assert got[9]["index_ppm"] == 18_000_000  # 0.75 * 24 * 1e6
        assert got[18]["index_ppm"] == 6_000_000

    def test_hour_of_week_slots(self, spark):
        import datetime as dt

        from funcify_feature_eng_spark.operators.profiling import (
            seasonality_profile,
        )

        mon9 = dt.datetime(2024, 3, 4, 9)   # Monday 09h -> slot 9
        sun23 = dt.datetime(2024, 3, 10, 23)  # Sunday 23h -> slot 167
        df = spark.createDataFrame([(mon9,), (sun23,)], ["ts"])
        got = {r["slot"]: r["index_ppm"] for r in seasonality_profile(
            df, "ts", grain="hour_of_week"
        ).collect()}
        assert set(got) == {9, 167}
        assert got[9] == 84_000_000  # 0.5 * 168 * 1e6


class TestWoeRatioEncode:
    def test_exact_ratio(self, spark):
        import pyspark.sql.functions as SF

        from funcify_feature_eng_spark.operators.encoding import (
            woe_ratio_encode,
        )

        # cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg; totals 4 pos / 4 neg
        rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
        df = spark.createDataFrame(rows, ["c", "y"])
        got = {r["category"]: r for r in woe_ratio_encode(
            df, category_col="c", label_col=SF.col("y") == 1
        ).collect()}
        # A: (3 * 4 * 1e6) // (1 * 4) = 3_000_000; B: (1*4*1e6)//(3*4)
        assert got["A"]["evidence_ratio_ppm"] == 3_000_000
        assert got["B"]["evidence_ratio_ppm"] == 333_333
        assert got["A"]["pos_share_ppm"] == 750_000
        assert got["A"]["n"] == 4 and got["A"]["n_neg"] == 1

    def test_zero_neg_category_null(self, spark):
        import pyspark.sql.functions as SF

        from funcify_feature_eng_spark.operators.encoding import (
            woe_ratio_encode,
        )

        rows = [("A", 1), ("A", 1), ("B", 0)]
        df = spark.createDataFrame(rows, ["c", "y"])
        got = {r["category"]: r["evidence_ratio_ppm"] for r in woe_ratio_encode(
            df, category_col="c", label_col=SF.col("y") == 1
        ).collect()}
        assert got["A"] is None and got["B"] == 0


class TestConcentrationReport:
    def test_exact_values(self, spark):
        from funcify_feature_eng_spark.operators.profiling import (
            concentration_report,
        )

        # 6 a, 3 b, 1 c -> N=10
        rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
        df = spark.createDataFrame(rows, ["s"])
        r = concentration_report(df, "s").collect()[0]
        assert r["n_rows"] == 10 and r["n_categories"] == 3
        assert r["top_share_ppm"] == 600_000
        assert r["hhi_ppm"] == (36 + 9 + 1) * 1_000_000 // 100
        assert r["simpson_d_ppm"] == (30 + 6 + 0) * 1_000_000 // 90

    def test_null_category_counts(self, spark):
        from funcify_feature_eng_spark.operators.profiling import (
            concentration_report,
        )

        df = spark.createDataFrame([("a",), (None,), (None,)], ["s"])
        r = concentration_report(df, "s").collect()[0]
        assert r["n_categories"] == 2 and r["top_share_ppm"] == 666_666


class TestGiniCoefficient:
    def _brute(self, vals):
        xs = sorted(vals)
        n = len(xs)
        s1 = sum(xs)
        s2 = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s2 - (n + 1) * s1) * 1_000_000 // (n * s1)

    def test_matches_bruteforce(self, spark):
        import random

        from funcify_feature_eng_spark.operators.profiling import (
            gini_coefficient,
        )

        rng = random.Random(9)
        for vals in (
            [1, 1, 1, 1],                      # perfectly equal -> 0
            [0, 0, 0, 10],                     # extreme
            [rng.randrange(0, 500) for _ in range(200)],
        ):
            df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
            r = gini_coefficient(df, "v", scale=0).collect()[0]
            assert r["gini_ppm"] == self._brute(vals), vals
        assert gini_coefficient(
            spark.createDataFrame([(1.0,)], ["v"]), "v"
        ).collect()[0]["gini_ppm"] == 0

    def test_zero_sum_null(self, spark):
        from funcify_feature_eng_spark.operators.profiling import (
            gini_coefficient,
        )

        df = spark.createDataFrame([(0.0,), (0.0,)], ["v"])
        assert gini_coefficient(df, "v").collect()[0]["gini_ppm"] is None


class TestAcfNullTs:
    def test_null_ts_rows_do_not_shift_leads(self, spark):
        from funcify_feature_eng_spark.operators.correlation import acf

        # without the filter, the NULL-ts row sorts FIRST in Spark and
        # LAST in ANSI engines — its value would shift every lead
        clean = spark.createDataFrame(
            [(i, i, (i * 37) % 11) for i in range(20)], ["i", "o", "v"]
        )
        dirty = clean.unionByName(
            spark.createDataFrame([(None, 99, 999)], "i: bigint, o: bigint, v: bigint")
        )
        a = {(r["lag"]): (r["n_pairs"], r["acf_r"]) for r in acf(
            clean, "v", ts_col="i", order_col="o", max_lag=2
        ).collect()}
        b = {(r["lag"]): (r["n_pairs"], r["acf_r"]) for r in acf(
            dirty, "v", ts_col="i", order_col="o", max_lag=2
        ).collect()}
        assert a == b


class TestQuantileMatch:
    def _brute(self, probes, refs):
        rs = sorted(refs)
        out = []
        for v in probes:
            if v is None or not rs:
                out.append(None)
                continue
            c = sum(1 for x in rs if x <= v)
            out.append(rs[max(1, c) - 1])
        return out

    def test_matches_bruteforce(self, spark):
        import random

        from funcify_feature_eng_spark.operators.scaling import quantile_match

        rng = random.Random(31)
        refs = [rng.randrange(0, 60) for _ in range(40)]
        probes = [rng.randrange(-5, 70) for _ in range(60)] + [None]
        rdf = spark.createDataFrame([(v,) for v in refs], "v: int")
        pdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(probes)], "i: int, v: int"
        )
        got = {
            r["i"]: r["matched_value"]
            for r in quantile_match(pdf, rdf, "v").collect()
        }
        exp = self._brute(probes, refs)
        for i in range(len(probes)):
            assert got[i] == exp[i], (i, probes[i])

    def test_below_min_clamps_and_identity(self, spark):
        from funcify_feature_eng_spark.operators.scaling import quantile_match

        rdf = spark.createDataFrame([(10,), (20,), (30,)], "v: int")
        pdf = spark.createDataFrame(
            [(1, 5), (2, 20), (3, 999)], "i: int, v: int"
        )
        got = {
            r["i"]: r["matched_value"]
            for r in quantile_match(pdf, rdf, "v").collect()
        }
        assert got == {1: 10, 2: 20, 3: 30}

    def test_grouped_and_empty_ref_group(self, spark):
        from funcify_feature_eng_spark.operators.scaling import quantile_match

        rdf = spark.createDataFrame([("a", 100), ("a", 200)], "g: string, v: int")
        pdf = spark.createDataFrame(
            [("a", 1, 150), ("b", 2, 7)], "g: string, i: int, v: int"
        )
        got = {
            r["i"]: r["matched_value"]
            for r in quantile_match(pdf, rdf, "v", group_by=["g"]).collect()
        }
        assert got[1] == 100 and got[2] is None

    def test_reserved_probe_column_rejected(self, spark):
        import pytest

        from funcify_feature_eng_spark.operators.scaling import quantile_match

        rdf = spark.createDataFrame([(10,)], "v: int")
        pdf = spark.createDataFrame([(1, 5, 9)], "i: int, v: int, __rank: int")
        # silently clobbering the caller's __rank is worse than an error
        with pytest.raises(ValueError, match="reserved"):
            quantile_match(pdf, rdf, "v")
