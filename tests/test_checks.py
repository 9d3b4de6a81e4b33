"""Declarative data-quality constraints (operators/checks.py)."""

import pytest

from funcify_feature_eng_spark.operators.checks import (
    check_constraints,
    check_state,
    check_verdicts,
    complete,
    isin,
    matches,
    max_at_most,
    merge_check_states,
    min_at_least,
    row_count_between,
    unique,
)


def _df(spark):
    rows = [
        (1, "view", 10.0, "a@b.co"),
        (2, "click", -5.0, None),
        (3, "view", 200.0, "x@y.io"),
        (3, "purchase", 50.0, "bad"),
        (None, "view", 1.0, "c@d.eu"),
    ]
    return spark.createDataFrame(
        rows, "id long, kind string, value double, email string"
    )


def test_constraints_single_pass_verdicts(spark):
    out = check_constraints(_df(spark), [
        complete("id", 0.8),                       # 4/5 = 800000 ppm
        complete("email", 1.0),                    # 4/5 -> fail
        unique("id"),                              # id 3 twice -> surplus 1
        min_at_least("value", 0.0),                # one negative
        max_at_most("value", 100.0),               # one above
        matches("email", r"^[^@]+@[^@]+\.[a-z]+$", 0.7),  # 3/4 non-null
        isin("kind", ["view", "click", "purchase"]),
        row_count_between(5, 10),
    ])
    rows = {r["check_id"]: r for r in out.collect()}
    assert len(rows) == 8
    assert (rows[0]["metric"], rows[0]["passed"]) == (800000, True)
    assert (rows[1]["metric"], rows[1]["passed"]) == (800000, False)
    assert (rows[2]["metric"], rows[2]["passed"]) == (1, False)
    assert (rows[3]["metric"], rows[3]["passed"]) == (1, False)
    assert (rows[4]["metric"], rows[4]["passed"]) == (1, False)
    assert (rows[5]["metric"], rows[5]["passed"]) == (750000, True)
    assert (rows[6]["metric"], rows[6]["passed"]) == (1000000, True)
    assert (rows[7]["metric"], rows[7]["passed"]) == (5, True)


def test_empty_input_is_vacuously_complete(spark):
    df = spark.createDataFrame([], "id long, kind string")
    rows = {r["check_id"]: r for r in check_constraints(df, [
        complete("kind"), unique("id"), row_count_between(1, 10),
    ]).collect()}
    assert rows[0]["passed"] is True and rows[0]["metric"] == 1000000
    assert rows[1]["passed"] is True
    assert rows[2]["passed"] is False


def test_multi_column_unique_excludes_null_bearing_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, None), (2, "b")], "x long, y string")
    rows = check_constraints(df, [unique("x", "y")]).collect()
    # (1,a) twice -> surplus 1; the (1, NULL) row is excluded
    assert rows[0]["metric"] == 1 and rows[0]["passed"] is False


_CONSTRAINTS = [
    complete("id", 0.8),
    complete("email", 1.0),
    unique("id"),
    min_at_least("value", 0.0),
    max_at_most("value", 100.0),
    matches("email", r"^[^@]+@[^@]+\.[a-z]+$", 0.7),
    isin("kind", ["view", "click", "purchase"]),
    row_count_between(5, 10),
]


def _verdict_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: t[0]
    )


def test_state_roundtrip_equals_batch(spark):
    df = _df(spark)
    batch = _verdict_rows(check_constraints(df, _CONSTRAINTS))
    inc = _verdict_rows(
        check_verdicts(check_state(df, _CONSTRAINTS), _CONSTRAINTS)
    )
    assert inc == batch


def test_merged_batch_states_equal_whole(spark):
    df = _df(spark)
    # three disjoint batches (one of them empty after the filter)
    import pyspark.sql.functions as F
    b0 = df.filter(F.coalesce(F.col("id"), F.lit(99)) % 2 == 0)
    b1 = df.filter(F.coalesce(F.col("id"), F.lit(99)) % 2 == 1)
    b2 = df.filter(F.lit(False))
    merged = merge_check_states(
        check_state(b0, _CONSTRAINTS),
        check_state(b1, _CONSTRAINTS),
        check_state(b2, _CONSTRAINTS),
    )
    inc = _verdict_rows(check_verdicts(merged, _CONSTRAINTS))
    whole = _verdict_rows(check_constraints(df, _CONSTRAINTS))
    assert inc == whole


def test_unique_verdict_on_raw_union_of_states(spark):
    """check_verdicts must verdict a raw unionByName of per-batch states
    identically to merge_check_states: a key duplicated ACROSS batches
    has one frequency row per state, and a plain row count (instead of
    count distinct) would cancel the surplus and pass a broken key."""
    from funcify_feature_eng_spark.operators.checks import unique

    cs = [unique("id")]
    b0 = spark.createDataFrame([(5,), (6,)], "id long")
    b1 = spark.createDataFrame([(5,), (7,)], "id long")  # 5 again
    raw = check_state(b0, cs).unionByName(check_state(b1, cs))
    v = check_verdicts(raw, cs).collect()[0]
    assert v["metric"] == 1 and not v["passed"]
    merged = merge_check_states(check_state(b0, cs), check_state(b1, cs))
    vm = check_verdicts(merged, cs).collect()[0]
    assert (v["metric"], v["passed"]) == (vm["metric"], vm["passed"])


def test_merge_is_associative_and_reusable(spark):
    df = _df(spark)
    import pyspark.sql.functions as F
    b0 = df.filter(F.coalesce(F.col("id"), F.lit(99)) <= 1)
    b1 = df.filter((F.coalesce(F.col("id"), F.lit(99)) > 1)
                   & (F.coalesce(F.col("id"), F.lit(99)) <= 3))
    b2 = df.filter(F.coalesce(F.col("id"), F.lit(99)) > 3)
    s0, s1, s2 = (check_state(b, _CONSTRAINTS) for b in (b0, b1, b2))
    flat = merge_check_states(s0, s1, s2)
    nested = merge_check_states(merge_check_states(s0, s1), s2)
    assert (_verdict_rows(check_verdicts(flat, _CONSTRAINTS))
            == _verdict_rows(check_verdicts(nested, _CONSTRAINTS)))
    # unique frequency rows collapse per key: surplus across batches
    # where the duplicate pair straddles a batch boundary
    dup = spark.createDataFrame([(3,)], "id long")
    s3 = check_state(dup, [unique("id")])
    s4 = check_state(dup, [unique("id")])
    v = check_verdicts(merge_check_states(s3, s4), [unique("id")]).collect()
    assert v[0]["metric"] == 1 and v[0]["passed"] is False


def test_state_of_empty_batch_yields_seed_rows(spark):
    empty = spark.createDataFrame([], "id long, kind string, value double,"
                                      " email string")
    st = check_state(empty, _CONSTRAINTS)
    assert st.count() == len(_CONSTRAINTS)  # seeds only, no freq rows
    rows = {r["check_id"]: r for r in
            check_verdicts(st, _CONSTRAINTS).collect()}
    assert rows[0]["passed"] is True        # vacuous complete
    assert rows[2]["metric"] == 0           # unique surplus 0
    assert rows[7]["passed"] is False       # row count 0 < 5


def test_incremental_errors(spark):
    with pytest.raises(ValueError, match="empty constraint"):
        check_state(_df(spark), [])
    with pytest.raises(ValueError, match="no states"):
        merge_check_states()
    with pytest.raises(ValueError, match="empty constraint"):
        check_verdicts(check_state(_df(spark), [unique("id")]), [])


def test_constraint_validation_errors(spark):
    with pytest.raises(ValueError, match="empty constraint"):
        check_constraints(_df(spark), [])
    with pytest.raises(ValueError, match="at least one column"):
        unique()
    with pytest.raises(ValueError, match="lo 5 > hi 1"):
        row_count_between(5, 1)


def test_metric_anomalies_relative_and_absolute(spark):
    from funcify_feature_eng_spark.operators.checks import (
        detect_metric_anomalies,
    )
    hist = spark.createDataFrame(
        [
            # a steady series, then a 50% jump
            (0, 0, "complete", "x", 1000000),
            (1, 0, "complete", "x", 990000),
            (2, 0, "complete", "x", 495000),
            # a series that moves off zero
            (0, 1, "unique", "id", 0),
            (1, 1, "unique", "id", 3),
        ],
        "batch_id long, check_id int, kind string, column string,"
        " metric long",
    )
    out = detect_metric_anomalies(hist, rel_max_change_ppm=200_000)
    rows = {(r["check_id"], r["batch_id"]): r for r in out.collect()}
    assert rows[(0, 0)]["anomalous"] is False          # no history
    assert rows[(0, 0)]["change_ppm"] is None
    assert rows[(0, 1)]["anomalous"] is False          # 1% change
    assert rows[(0, 1)]["change_ppm"] == 10000         # floor(10000*1e6/1000000)
    assert rows[(0, 2)]["anomalous"] is True           # 50% drop
    assert rows[(1, 1)]["anomalous"] is True           # off-zero
    assert rows[(1, 1)]["change_ppm"] is None

    out2 = detect_metric_anomalies(hist, abs_lo=500_000)
    rows2 = {(r["check_id"], r["batch_id"]): r for r in out2.collect()}
    assert rows2[(0, 2)]["anomalous"] is True
    assert rows2[(0, 1)]["anomalous"] is False
    assert rows2[(1, 0)]["anomalous"] is True          # 0 < 500000

    with pytest.raises(ValueError, match="at least one strategy"):
        detect_metric_anomalies(hist)


def test_suggest_constraints_rules_and_roundtrip(spark):
    from funcify_feature_eng_spark.operators.checks import (
        constraints_from_suggestions,
        suggest_constraints,
    )
    df = _df(spark)
    sug = suggest_constraints(df, low_card_max=3).collect()
    by = {(r["column"], r["kind"]): r for r in sug}
    # complete for every column, at the observed floor
    assert by[("id", "complete")]["observed"] == 800000
    assert by[("kind", "complete")]["observed"] == 1000000
    # id has a duplicate -> no unique; value is all-distinct -> unique
    assert ("id", "unique") not in by
    assert by[("value", "unique")]["observed"] == 5
    # kind: 3 distinct <= low_card_max -> isin with sorted compact JSON
    assert by[("kind", "isin")]["param_str"] == '["click","purchase","view"]'
    # email: 4 distinct > 3 -> no isin
    assert ("email", "isin") not in by
    # numeric bounds
    assert by[("value", "min_at_least")]["param_num"] == -5.0
    assert by[("value", "max_at_most")]["param_num"] == 200.0
    assert ("kind", "min_at_least") not in by
    # replayed suggestions all pass on the profiled frame
    cs = constraints_from_suggestions(sug)
    verdicts = check_constraints(df, cs).collect()
    assert all(r["passed"] for r in verdicts)


def test_suggest_constraints_empty_and_errors(spark):
    from funcify_feature_eng_spark.operators.checks import (
        suggest_constraints,
    )
    empty = spark.createDataFrame([], "x long, s string")
    rows = suggest_constraints(empty).collect()
    # vacuous complete only: no unique/isin/bounds on nothing
    assert {(r["column"], r["kind"]) for r in rows} == {
        ("x", "complete"), ("s", "complete")}
    assert all(r["observed"] == 1000000 for r in rows)
    with pytest.raises(ValueError, match="unknown column"):
        suggest_constraints(empty, columns=["nope"])
    with pytest.raises(ValueError, match="low_card_max"):
        suggest_constraints(empty, low_card_max=0)


def test_referential_integrity_orphans_and_nulls(spark):
    from funcify_feature_eng_spark.operators.checks import (
        referential_integrity,
    )
    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (None, "d")], "fk long, x string")
    parent = spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "pk long")  # dup parent keys collapse
    out = referential_integrity(
        child, parent, on=[("fk", "pk")], relation="c->p").collect()[0]
    assert out["relation"] == "c->p"
    assert out["n_child"] == 4
    assert out["n_checked"] == 3      # NULL fk excluded
    assert out["n_orphans"] == 1      # fk 9
    assert out["ok"] is False
    # shared-name form, fully contained
    child2 = spark.createDataFrame([(1,), (2,)], "pk long")
    ok = referential_integrity(child2, parent, on=["pk"]).collect()[0]
    assert ok["n_orphans"] == 0 and ok["ok"] is True
    import pytest as _pt
    with _pt.raises(ValueError, match="empty key list"):
        referential_integrity(child, parent, on=[])


def test_column_profile_exact(spark):
    from funcify_feature_eng_spark.operators.checks import column_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id int, s string"
    )
    rows = {r["column"]: r for r in column_profile(df).collect()}
    assert set(rows) == {"id", "s"}
    assert (rows["id"]["n_rows"], rows["id"]["n_nonnull"],
            rows["id"]["n_distinct"], rows["id"]["null_ppm"]) == (3, 3, 3, 0)
    # 1 NULL of 3 rows -> floor(1e6/3)
    assert (rows["s"]["n_nonnull"], rows["s"]["n_distinct"],
            rows["s"]["null_ppm"]) == (2, 2, 333_333)


def test_column_profile_empty_and_unknown(spark):
    import pytest

    from funcify_feature_eng_spark.operators.checks import column_profile

    df = spark.createDataFrame([], "id int")
    [r] = column_profile(df).collect()
    assert (r["n_rows"], r["n_nonnull"], r["n_distinct"], r["null_ppm"]) == (
        0, 0, 0, 0,
    )
    with pytest.raises(ValueError, match="unknown column"):
        column_profile(df, columns=["nope"])


def test_profile_drift_added_dropped_kept(spark):
    from funcify_feature_eng_spark.operators.checks import (
        column_profile,
        profile_drift,
    )

    base = spark.createDataFrame([(1, "x"), (2, None), (3, "y")], "id int, s string")
    cur = spark.createDataFrame(
        [(1, "p"), (1, "q"), (None, "p"), (4, None)], "id int, t string"
    )
    rows = {
        r["column"]: r
        for r in profile_drift(column_profile(base), column_profile(cur)).collect()
    }
    assert rows["s"]["status"] == "dropped" and rows["t"]["status"] == "added"
    kept = rows["id"]
    assert kept["status"] == "kept"
    assert kept["null_ppm_base"] == 0 and kept["null_ppm_cur"] == 250_000
    assert kept["null_ppm_delta"] == 250_000
    # distinct 3 -> 2: floor(2e6/3)
    assert kept["distinct_ratio_ppm"] == 666_666
    # added/dropped rows carry NULL deltas
    assert rows["t"]["null_ppm_delta"] is None
    assert rows["s"]["distinct_ratio_ppm"] is None


class TestBenfordAudit:
    def test_exact_counts_and_ppm(self, spark):
        from funcify_feature_eng_spark.operators.checks import (
            BENFORD_FIRST_DIGIT_PPM,
            benford_audit,
        )

        # crafted: 6x values starting with 1, 3x with 2, 1x with 9;
        # zero, negative and NULL excluded
        vals = [1.23, 10.0, 199.99, 0.15, 0.0012, 1000.0,
                2.5, 0.29, 25.0, 9.99, 0.0, -5.0, None]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        rows = {r["digit"]: r for r in benford_audit(df, "v", scale=4).collect()}
        assert rows[1]["n"] == 6 and rows[2]["n"] == 3 and rows[9]["n"] == 1
        assert all(r["n_total"] == 10 for r in rows.values())
        assert rows[1]["observed_ppm"] == 600_000
        assert rows[1]["expected_ppm"] == BENFORD_FIRST_DIGIT_PPM[1]
        assert rows[9]["delta_ppm"] == 100_000 - BENFORD_FIRST_DIGIT_PPM[9]

    def test_grouped(self, spark):
        from funcify_feature_eng_spark.operators.checks import benford_audit

        df = spark.createDataFrame(
            [("x", 1.0), ("x", 12.0), ("y", 9.0)], ["g", "v"]
        )
        rows = {(r["g"], r["digit"]): (r["n"], r["n_total"])
                for r in benford_audit(df, "v", group_by=["g"]).collect()}
        assert rows[("x", 1)] == (2, 2) and rows[("y", 9)] == (1, 1)
