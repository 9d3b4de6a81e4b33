"""CorpusPipeline: declarative corpus stages == hand-composed operators.

The declarative layer must add sequencing/validation only — every stage's
output is pinned against calling the underlying operator directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.pipeline import CorpusPipeline


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        base = "alpha beta gamma delta epsilon zeta eta theta " * 3
        if i % 10 == 0:
            text = base  # exact-dup family (6 copies)
        elif i % 10 == 1:
            text = base + "extra tail words here"  # near-dup of the family
        else:
            text = f"doc {i} " + " ".join("w%d%d" % (i, j) for j in range(30))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_matches_hand_composition(spark, corpus):
    from funcify_feature_eng_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )
    from funcify_feature_eng_spark.operators.graph import (
        connected_components,
        keep_best_per_cluster,
    )

    quality = F.length("text").cast("long")
    pipe = (
        CorpusPipeline()
        .derive("q", quality)
        .exact_dedup()
        .near_dedup(quality_col="q", num_hashes=32, bands=8, shingle_k=3,
                    verify_threshold=0.5)
        .filter(F.col("doc_id") >= 0)
        .select("doc_id", "q")
    )
    got = sorted((r.doc_id, r.q) for r in pipe.run(corpus).collect())

    scored = corpus.withColumn("q", quality)
    surv = exact_dedup(scored, "doc_id", "text")
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", num_hashes=32, bands=8,
                              shingle_k=3, verify_threshold=0.5)
    comp = connected_components(pairs)
    kept = keep_best_per_cluster(surv, comp, "doc_id", "q")
    want = sorted((r.doc_id, r.q) for r in kept.select("doc_id", "q").collect())
    assert got == want
    assert 0 < len(got) < 60  # dedup actually removed rows


def test_pipeline_decontaminate_and_split(spark, corpus):
    ev = corpus.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eid"), "text"
    )
    pipe = (
        CorpusPipeline()
        .decontaminate(ev, eval_id_col="eid", k=5, min_shared=1)
        .assign_split({"train": 0.8, "val": 0.2}, resolution=10, hash=False)
    )
    out = pipe.run(corpus)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # every doc sharing 5-grams with the eval family is gone: the exact
    # copies AND the near-dups (i%10 in {0,1}); unique docs survive
    assert all(i % 10 not in (0, 1) for i in ids) and len(ids) == 48
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val"}


def test_pipeline_validation_and_describe(spark, corpus):
    with pytest.raises(ValueError, match="no stages"):
        CorpusPipeline().run(corpus)
    with pytest.raises(ValueError, match="lacks column"):
        CorpusPipeline(id_col="nope").exact_dedup().run(corpus)
    with pytest.raises(ValueError, match="quality_col"):
        CorpusPipeline().near_dedup(quality_col="")
    with pytest.raises(ValueError, match="at least one column"):
        CorpusPipeline().select()
    p = CorpusPipeline().derive("q", F.lit(1)).exact_dedup().sample(0.5)
    assert p.describe() == [
        "derive q",
        "exact dedup (min-id per text)",
        "deterministic sample 0.5",
    ]


def test_pipeline_lineage_resume(spark, corpus, tmp_path):
    """With a LineageTracker every stage checkpoints; a rerun with an
    unchanged source skips ALL stages (no new lineage records); a changed
    source invalidates stage 0 and cascades."""
    import json
    import os

    from funcify_feature_eng_spark.lineage import LineageTracker

    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    inp = spark.read.parquet(src)

    def pipe():
        return (
            CorpusPipeline()
            .derive("q", F.length("text").cast("long"))
            .exact_dedup()
            .near_dedup(quality_col="q", num_hashes=32, bands=8, shingle_k=3,
                        verify_threshold=0.5)
            .select("doc_id", "q")
        )

    base = str(tmp_path / "ck")
    tr = LineageTracker(spark, base)
    got1 = sorted((r.doc_id, r.q) for r in pipe().run(inp, tracker=tr).collect())
    lineage_file = os.path.join(base, "_lineage.jsonl")
    n1 = sum(1 for _ in open(lineage_file))
    assert n1 == 4  # one record per stage

    # identical rerun: every stage skipped -> no new records, same values
    tr2 = LineageTracker(spark, base)
    got2 = sorted((r.doc_id, r.q) for r in pipe().run(inp, tracker=tr2).collect())
    assert got2 == got1
    assert sum(1 for _ in open(lineage_file)) == n1

    # untracked run agrees with the tracked one
    got3 = sorted((r.doc_id, r.q) for r in pipe().run(inp).collect())
    assert got3 == got1

    # source change -> stage 0 fingerprint differs -> recompute cascades
    corpus.filter(F.col("doc_id") != 0).write.mode("overwrite").parquet(src)
    inp2 = spark.read.parquet(src)
    tr3 = LineageTracker(spark, base)
    got4 = sorted((r.doc_id, r.q) for r in pipe().run(inp2, tracker=tr3).collect())
    assert sum(1 for _ in open(lineage_file)) == n1 + 4
    assert got4 != got1 or 0 not in {i for i, _ in got4}


def test_pipeline_edited_stage_invalidates_checkpoint(spark, corpus, tmp_path):
    """Changing a stage parameter (filter threshold) or a side input (the
    decontamination eval set) must invalidate resume checkpoints — serving
    the old output would silently apply stale semantics."""
    import os

    from funcify_feature_eng_spark.lineage import LineageTracker

    src = str(tmp_path / "src2")
    corpus.write.parquet(src)
    inp = spark.read.parquet(src)
    base = str(tmp_path / "ck2")

    def run_with_threshold(th):
        tr = LineageTracker(spark, base)
        p = CorpusPipeline().derive("q", F.length("text").cast("long")).filter(
            F.col("q") >= th
        )
        return {r.doc_id for r in p.run(inp, tracker=tr).select("doc_id").collect()}

    a = run_with_threshold(100)
    b = run_with_threshold(10**6)  # same desc 'filter', different predicate
    assert b == set() and a != b  # stale checkpoint would have returned `a`

    # side-input change: a grown eval set must re-run decontaminate.
    # doc 2 has a UNIQUE text (only contaminates itself); doc 0 shares its
    # base 5-grams with the whole i%10∈{0,1} family — so coverage differs
    ev_small = corpus.filter(F.col("doc_id") == 2).select(
        F.col("doc_id").alias("eid"), "text"
    )
    ev_big = corpus.filter(F.col("doc_id").isin(0, 2)).select(
        F.col("doc_id").alias("eid"), "text"
    )
    base2 = str(tmp_path / "ck3")

    def run_decon(ev):
        tr = LineageTracker(spark, base2)
        p = CorpusPipeline().decontaminate(ev, eval_id_col="eid", k=5)
        return {r.doc_id for r in p.run(inp, tracker=tr).select("doc_id").collect()}

    n_small = len(run_decon(ev_small))
    n_big = len(run_decon(ev_big))
    assert n_big < n_small  # stale checkpoint would have kept n_small


def test_require_stage_passes_and_halts(spark):
    from funcify_feature_eng_spark.operators.checks import complete, unique
    from funcify_feature_eng_spark.pipeline import CorpusPipeline

    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (2, "bb")], "doc_id long, text string")
    ok = (
        CorpusPipeline()
        .require([complete("text", 1.0)])
        .exact_dedup()
        .run(df)
    )
    assert ok.count() == 2  # gate passed, dedup ran
    with pytest.raises(ValueError, match=r"unique\(doc_id\) metric=1"):
        CorpusPipeline().require([unique("doc_id")]).run(df)
