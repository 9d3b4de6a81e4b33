"""Dedup, similarity, multimodal plumbing, and source reshaping tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    line_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from funcify_feature_eng_spark.operators.multimodal import (
    attach_fake_media,
    extract_media_features,
    resize_stub,
)
from funcify_feature_eng_spark.operators.similarity import (
    all_pairs_topk,
    ann_lsh_topk,
    cosine_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    assert list(out["doc_id"]) == [1, 3, 4, 5]
    groups = exact_dup_groups(docs, "doc_id", "text").orderBy("keep_id").toPandas()
    assert groups.loc[groups["keep_id"] == 1, "n_copies"].iloc[0] == 2


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (1, 2) in got  # exact dup → jaccard 1.0
    assert (1, 3) in got and (2, 3) in got  # near dup
    assert not any(4 in p for p in got)


def test_ngram_hot_gram_cap(spark):
    """A corpus-wide boilerplate chunk must not build an m² candidate block.

    40 docs share one boilerplate chunk; their unique fillers share nothing.
    Uncapped, every pair co-occurs on the hot grams (780 pairs at a tiny
    threshold). Capped, those grams are barred from candidate generation →
    0 pairs. Two planted docs that ALSO share a discriminative chunk still
    pair, with jaccard EXACTLY equal to the uncapped value (hot grams are
    added back in verification)."""
    boiler = "subscribe to our newsletter for updates "
    rows = []
    for i in range(40):
        # boiler FIRST, then a filler whose every 5-gram carries the doc
        # number → the only cross-doc grams are the boiler's (df=42) and
        # the boundary grams keyed by the leading digit (df≈10); with
        # cap=5 both are hot, so no cold gram links two filler docs
        filler = f"<{i:02d}>" * 10
        rows.append((i, boiler + filler))
    # planted near-dup pair sharing a private chunk (gram df = 2, sub-cap)
    private = "zzz the rare shared private payload qqq"
    rows.append((100, boiler + private))
    rows.append((101, boiler + private + "x"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", n=5, threshold=0.01,
                                   max_gram_df=None).toPandas()
    capped = ngram_jaccard_pairs(df, "doc_id", "text", n=5, threshold=0.01,
                                 max_gram_df=5).toPandas()
    assert len(uncapped) == 41 * 42 // 2  # every pair shares the boilerplate
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.itertuples()}
    assert set(got) == {(100, 101)}  # boilerplate-only pairs gone
    un = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped.itertuples()}
    assert got[(100, 101)] == un[(100, 101)]  # exact, hot grams included


def test_ngram_cap_inactive_below_df(spark, docs):
    """Default cap (1000) cannot trigger on small corpora — identical output."""
    a = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5).toPandas()
    b = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5,
                            max_gram_df=None).toPandas()
    key = ["doc_a", "doc_b"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=32, verify_threshold=0.4
    ).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (1, 2) in got
    assert pairs.set_index(["doc_a", "doc_b"]).loc[(1, 2), "jaccard"] == 1.0


def test_simhash_exact_dup_identical_hash(spark, docs):
    sh = simhash64(docs.filter("doc_id in (1,2,4)"), "doc_id", "text").toPandas()
    h = sh.set_index("doc")["simhash"]
    assert h[1] == h[2]
    assert h[1] != h[4]
    pairs = simhash_near_pairs(docs.filter("text != ''"), "doc_id", "text", max_hamming=10).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (1, 2) in got


def test_cosine_topk_exact(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [-1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=2).toPandas()
    assert list(out["vec_id"]) == [1, 2]
    assert out["cos_sim"][0] > 0.99


def test_ann_lsh_quality(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id = 0").head()["embedding"]
    exact = cosine_topk(emb.filter("vec_id != 0"), q, k=1).toPandas()
    approx = ann_lsh_topk(
        emb.filter("vec_id != 0"), q, k=10, n_planes=10, max_probe_hamming=4
    ).toPandas()
    # LSH is approximate: require the probed best to be within a small
    # cosine margin of the exact best (the recall-quality contract), and
    # deterministic across runs (seeded hyperplanes)
    assert len(approx) > 0
    assert approx["cos_sim"][0] >= exact["cos_sim"][0] - 0.05
    again = ann_lsh_topk(
        emb.filter("vec_id != 0"), q, k=10, n_planes=10, max_probe_hamming=4
    ).toPandas()
    assert list(again["vec_id"]) == list(approx["vec_id"])


def test_ivf_topk_quality_and_determinism(spark, sf_dir):
    from funcify_feature_eng_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        make_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = make_ivf_centroids(emb, n_clusters=8, lloyd_iters=1)
    assert len(cents) == 8 and len(cents[0]) == 64
    # deterministic: same seed → same centroids
    cents2 = make_ivf_centroids(emb, n_clusters=8, lloyd_iters=1)
    assert cents == cents2
    # every vector gets a cluster in range
    assigned = ivf_assign(emb, cents)
    assert assigned.filter("ivf_cluster < 0 or ivf_cluster > 7").count() == 0
    q = emb.filter("vec_id = 0").head()["embedding"]
    exact = cosine_topk(emb.filter("vec_id != 0"), q, k=1).toPandas()
    approx = ivf_topk(emb.filter("vec_id != 0"), q, cents, k=10, n_probes=3).toPandas()
    assert len(approx) > 0
    # probing 3/8 clusters must land within a small margin of the exact best
    assert approx["cos_sim"][0] >= exact["cos_sim"][0] - 0.05


def test_all_pairs_topk_shape(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = all_pairs_topk(df, k=2).toPandas()
    assert len(out) == 12  # 6 rows x top-2
    assert (out.groupby("id_a").size() == 2).all()


def test_all_pairs_topk_rejects_large_input(spark):
    import pytest as _pytest

    rows = [(i, [float(i), 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="ann_lsh_topk"):
        all_pairs_topk(df, k=2, max_rows=5)
    # opt-out still works on the same frame
    assert all_pairs_topk(df, k=1, max_rows=None).count() == 8


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_media(docs.filter("doc_id <= 3"), "doc_id")
    feats = extract_media_features(media, batch_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert list(feats.columns) == ["doc_id", "kind", "mean_intensity", "std_intensity", "n_bytes"]
    assert (feats["kind"] == "image").all()
    assert len(feats) == 3
    assert (feats["n_bytes"] == 64).all()  # sha2-256 hex payload (64 ascii bytes)
    assert feats["mean_intensity"].between(0, 1).all()
    # determinism: same id → same features
    again = extract_media_features(media, batch_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert np.allclose(feats["mean_intensity"], again["mean_intensity"])


def test_resize_stub_raises(spark, docs):
    with pytest.raises(NotImplementedError, match="image library"):
        resize_stub(docs, 32, 32)


def test_unregistered_kind_raises(spark, docs):
    # "video" gained a default decoder; pointcloud stays unregistered
    media = attach_fake_media(docs.limit(1), "doc_id", kind="pointcloud")
    with pytest.raises(Exception, match="no decoder registered"):
        extract_media_features(media, batch_cols=("doc_id",)).collect()


def test_netflix_reshaping(spark, tmp_path):
    from funcify_feature_eng_spark.sources.tables import read_netflix_csv

    csv = tmp_path / "shows.csv"
    csv.write_text(
        "show_id,type,title,director,cast,country,date_added,release_year,rating,duration,listed_in,description\n"
        's1,Movie,T1,Dir A,"Actor A, Actor B",US,"June 9, 2023",2001,PG,90 min,"Drama, Comedy",d1\n'
        's2,TV Show,T2,,"Actor C",US,"January 1, 2020",1899,TV-MA,2 Seasons,Drama,d2\n'
    )
    df = read_netflix_csv(spark, str(csv)).orderBy("show_id").toPandas()
    assert list(df.loc[0, "cast"]) == ["Actor A", "Actor B"]
    assert df.loc[0, "duration_min"] == 90 and pd.isna(df.loc[0, "num_seasons"])
    assert df.loc[1, "num_seasons"] == 2 and pd.isna(df.loc[1, "duration_min"])
    assert df.loc[0, "release_year"] == 2001
    assert str(df.loc[0, "date_added"]) == "2023-06-09"


def test_multimodal_audio_kind_dispatch(spark, docs):
    """Per-row kind dispatch: image and audio rows in ONE batch route to
    different decoders whose outputs provably differ."""
    from pyspark.sql import functions as F
    from funcify_feature_eng_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
    )

    kind = F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio"))
    media = attach_fake_media(docs.filter("doc_id <= 6"), "doc_id", kind=kind)
    feats = extract_media_features(media, batch_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert all(
        k == ("image" if i % 2 == 0 else "audio")
        for i, k in zip(feats["doc_id"], feats["kind"])
    )
    # the audio transform ((3b) mod 256) changes the moments for the same payload
    img = attach_fake_media(docs.filter("doc_id <= 6"), "doc_id", kind="image")
    all_img = extract_media_features(img, batch_cols=("doc_id",)).orderBy("doc_id").toPandas()
    audio_rows = feats[feats["kind"] == "audio"].reset_index(drop=True)
    img_same_ids = all_img[all_img["doc_id"] % 2 == 1].reset_index(drop=True)
    assert (audio_rows["mean_intensity"] != img_same_ids["mean_intensity"]).any()
    assert (feats["n_bytes"] == 64).all()


def test_line_dedup_first_occurrence_wins(spark):
    # boilerplate "B" appears in all three docs; "A" twice inside doc 1;
    # doc order (id, position) decides who keeps each line
    rows = [
        (1, "A\nB\nA\nX"),
        (2, "B\nY"),
        (3, "Y\nB\nZ"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text"] == "A\nB\nX" and out[1]["n_dropped"] == 1
    assert out[2]["text"] == "Y" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "Z" and out[3]["n_dropped"] == 2
    assert all(out[i]["n_lines"] == len(rows[i - 1][1].split("\n")) for i in out)


def test_line_dedup_all_lines_dropped_yields_empty_text(spark):
    df = spark.createDataFrame([(1, "B\nB"), (2, "B")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text"] == "B" and out[1]["n_dropped"] == 1
    assert out[2]["text"] == "" and out[2]["n_dropped"] == 1


def test_line_dedup_null_text_passthrough_and_literal_sep(spark):
    df = spark.createDataFrame(
        [(1, "A|B"), (2, None), (3, "B|C")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text", sep="|").collect()}
    # NULL doc survives untouched (a dedup pass must never drop documents)
    assert out[2]["text"] is None and out[2]["n_lines"] == 0
    # '|' is treated literally, not as regex alternation
    assert out[1]["text"] == "A|B" and out[3]["text"] == "C" and out[3]["n_dropped"] == 1


def test_pii_counts_email_digits_not_phone(spark):
    from funcify_feature_eng_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [(1, "contact user123456789@example.com now")], "i long, t string"
    )
    ne, ns, np_ = pii_counts(F.col("t"))
    row = df.select(
        pii_redact(F.col("t")).alias("clean"), ne.alias("e"), ns.alias("s"), np_.alias("p")
    ).head()
    # the digit run inside the email is an EMAIL, not a phone — the audit
    # counts must agree with what pii_redact actually masks
    assert row["clean"] == "contact <EMAIL> now"
    assert (row["e"], row["s"], row["p"]) == (1, 0, 0)


def test_deterministic_shuffle_dense_and_stable(spark):
    from funcify_feature_eng_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = deterministic_shuffle(df, "doc_id", seed=3).select("doc_id", "pos").toPandas()
    # dense permutation 0..n-1
    assert sorted(a["pos"]) == list(range(1000))
    # stable across reruns AND across a different partition count
    b = deterministic_shuffle(df.repartition(7), "doc_id", seed=3,
                              n_partitions=3).select("doc_id", "pos").toPandas()
    assert a.sort_values("doc_id")["pos"].tolist() == b.sort_values("doc_id")["pos"].tolist()
    # seed changes the permutation
    c = deterministic_shuffle(df, "doc_id", seed=4).select("doc_id", "pos").toPandas()
    assert a.sort_values("doc_id")["pos"].tolist() != c.sort_values("doc_id")["pos"].tolist()
    # and it actually breaks locality: positions of consecutive ids are far apart
    byid = a.sort_values("doc_id")["pos"].to_numpy()
    import numpy as np

    assert np.abs(np.diff(byid)).mean() > 100


def test_interleave_by_ratio_rates(spark):
    from funcify_feature_eng_spark.operators.sampling import interleave_by_ratio

    rows = [(i, "a" if i % 4 != 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_by_ratio(df, "source", {"a": 0.75, "b": 0.25}, "doc_id")
    pdf = out.orderBy("mix_pos").toPandas()
    # in any prefix of the schedule, source rates track the weights
    head = pdf.head(100)["source"].value_counts()
    assert 70 <= head.get("a", 0) <= 80
    assert 20 <= head.get("b", 0) <= 30
    # unlisted source → NULL mix_pos
    df2 = spark.createDataFrame([(1, "zzz")], "doc_id long, source string")
    out2 = interleave_by_ratio(df2, "source", {"a": 1.0}, "doc_id").toPandas()
    assert out2["mix_pos"].isna().all()


def test_int8_quantized_topk_recall(spark, sf_dir):
    """int8 quantization must preserve top-k ranking closely: >= 8/10
    overlap with the exact float cosine top-10, and the quantized arrays
    must actually be int8-range."""
    from funcify_feature_eng_spark.operators.similarity import (
        cosine_topk_int8,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = cosine_topk(emb.filter("vec_id != 0"), q, k=10).toPandas()
    quant = cosine_topk_int8(emb.filter("vec_id != 0"), q, k=10).toPandas()
    overlap = len(set(exact["vec_id"]) & set(quant["vec_id"]))
    assert overlap >= 8, f"quantized top-10 overlap {overlap}/10"
    qdf = quantize_embeddings(emb).select("q_embedding").head(5)
    for r in qdf:
        assert all(-128 <= v <= 127 for v in r["q_embedding"])


def test_video_frame_sampling(spark):
    from funcify_feature_eng_spark.operators.multimodal import (
        attach_fake_media,
        sample_video_frames,
    )

    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    media = attach_fake_media(docs, "doc_id", kind="video", n_frames=6)
    out = sample_video_frames(media, every_k=3).toPandas()
    # frames 0 and 3 sampled for each of 5 docs
    assert sorted(out["frame_idx"].unique()) == [0, 3]
    assert len(out) == 10 and (out["n_frames"] == 6).all()
    # frame transform is index-dependent: different frames, different means
    by_doc = out.groupby("doc_id")["frame_mean"].nunique()
    assert (by_doc == 2).all()
    # non-video kinds are rejected loudly (2-D arrays)
    img = attach_fake_media(docs, "doc_id", kind="image")
    import pytest as _pytest

    with _pytest.raises(Exception, match="frames, h, w"):
        sample_video_frames(img, every_k=2).collect()


def test_semantic_dedup_planted_duplicates(spark):
    """SemDeDup (similarity.semantic_dedup): planted near-identical vectors
    in the same coarse cluster collapse to the smallest id; cross-cluster
    near-identical vectors are NOT compared (the published recipe's scoping
    rule — pair work is per-cluster only)."""
    from funcify_feature_eng_spark.operators.similarity import semantic_dedup

    centroids = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [10.0, 0.1]),    # cluster 0
        (2, [10.0, 0.1001]), # cluster 0, near-dup of 1 -> dropped
        (3, [9.0, 0.5]),     # cluster 0, distinct enough at 0.9999 grid? keep threshold high
        (4, [0.1, 10.0]),    # cluster 1
        (5, [0.1001, 10.0]), # cluster 1, near-dup of 4 -> dropped
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id int, embedding array<float>",
    )
    kept = semantic_dedup(
        df, centroids, threshold_grid=9999, grid=10000.0
    )
    got = {r["vec_id"]: r["sem_cluster"] for r in kept.collect()}
    assert sorted(got) == [1, 3, 4]
    assert got[1] == 0 and got[3] == 0 and got[4] == 1

    # determinism: same input twice -> same kept set
    again = {r["vec_id"] for r in semantic_dedup(
        df, centroids, threshold_grid=9999).collect()}
    assert again == {1, 3, 4}

    # scoping: move 5 next to cluster-0's members in ANGLE but keep it in
    # cluster 1 by construction impossible — instead verify the pair join
    # never crosses clusters: with a threshold of 0 (everything in-cluster
    # is a dup witness), survivors are exactly the min id per cluster
    allpairs = semantic_dedup(df, centroids, threshold_grid=-10000)
    assert {r["vec_id"] for r in allpairs.collect()} == {1, 4}


def test_incremental_exact_dedup_matches_one_pass(spark):
    """incremental_exact_dedup: batch-2 rows duplicating batch-1 texts drop
    via the fingerprint store; within-batch dups keep the min id; the
    chained result equals one whole-corpus exact_dedup pass when ids are
    ordered by batch."""
    from funcify_feature_eng_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    rows = [
        (1, "alpha text"),
        (2, "beta text"),
        (3, "alpha text"),      # in-batch dup of 1 -> dropped
        (10, "beta  text"),     # cross-batch dup of 2 (ws-normalized) -> dropped
        (11, "gamma text"),
        (12, "GAMMA TEXT"),     # in-batch dup of 11 (case-normalized) -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = df.filter("doc_id <= 3")
    b2 = df.filter("doc_id > 3")
    kept1, fps1 = incremental_exact_dedup(b1, None, "doc_id", "text")
    kept2, fps2 = incremental_exact_dedup(b2, fps1, "doc_id", "text")
    got = sorted(r["doc_id"] for r in kept1.union(kept2).collect())
    assert got == [1, 2, 11]
    # equivalence with the one-pass operator
    one_pass = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert got == one_pass
    # the appended fingerprint set carries ONLY batch 2's NOVEL texts
    # (beta is already in the store; re-appending it would grow the store
    # per-batch instead of per-global-distinct)
    assert fps2.count() == 1  # gamma-normalized only
