"""Tests for snapshot-incremental MinHash near-dup (operators/dedup.py)."""


# ------------------------------------------- incremental MinHash near-dup


def _near_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before nightfall comes down")
    variant = base.replace("green", "drak")  # near-dup of base
    other = ("completely different text about spark shuffles partitions "
             "and adaptive query execution with broadcast joins at scale")
    rows = [
        (1, base), (2, base),          # exact dups (batch 1)
        (3, other),                    # unique (batch 1)
        (11, variant),                 # near-dup of 1 (batch 2)
        (12, other),                   # exact dup of 3 across batches (batch 2)
        (13, "tiny"), (14, None),      # short + NULL text (batch 2)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_incremental_minhash_two_batches(spark):
    from funcify_feature_eng_spark.operators.dedup import incremental_minhash_dedup

    docs = _near_docs(spark)
    b1 = docs.where("doc_id < 10")
    b2 = docs.where("doc_id >= 10")
    kept1, store1 = incremental_minhash_dedup(b1, None, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 3]
    kept2, store2 = incremental_minhash_dedup(b2, store1, "doc_id", "text")
    # 11 near-dups 1 via the store; 12 exact-dups 3 via identical sig;
    # 13 survives (one-shingle text, no witness); 14 NULL text always kept
    assert sorted(r["doc_id"] for r in kept2.collect()) == [13, 14]
    # store rows carry ALL reps (kept + dropped); NULL text signs to a
    # constant signature so future NULL-text docs dedup against 14
    assert sorted(r["doc"] for r in store2.collect()) == [11, 12, 13, 14]


def test_incremental_minhash_equals_single_pass(spark):
    from funcify_feature_eng_spark.operators.dedup import incremental_minhash_dedup

    docs = _near_docs(spark)
    kept_all, _ = incremental_minhash_dedup(docs, None, "doc_id", "text")
    single = sorted(r["doc_id"] for r in kept_all.collect())

    b1 = docs.where("doc_id < 10")
    b2 = docs.where("doc_id >= 10")
    kept1, store1 = incremental_minhash_dedup(b1, None, "doc_id", "text")
    kept2, _ = incremental_minhash_dedup(b2, store1, "doc_id", "text")
    chained = sorted(
        [r["doc_id"] for r in kept1.collect()]
        + [r["doc_id"] for r in kept2.collect()]
    )
    assert chained == single


def test_incremental_minhash_store_is_compact(spark):
    from funcify_feature_eng_spark.operators.dedup import incremental_minhash_dedup

    docs = _near_docs(spark).where("doc_id < 10")
    _, store = incremental_minhash_dedup(docs, None, "doc_id", "text")
    assert store.columns == ["doc", "sig"]
    rows = store.collect()
    assert all(len(r["sig"]) == 64 for r in rows)
