"""MinHash-LSH RECALL ground truth — the quality axis the fixture oracles
cannot see.

The driver-gate oracle for ``minhash_lsh_pairs`` is an independent
re-implementation of the same pipeline (same banding, cap, pre-filter), so it
proves implementation equivalence but would stay green if the band/row
parameters were mistuned to miss half the true near-dups. This test pins
retrieval quality against brute-force exact Jaccard on a planted-near-dup
corpus: with the gate's production parameters (64 hashes × 16 bands of 4,
verify 0.5), the banding-theory hit probability at J=0.7 is
1-(1-0.7^4)^16 ≈ 0.988, so recall ≥ 0.95 over J≥0.7 truth pairs is the
contract — and the skew guards (bucket cap, signature pre-filter) must cost
< 5% recall vs the unguarded pipeline.

Reference anchor for the exact-expected-value testing style:
jq/src/test/.../JqTransformerYamlTest.kt:32-105.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from funcify_feature_eng_spark.operators.dedup import minhash_lsh_pairs
from scripts.make_fixtures import _shingles

GATE_PARAMS = dict(num_hashes=64, bands=16, shingle_k=3, verify_threshold=0.5)


def _corpus(seed: int = 42) -> list[tuple[int, str]]:
    """~200 docs: 55 bases × (1 original + 2 variants with 1–8% token
    substitutions) + 40 unrelated docs. Deterministic. For 3-shingles a
    substitution rate s gives J ≈ (1-s)³ / (2-(1-s)³), so s ≤ ~6% keeps
    pairs at or above the J=0.7 truth threshold — the planted range spans
    both sides of it."""
    rng = random.Random(seed)
    vocab = [f"w{i:03d}" for i in range(500)]
    docs: list[tuple[int, str]] = []
    nid = 0
    for _ in range(55):
        n = rng.randint(30, 60)
        base = [rng.choice(vocab) for _ in range(n)]
        docs.append((nid, " ".join(base)))
        nid += 1
        for _ in range(2):
            var = list(base)
            k = max(1, int(len(var) * rng.uniform(0.01, 0.08)))
            for pos in rng.sample(range(len(var)), k):
                var[pos] = rng.choice(vocab)
            docs.append((nid, " ".join(var)))
            nid += 1
    for _ in range(40):
        n = rng.randint(30, 60)
        docs.append((nid, " ".join(rng.choice(vocab) for _ in range(n))))
        nid += 1
    return docs


def _truth_pairs(docs: list[tuple[int, str]], j_min: float) -> set[tuple[int, int]]:
    """Brute-force exact 3-shingle Jaccard over ALL pairs (Java-exact
    tokenization via scripts.make_fixtures._shingles, the same semantics the
    engine's shingles() implements)."""
    sets = {i: set(_shingles(t, GATE_PARAMS["shingle_k"])) for i, t in docs}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= j_min:
                out.add((a, b))
    return out


def _recall(found: set[tuple[int, int]], truth: set[tuple[int, int]]) -> float:
    return len(found & truth) / len(truth)


def test_lsh_recall_against_brute_force(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    truth = _truth_pairs(docs, j_min=0.7)
    assert len(truth) >= 30, f"corpus must plant enough truth pairs, got {len(truth)}"

    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", **GATE_PARAMS).collect()
    }
    rec = _recall(found, truth)
    assert rec >= 0.95, f"LSH recall {rec:.3f} < 0.95 over {len(truth)} J>=0.7 pairs"

    # skew guards (bucket cap + signature-agreement pre-filter) must be
    # nearly free: disabling both may improve recall by < 5 points
    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", bucket_cap=0, prefilter_margin=0.5, **GATE_PARAMS
        ).collect()
    }
    rec_unguarded = _recall(unguarded, truth)
    assert rec_unguarded - rec < 0.05, (
        f"guards cost {rec_unguarded - rec:.3f} recall "
        f"(guarded {rec:.3f} vs unguarded {rec_unguarded:.3f})"
    )


def test_lsh_no_false_positives_below_verify_threshold(spark):
    """The exact-verify stage guarantees precision: every reported pair's
    true Jaccard is >= verify_threshold (modulo the 1e-6 round)."""
    docs = _corpus(seed=7)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = {i: set(_shingles(t, GATE_PARAMS["shingle_k"])) for i, t in docs}
    for r in minhash_lsh_pairs(df, "doc_id", "text", **GATE_PARAMS).collect():
        a, b = r["doc_a"], r["doc_b"]
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert j >= GATE_PARAMS["verify_threshold"] - 1e-6, (a, b, j)
