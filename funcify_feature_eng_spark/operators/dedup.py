"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data-pipeline extensions over the ``documents`` table.

All shuffle-conscious: exact dedup is one hash aggregation on a 64-bit
fingerprint (never on the full text — at 100 TB the shuffle carries 8 bytes
per doc, not the document); MinHash banding turns all-pairs O(n²) into
per-bucket candidate generation; candidate pairs are verified with exact
Jaccard before being reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.text import char_ngrams, fingerprint64, shingles
from funcify_feature_eng_spark.operators.util import (
    materialize_small,
    release,
    spread_small_input,
)


def _ordered_pairs(col):
    """Every (a, b), a < b pair from a SORTED distinct array column, as
    ``struct(doc_a, doc_b)`` — pure JVM HOF expansion (element k pairs
    with every later element), replacing a row-level self-join. The
    caller bounds the array size (bucket/group caps), so the quadratic
    expansion is bounded too."""
    c = F.col(col) if isinstance(col, str) else col
    return F.flatten(
        F.transform(
            c,
            lambda x, k: F.transform(
                F.slice(c, k + F.lit(2), F.size(c)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: (keep_id = min id, n_copies).

    Groups on the raw text (exact semantics); at scale swap the key for
    ``fingerprint64(text)`` so the shuffle carries 8-byte keys — provided
    collisions are acceptable (2^-64 per pair).
    """
    return df.groupBy(F.col(text_col)).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per fingerprint — the scalable exact dedup.

    row_number over (fingerprint) avoids carrying text through the shuffle
    twice; output is the surviving rows with original columns.
    """
    w = Window.partitionBy(fingerprint64(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (doc_a < doc_b).

    Inverted-index join: explode distinct n-grams, self-join on the n-gram,
    count co-occurrences, then |A∪B| = |A|+|B|−|A∩B|. The join key is the
    64-bit hash of the n-gram, not the string.

    **Hot-gram cap** (``max_gram_df``): a gram shared by m documents builds
    an m² co-occurrence block in the self-join — one corpus-wide boilerplate
    5-gram ("Subscribe to our newsletter…") at 100 TB is a quadratic
    scale-killer. Grams with document frequency > ``max_gram_df`` are
    excluded from CANDIDATE GENERATION (the self-join), bounding any one
    gram's block at max_gram_df². Candidate pairs are then re-verified
    against the FULL gram sets (hot grams included) so every reported
    Jaccard is exact. The only semantic delta: a pair sharing *exclusively*
    hot grams is not reported — at threshold ≥ 0.8 such a pair is
    boilerplate-identical and belongs to exact/minhash dedup anyway.
    ``max_gram_df=None`` disables the cap (pure exact mode). For corpora
    where even capped exact counting is too wide, use minhash_lsh.
    """
    grams = (
        spread_small_input(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias("g"),
        )
        .select("doc", F.xxhash64("g").alias("gh"))
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    if max_gram_df is None:
        co = (
            grams.alias("a")
            .join(grams.alias("b"), on="gh")
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    else:
        gram_df = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("gdf"))
        hot = gram_df.filter(F.col("gdf") > max_gram_df).select("gh")
        cold = grams.join(hot, "gh", "left_anti")
        cold_co = (
            cold.alias("a")
            .join(cold.alias("b"), on="gh")
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("shared_cold"))
        )
        # exact re-verification: add back hot grams SHARED by each candidate
        # pair; hotg rows are only the hot-gram postings, and each join is an
        # equi-join on the bounded candidate set — no quadratic block
        hotg = grams.join(hot, "gh")
        hot_co = (
            cold_co.select("doc_a", "doc_b")
            .join(hotg.select(F.col("doc").alias("doc_a"), "gh"), "doc_a")
            .join(hotg.select(F.col("doc").alias("doc_b"), "gh"), ["doc_b", "gh"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("shared_hot"))
        )
        co = (
            cold_co.join(hot_co, ["doc_a", "doc_b"], "left")
            .select(
                "doc_a",
                "doc_b",
                (F.col("shared_cold") + F.coalesce(F.col("shared_hot"), F.lit(0))).alias("shared"),
            )
        )
    out = (
        co.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            # int/int division — bit-identical across engines (oracle-safe)
            "jaccard",
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _minhash_sig_expr(sh, num_hashes: int):
    """MinHash signature as one ``array<long>`` expression over a shingle
    array — ZERO shuffle, and each shingle is STRING-hashed exactly once.

    Per shingle compute a = xxhash64(s) ONCE (the only string hash), then
    slot i re-keys the LONG: h_i(s) = xxhash64(a, i) — the 8-byte XXH64
    path, a few ns versus re-hashing a multi-word string. sig[i] = min over
    shingles of h_i.

    Expression SHAPE matters as much as hash count: higher-order-function
    lambdas inline their free subexpressions, so the naive nested form
    ``transform(sequence(0,63), i -> array_min(transform(hs, h -> ...)))``
    re-evaluates ``hs`` — the whole shingling + string-hash pipeline — once
    PER SLOT (measured 64×: 265 s vs 4.6 s for one hashing pass over sf0.1
    on one core). Restructured as a single ``aggregate`` fold over ``hs``
    the input array is evaluated once and each step does 64 long-hash +
    ``least`` updates. The accumulator starts as all-NULL longs because
    ``least`` skips NULLs, which also reproduces array_min's NULL result
    for shingle-less (empty/short) texts.

    (The classic constant-factor alternative is Kirsch–Mitzenmacher
    a + i·b double hashing, but wrapping long arithmetic is unavailable
    under ANSI mode; hashing the long keeps full pairwise independence
    anyway.) Retrieval quality is pinned empirically by
    tests/test_lsh_recall.py (recall ≥ 0.95 at J ≥ 0.7)."""
    hs = F.transform(sh, lambda s: F.xxhash64(s))
    return F.aggregate(
        hs,
        F.array_repeat(F.lit(None).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda a, i: F.least(a, F.xxhash64(h, i)),
        ),
    )


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures as one ``array<long>`` column — a pure map stage
    (no explode, no groupBy) built on double hashing (see _minhash_sig_expr)."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))
    return df.select(
        F.col(id_col).alias("doc"), _minhash_sig_expr(sh, num_hashes).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float = 0.7,
    bucket_cap: int = 64,
    prefilter_margin: float = 0.25,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, engineered for web-corpus skew.

    NB (API behavior): the returned pair list is EAGERLY computed at call
    time — it is localCheckpoint-materialized so the heavyweight persisted
    base can be released before returning. The checkpointed result itself
    occupies (small) executor storage until the caller drops it: call
    ``funcify_feature_eng_spark.operators.util.release(pairs)`` when done
    in a long-lived session.

    Pipeline (each guard exists because web corpora are full of boilerplate):

    1. **Exact-dup collapse** — group docs by ``fingerprint64(text)``; only
       one representative per distinct text enters LSH. Identical docs are
       the #1 source of quadratic LSH buckets and they don't need MinHash
       at all. Pairs are re-expanded afterwards (within-group pairs are
       jaccard 1.0 by construction).
    2. **Zero-shuffle signatures** — per-row array expression (see
       minhash_signature); the signature+gram base is persisted once and
       reused by the banding and both verify branches, so the plan never
       recomputes the hash pipeline per join branch.
    3. **Bucket cap** — (band, bandsig) buckets larger than ``bucket_cap``
       distinct texts are dropped from candidate generation (a bucket of m
       docs is m² candidates; oversized buckets on DISTINCT texts are
       hash-collision noise or pathological boilerplate, both better served
       by the exact-dup path). Set ``bucket_cap=0`` to disable.
    4. **Signature-agreement pre-filter** — candidates whose estimated
       Jaccard (fraction of agreeing signature slots, an unbiased MinHash
       estimate) is below ``verify_threshold - prefilter_margin`` are
       dropped BEFORE the exact verify join ships the full shingle-hash
       arrays. With 64 hashes the estimate's σ ≈ 0.0625, so the default
       0.25 margin is 4σ — false-negative odds per true pair ≈ 1e-6.
    5. **Exact verify** — surviving candidates get exact Jaccard on the
       64-bit shingle-hash sets (longs, not strings, cross the shuffle).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    # 1) collapse exact duplicates: ONE corpus-wide shuffle (by text
    # fingerprint) produces BOTH the representative row and the sorted
    # exact-dup member array per distinct text — the member arrays make
    # every later membership lookup a probe of the persisted base instead
    # of a re-scan of the corpus.
    docs = df.select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("__text"),
        fingerprint64(F.col(text_col)).alias("fp"),
    )
    reps = (
        docs.groupBy("fp")
        .agg(
            F.min_by(F.struct("doc", "__text"), F.col("doc")).alias("__r"),
            F.array_sort(F.collect_list("doc")).alias("members"),
        )
        .select(
            F.col("__r.doc").alias("doc"), "fp",
            F.col("__r.__text").alias("__text"), "members",
        )
    )

    # 2) signature + gram-hash base, persisted (reused by banding, both
    # verify fetches and re-expansion). Signatures via double hashing —
    # 2 string hashes per shingle, not num_hashes (see _minhash_sig_expr);
    # the dense signature map runs post-exchange, so it is parallel even
    # when the input arrives as a single split.
    sh = F.array_distinct(shingles(F.col("__text"), shingle_k))
    gs = F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))
    base = reps.select(
        "doc", "fp", gs.alias("gs"), _minhash_sig_expr(sh, num_hashes).alias("sig"),
        "members",
    ).persist()

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * rows_per_band + i + 1) for i in range(rows_per_band)]
            ).alias("bsig"),
        )
        for b in range(bands)
    ]
    banded = base.select("doc", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig")
    )

    # 3) one bucket aggregation replaces the count + join + self-join
    # chain (3 exchanges + 2 sort-merge joins): collect each bucket's
    # (distinct, ≤cap) doc ids and expand the ordered pairs with JVM HOFs
    # — identical candidate set (every a<b pair sharing a bucket of ≤cap
    # docs), one light (band, bsig, doc) shuffle. The cap bounds the
    # per-bucket array AND the quadratic expansion exactly as before.
    buckets = banded.groupBy("band", "bsig").agg(
        F.array_sort(F.collect_list("doc")).alias("__ds")
    )
    if bucket_cap:
        buckets = buckets.filter(F.size("__ds") <= F.lit(int(bucket_cap)))
    cand = (
        buckets.select(F.explode(_ordered_pairs("__ds")).alias("__p"))
        .select("__p.doc_a", "__p.doc_b")
        .distinct()
    )
    # candidates survive LSH + the cap — orders of magnitude smaller than
    # the corpus. Materialize + measure; when small, the payload joins
    # below become broadcast probes of the persisted base (zero payload
    # exchanges) instead of sort-merge joins (guide §3.1).
    cand, _n_cand = materialize_small(cand)

    # 4) + 5) pre-filter on signature agreement, then exact verify
    side_a = base.select(
        F.col("doc").alias("doc_a"), F.col("fp").alias("fp_a"),
        F.col("gs").alias("gs_a"), F.col("sig").alias("sig_a"),
    )
    side_b = base.select(
        F.col("doc").alias("doc_b"), F.col("fp").alias("fp_b"),
        F.col("gs").alias("gs_b"), F.col("sig").alias("sig_b"),
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    half1 = cand.join(side_a, "doc_a")
    if _n_cand <= 1_000_000:
        # keep the broadcast chain alive through the second fetch: the
        # joined intermediate is n_cand rows of sig+gs payload, still tiny
        half1 = F.broadcast(half1)
    rep_pairs = (
        half1.join(side_b, "doc_b")
        .filter(agree >= F.lit(int((verify_threshold - prefilter_margin) * num_hashes)))
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("gs_a", "gs_b"))
                / F.size(F.array_union("gs_a", "gs_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("fp_a", "fp_b", "jaccard")
    )
    rep_pairs, _n_rep = materialize_small(rep_pairs)
    release(cand)

    # re-expand exact-dup groups: cross-group pairs inherit the rep pair's
    # jaccard (same texts); within-group pairs are jaccard 1.0 by identity.
    # Member ids were collected in the base aggregation, so re-expansion is
    # two (broadcast-when-small) fetches of the member arrays plus a HOF
    # cross product — the corpus is never re-scanned for membership.
    ca = base.select(F.col("fp").alias("fp_a"), F.col("members").alias("__ma"))
    cb = base.select(F.col("fp").alias("fp_b"), F.col("members").alias("__mb"))
    half2 = rep_pairs.join(ca, "fp_a")
    if _n_rep <= 1_000_000:
        half2 = F.broadcast(half2)
    cross_expr = F.flatten(
        F.transform(
            F.col("__ma"),
            lambda x: F.transform(
                F.col("__mb"),
                lambda y: F.struct(
                    F.least(x, y).alias("doc_a"), F.greatest(x, y).alias("doc_b")
                ),
            ),
        )
    )
    cross = (
        half2.join(cb, "fp_b")
        .select(F.explode(cross_expr).alias("__p"), "jaccard")
        .select(F.col("__p.doc_a").alias("doc_a"),
                F.col("__p.doc_b").alias("doc_b"), "jaccard")
    )
    within = (
        base.filter(F.size("members") >= 2)
        .select(F.explode(_ordered_pairs("members")).alias("__p"))
        .select(F.col("__p.doc_a").alias("doc_a"),
                F.col("__p.doc_b").alias("doc_b"),
                F.lit(1.0).alias("jaccard"))
    )
    out = cross.unionByName(within) if verify_threshold <= 1.0 else cross
    # the pair list is orders of magnitude smaller than the signature base:
    # materialize it eagerly (localCheckpoint) so the persisted base can be
    # RELEASED before returning — a long-lived session (driver gate, bench
    # loop) must not accumulate executor storage across repeated calls
    out = out.localCheckpoint()
    release(rep_pairs)
    base.unpersist()
    return out


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line/paragraph dedup (the C4/RefinedWeb boilerplate pass):
    every line that already occurred earlier in the corpus — in ANY document
    — is dropped; the first occurrence (ordered by (doc id, line position))
    survives. Returns (id, text with surviving lines re-joined, n_lines,
    n_dropped).

    Web corpora are full of repeated boilerplate lines (navigation, cookie
    banners, signatures); removing them document-locally misses the
    cross-document repetition that actually poisons training data.

    Scale shape: posexplode lines → ONE shuffle on the 64-bit line
    fingerprint (8-byte keys; the line text rides along only to be
    reassembled) → row_number picks the global first occurrence → one
    groupBy(id) re-assembly with an order-struct sort. No O(n²) anywhere;
    both shuffles are linear in total line count.

    NULL-text documents pass through unchanged (text NULL, 0 lines) — a
    dedup pass must never drop documents. ``sep`` is a LITERAL separator
    (escaped before it reaches the regex-based split).
    """
    import re

    df = spread_small_input(df)
    null_docs = df.filter(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.lit(None).cast("string").alias(text_col),
        F.lit(0).cast("long").alias("n_lines"),
        F.lit(0).cast("int").alias("n_dropped"),
    )
    lines = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "line"),
    )
    # partition by (hash, line): the 8-byte hash does the distribution work,
    # the line itself disambiguates 2^-64 collisions so dedup stays EXACT
    w = Window.partitionBy(F.xxhash64("line"), "line").orderBy("id", "pos")
    marked = lines.withColumn("__rn", F.row_number().over(w))
    kept = (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("__rn") > 1).cast("int")).alias("n_dropped"),
            # collect_list skips NULLs: only first-occurrence lines survive
            F.array_sort(
                F.collect_list(F.when(F.col("__rn") == 1, F.struct("pos", "line")))
            ).alias("keep"),
        )
        .select(
            F.col("id").alias(id_col),
            F.array_join(
                F.transform("keep", lambda s: s["line"]), sep
            ).alias(text_col),
            "n_lines",
            F.col("n_dropped").cast("int").alias("n_dropped"),
        )
    )
    return kept.unionByName(null_docs)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, signed bit-vote, sign pack.

    Computed ZERO-shuffle, entirely inside the row: tokenize → hash each
    token once → one ``aggregate`` fold accumulating the 64 signed bit-votes
    (a + 1 if the token hash has bit i set else −1) → pack sign bits. The
    earlier explode + groupBy-with-64-conditional-sums formulation paid a
    250k-row shuffle plus a 64-buffer hash aggregate too wide for
    whole-stage codegen; the per-row fold does the identical arithmetic in
    a pure map stage. Bit i is tested as ``h & (1<<i) != 0`` via a literal
    powers array (PySpark's shift functions take only Python-int distances,
    not lambda variables); the i=63 power is ``-(1<<63)``, whose two's-
    complement bit pattern both tests and packs the sign bit correctly.
    The Hamming-neighborhood join for near-dups is ``bit_count(a ^ b) <= r``
    on the packed long. Docs with NULL text are dropped (as the explode
    formulation did). spread_small_input keeps the dense map stage parallel
    when the input arrives as a handful of splits (no-op at scale).
    """
    df = spread_small_input(df.filter(F.col(text_col).isNotNull()))
    powers = F.array(
        *[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    hs = F.transform(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.xxhash64(t)
    )
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("doc"), packed.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bucket_cap: int = 256,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit chunks.

    NB (API behavior): the returned pair list is EAGERLY computed at call
    time — it is localCheckpoint-materialized so the heavyweight persisted
    base can be released before returning. The checkpointed result itself
    occupies (small) executor storage until the caller drops it: call
    ``funcify_feature_eng_spark.operators.util.release(pairs)`` when done
    in a long-lived session.

    Pigeonhole: two hashes within Hamming r≤3 share at least one of 4
    16-bit chunks exactly — join per chunk, then verify bit_count(xor).
    The simhash base is persisted (both self-join branches reuse one
    computation), and chunk buckets above ``bucket_cap`` docs are dropped
    from candidate generation — a 16-bit chunk shared by m docs yields m²
    candidates, and at web scale boilerplate makes such buckets real
    (``bucket_cap=0`` disables the cap)."""
    sh = simhash64(df, id_col, text_col).persist()
    chunks = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    if bucket_cap:
        ok = (
            chunks.groupBy("ci", "cv")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= bucket_cap)
            .select("ci", "cv")
        )
        chunks = chunks.join(ok, on=["ci", "cv"])
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), on=["ci", "cv"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    # eager-materialize the (small) pair list, then release the persisted
    # simhash base — see minhash_lsh_pairs for why
    pairs = pairs.localCheckpoint()
    sh.unpersist()
    return pairs


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_fingerprints: DataFrame | None,
    id_col: str,
    text_col: str,
    fp_col: str = "fingerprint",
) -> tuple[DataFrame, DataFrame]:
    """Snapshot-incremental exact dedup: dedup a NEW batch against itself
    and against the historical fingerprint table, without touching the
    historical corpus rows.

    Returns ``(kept, new_fingerprints)``: the surviving new rows, and the
    fingerprints to append to the store (so the next batch sees them).
    ``seen_fingerprints`` is a one-column frame of prior ``fp_col`` values
    (or None for the first batch).

    At 100 TB this is THE dedup shape for a growing corpus: each ingest
    shuffles only the new batch's 8-byte fingerprints; the historical side
    is a semi-join against a fingerprint table that is itself a tiny
    fraction of corpus bytes (8 bytes/doc), bucketed by fingerprint so the
    anti-join is co-located. Re-running the whole-corpus dedup per ingest
    would re-shuffle everything ever seen; this touches O(batch) + a
    pruned probe of the store. The within-batch rule is the same
    deterministic min-id winner as ``exact_dedup``, so
    incremental-over-batches ≡ one whole-corpus pass whenever ids are
    globally ordered by batch (oracle-gated equivalence).
    """
    fp = fingerprint64(F.col(text_col))
    batch = new_df.withColumn(fp_col, fp)
    w = Window.partitionBy(fp_col).orderBy(F.col(id_col).asc())
    batch_winners = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    new_fps = batch.select(fp_col).distinct()
    if seen_fingerprints is not None:
        seen = seen_fingerprints.select(F.col(fp_col)).distinct()
        kept = batch_winners.join(seen, on=fp_col, how="left_anti")
        # append ONLY novel fingerprints: returning the full batch set
        # would write duplicate store rows every ingest, growing the
        # "8 bytes/doc" store as O(sum of per-batch distinct) instead of
        # O(global distinct) and inflating every later anti-join
        new_fps = new_fps.join(seen, on=fp_col, how="left_anti")
    else:
        kept = batch_winners
    return kept.drop(fp_col), new_fps


def _minhash_band_keys(
    sigs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc, band, bsig) LSH keys derived from stored signatures — a pure
    map over the (doc, sig) frame, so a signature STORE never needs to
    persist band keys: 8·num_hashes bytes/doc is the whole store row."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * rows_per_band + i + 1)
                  for i in range(rows_per_band)]
            ).alias("bsig"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))


def incremental_minhash_dedup(
    new_df: DataFrame,
    seen_signatures: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    est_threshold: float = 0.7,
    bucket_cap: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Snapshot-incremental NEAR-dup dedup: dedup a new ingest batch
    against itself and a historical MinHash SIGNATURE store, without ever
    re-reading historical text (the near-dup analog of
    :func:`incremental_exact_dedup`).

    Returns ``(kept, new_signatures)``: surviving new rows, and the
    ``(doc, sig)`` rows to append to the store. The store holds ONE
    array<long> per historically-distinct text (8·num_hashes bytes/doc —
    at 64 hashes, half a KB per doc regardless of document size), and
    band keys are re-derived from it at probe time, so each ingest
    shuffles O(batch) band keys plus a pruned probe of the store.

    Decision rule (deterministic, store-precedence): a new doc is dropped
    when its signature agreement with ANY smaller-id batch rep or ANY
    stored signature reaches ``int(est_threshold * num_hashes)`` matching
    slots. Agreement is the unbiased MinHash Jaccard estimate (sigma =
    sqrt(J(1-J)/num_hashes), ~0.06 at 64 hashes) — the honest trade for
    not storing gram sets: exact verify would need the historical
    shingles, which is corpus-scale storage. Exact duplicates within the
    batch collapse by text fingerprint first (min-id winner, as
    :func:`exact_dedup`) so identical texts can't blow out LSH buckets.

    ``new_signatures`` carries ALL batch reps (kept AND near-dropped):
    witnesses include dropped docs, which is exactly what makes
    incremental-over-batches ≡ one whole-corpus pass when ids are
    batch-ordered (pytest-pinned; the equivalence assumes no bucket
    crosses ``bucket_cap`` only in the combined view). NULL/empty texts
    fingerprint AND sign to a constant (the ``exact_dedup`` convention),
    so they exact-collapse within a batch and dedup across batches
    against each other — never against real text. Doc ids must be unique
    ACROSS batches (store rows join back by id): reuse of an id between
    the store and a later batch would conflate two documents' witnesses.
    """
    if num_hashes % bands:
        raise ValueError("incremental_minhash_dedup: bands must divide num_hashes")
    min_agree = int(est_threshold * num_hashes)

    # 1) exact collapse within the batch (min-id winner per fingerprint)
    fp = fingerprint64(F.col(text_col))
    batch = new_df.withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    winners = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 2) zero-shuffle signatures for the batch reps
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))
    sigs = winners.select(
        F.col(id_col).alias("doc"),
        _minhash_sig_expr(sh, num_hashes).alias("sig"),
    ).where(F.col("sig").isNotNull()).persist()

    bk_new = _minhash_band_keys(sigs, num_hashes, bands)
    store = None
    if seen_signatures is not None:
        store = seen_signatures.select("doc", "sig").where(
            F.col("sig").isNotNull()
        )
        bk_old = _minhash_band_keys(store, num_hashes, bands)

    # 3) + 4) ONE bucket aggregation replaces the occupancy-count + cap
    # joins + bucket self/cross joins (4 exchanges + 3 sort-merge joins):
    # each (band, bsig) bucket collects its batch docs and store docs into
    # two sorted arrays, the COMBINED occupancy cap filters whole buckets
    # (same rule as before — both sides skip an oversized bucket), and the
    # candidate pairs expand as JVM HOFs over the bounded arrays.
    occ = bk_new.select("band", "bsig", "doc", F.lit(0).alias("__side"))
    if store is not None:
        occ = occ.unionByName(
            bk_old.select("band", "bsig", "doc", F.lit(1).alias("__side"))
        )
    buckets = occ.groupBy("band", "bsig").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("__side") == 0, F.col("doc")))
        ).alias("__new"),
        F.array_sort(
            F.collect_list(F.when(F.col("__side") == 1, F.col("doc")))
        ).alias("__old"),
    )
    if bucket_cap:
        buckets = buckets.filter(
            (F.size("__new") + F.size("__old")) <= F.lit(int(bucket_cap))
        )
    # batch-batch: every unordered in-batch pair, larger id = doc, smaller
    # = witness (the _ordered_pairs struct is (doc_a < doc_b))
    batch_pairs = F.transform(
        _ordered_pairs("__new"),
        lambda p: F.struct(p["doc_b"].alias("doc"), p["doc_a"].alias("wit")),
    )
    # batch-store: full cross product, store doc is always the witness
    cross_pairs = F.flatten(
        F.transform(
            F.col("__new"),
            lambda x: F.transform(
                F.col("__old"),
                lambda y: F.struct(x.alias("doc"), y.alias("wit")),
            ),
        )
    )
    cand = (
        buckets.select(
            F.explode(F.concat(batch_pairs, cross_pairs)).alias("__p")
        )
        .select("__p.doc", "__p.wit")
        .distinct()
    )
    # candidate pairs survive LSH + the cap — far smaller than either
    # signature table; broadcast-when-small turns both signature fetches
    # into probes (guide §3.1) instead of sort-merge joins
    cand, _n_cand = materialize_small(cand)

    # 5) signature-agreement decision
    all_sigs = sigs if store is None else sigs.unionByName(store)
    agree = F.size(
        F.filter(F.zip_with("sig", "wit_sig", lambda x, y: x == y), lambda m: m)
    )
    half = cand.join(sigs.select("doc", "sig"), "doc")
    if _n_cand <= 1_000_000:
        half = F.broadcast(half)
    dropped = (
        half.join(
            all_sigs.select(F.col("doc").alias("wit"), F.col("sig").alias("wit_sig")),
            "wit",
        )
        .filter(agree >= F.lit(min_agree))
        .select("doc")
        .distinct()
    )

    # checkpoint only the SMALL frames before releasing the persisted
    # signature base: the dropped id set and the batch signatures (k longs
    # per doc). `kept` is ~the whole ingest batch WITH full text —
    # checkpointing it would copy the corpus to executor-local storage on
    # every ingest; left lazy it rebuilds from the caller's batch plus the
    # checkpointed dropped set, never re-running the minhash pipeline.
    # materialize_small doubles as the anti-join build-side hint: the
    # dropped id set is tiny, so the anti-join becomes a broadcast probe
    # of the batch instead of shuffling the full-text winners.
    dropped, _ = materialize_small(dropped)
    release(cand)
    kept = winners.join(
        dropped.withColumnRenamed("doc", id_col), on=id_col, how="left_anti"
    ).drop("__fp")
    new_sigs = sigs.localCheckpoint()
    sigs.unpersist()
    return kept, new_sigs
