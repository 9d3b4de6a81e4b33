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
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (doc_a < doc_b).

    Inverted-index join: explode distinct n-grams, self-join on the n-gram,
    count co-occurrences, then |A∪B| = |A|+|B|−|A∩B|. The join key is the
    64-bit hash of the n-gram, not the string. Exact (no LSH approximation);
    use minhash_lsh for the at-scale candidate path.
    """
    grams = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias("g"),
        )
        .select("doc", F.xxhash64("g").alias("gh"))
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    co = (
        grams.alias("a")
        .join(grams.alias("b"), on="gh")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
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


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures: min over shingles of seeded xxhash64, one column
    pass — explode + single groupBy with ``num_hashes`` min-aggregates
    (map-side combine keeps the shuffle at num_hashes longs per doc)."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_k))).alias("s"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH near-dup pairs: band the signature, bucket-join for
    candidates, then verify candidates with EXACT shingle Jaccard.

    rows/bucket is bounded by banding; candidate verification joins back to
    the shingle sets only for candidate docs (semi-join pruning).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig")))
    banded = sig.select("doc", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "sig"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # exact verification on candidates only; intersect 64-bit shingle hashes
    # instead of shingle strings — the verify join then shuffles longs, not
    # documents (collision odds 2^-64 per pair are noise vs the threshold)
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.transform(shingles(F.col(text_col), shingle_k), lambda s: F.xxhash64(s))
        ).alias("gs"),
    )
    out = (
        cand.join(grams.withColumnRenamed("doc", "doc_a").withColumnRenamed("gs", "gs_a"), "doc_a")
        .join(grams.withColumnRenamed("doc", "doc_b").withColumnRenamed("gs", "gs_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("gs_a", "gs_b"))
                / F.size(F.array_union("gs_a", "gs_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, signed bit-vote, sign pack.

    explode → one groupBy with 64 conditional sums (all JVM-side); the
    Hamming-neighborhood join for near-dups is ``bit_count(a ^ b) <= r`` on
    the packed long.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    packed = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else bit * F.lit(-(1 << 63)).cast("long")
        packed = term if packed is None else packed + term
    return agg.select("doc", packed.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit chunks.

    Pigeonhole: two hashes within Hamming r≤3 share at least one of 4
    16-bit chunks exactly — join per chunk, then verify bit_count(xor)."""
    sh = simhash64(df, id_col, text_col)
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
    return pairs
