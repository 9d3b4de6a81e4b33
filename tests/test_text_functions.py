"""Tests for functions/text.py additions."""

from pyspark.sql import functions as F



def test_compression_stats_matches_zlib_and_handles_null(spark):
    import zlib

    from funcify_feature_eng_spark.functions.text import compression_stats

    rows = [(1, "abab" * 50), (2, "the quick brown fox"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["c"]["n_bytes"], r["c"]["zlib_bytes"],
                      r["c"]["compression_ppm"])
        for r in df.select("doc_id",
                           compression_stats(F.col("text")).alias("c")).collect()
    }
    for doc_id, t in rows:
        if not t:
            assert got[doc_id] == (0, 0, 0)
        else:
            raw = t.encode()
            z = len(zlib.compress(raw, 6))
            assert got[doc_id] == (len(raw), z, z * 1_000_000 // len(raw))
    # the templated doc compresses far better than the prose one
    assert got[1][2] < got[2][2]
