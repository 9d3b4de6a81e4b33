

class TestReadability:
    def test_pinned_counts_and_score(self, spark):
        from pyspark.sql import functions as SF

        from funcify_feature_eng_spark.functions.text import (
            flesch_milli,
            readability_counts,
        )

        rows = [
            (1, "The cat sat. It was happy!"),  # 6 words, 2 sents
            (2, "word"),                         # 1 word, 0 punct -> 1 sent
            (3, ""),                             # empty: 0 words
            (4, None),
        ]
        df = spark.createDataFrame(rows, ["i", "t"])
        w, s, y = readability_counts(SF.col("t"))
        out = {r["i"]: (r["w"], r["s"], r["y"], r["f"]) for r in df.select(
            "i", w.alias("w"), s.alias("s"), y.alias("y"),
            flesch_milli(SF.col("t")).alias("f"),
        ).collect()}
        # doc 1: words=6, sents=2, syllables: e,a,a,i,a,a,y(happy->a,y runs)
        # "the cat sat it was happy" vowel runs: e,a,a,i,a,a,y = 7
        assert out[1][0] == 6 and out[1][1] == 2 and out[1][2] == 7
        exp1 = 206835 - (6 * 1015) // 2 - (7 * 84600) // 6
        assert out[1][3] == exp1
        assert out[2] == (1, 1, 1, 206835 - 1015 - 84600)
        assert out[3][0] == 0 and out[3][3] is None
        assert out[4] == (None, None, None, None)
