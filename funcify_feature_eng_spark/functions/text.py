"""Text-analysis functions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen-eligible): token counting,
quality scoring, n-gram heuristic language ID, shingling, and document
fingerprints. These extend the reference's transformer surface to the ops a
100 TB document pipeline needs; they run over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "to", "of", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
}


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty/NULL text → empty array."""
    t = F.split(F.trim(c), r"\s+")
    return F.when(F.length(F.trim(c)) > 0, t).otherwise(F.array().cast("array<string>"))


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs, the
    standard regex approximation of subword token counts."""
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    )


def char_len(c: Column) -> Column:
    return F.length(c)


def alpha_ratio(c: Column) -> Column:
    """Fraction of alphabetic chars — a classic quality signal."""
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_len(c: Column) -> Column:
    tk = tokens(c)
    total = F.aggregate(tk, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(tk) > 0, total.cast("double") / F.size(tk)).otherwise(F.lit(0.0))


def _count_in(tk: Column, words: list[str]) -> Column:
    """Occurrences of any of ``words`` in token array ``tk``.

    NB: the predicate must be a unary lambda — PySpark treats a second
    parameter (even defaulted) as the element-index argument.
    """
    sw = F.array(*[F.lit(w) for w in words])

    def pred(x: Column) -> Column:
        return F.array_contains(sw, x)

    return F.size(F.filter(tk, pred))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    """Fraction of tokens in the language's stopword list."""
    tk = tokens(F.lower(c))
    hits = _count_in(tk, STOPWORDS[lang])
    return F.when(F.size(tk) > 0, hits.cast("double") / F.size(tk)).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality score: length band + alpha ratio + stopword
    presence. Deterministic, fully columnar."""
    n = F.length(c)
    len_score = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(
        F.lit(0.0)
    )
    return F.round((len_score + alpha_ratio(c) + stopword_ratio(c)) / F.lit(3.0), 6)


def lang_id_from_tokens(tk: Column) -> Column:
    """Stopword-vote language ID from a pre-tokenized (lowercased) array.

    Tokenize once and reuse the column — the 4-language expression tree is
    4× smaller, which cuts whole-stage-codegen compile time materially.

    Ties break by the fixed language order (greatest wins in struct-max
    comparison, so order langs so that earlier = lower priority)."""
    scores = []
    for lang in ["de", "fr", "es", "en"]:  # later = higher tie priority
        scores.append(
            F.struct(
                _count_in(tk, STOPWORDS[lang]).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(c: Column) -> Column:
    """Stopword-vote language ID over raw text (see lang_id_from_tokens)."""
    return lang_id_from_tokens(tokens(F.lower(c)))


def shingles(c: Column, k: int = 3) -> Column:
    """Word k-shingles as strings (for MinHash/Jaccard dedup).

    Built with ``zip_with`` over the token array and its shifted slices —
    NOT ``transform(idx, i -> slice(tk, i+1, k))`` — because expressions
    referenced inside a higher-order-function lambda are re-evaluated per
    element (the tokenizing ``split`` would run once per shingle, making
    the whole thing O(n_tokens²) string splits per row). ``zip_with``'s
    children are ordinary expressions evaluated once per row, so this is
    k token-array evaluations + O(n_tokens·k) concats. Output is
    byte-identical to the old form (locked by the minhash/simhash
    fixtures and tests/test_functions.py)."""
    tk = tokens(F.lower(c))
    n = F.size(tk)
    acc = tk
    for j in range(1, k):
        # zip the running (j)-gram array with tokens shifted left by j;
        # zip_with pads the shorter side with NULL, and concat(NULL) -> NULL,
        # so trailing partial shingles become NULL and are sliced off below
        acc = F.zip_with(
            acc,
            F.slice(tk, j + 1, F.greatest(n - j, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    full = F.slice(acc, 1, F.greatest(n - k + 1, F.lit(1)))
    return F.when(n >= k, full).otherwise(F.array(F.concat_ws(" ", tk)))


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Character n-grams (for n-gram Jaccard).

    Same HOF-lambda hazard as :func:`shingles`: ``transform(idx, i ->
    substring(s, i, n))`` re-evaluates ``s = lower(c)`` once per n-gram
    (O(len²) lowering per row). Instead split once into a char array and
    chain ``zip_with`` concats — children evaluated once per row,
    O(len·n) total. Output byte-identical (both substring and split('')
    are character-based, so multibyte text agrees)."""
    s = F.lower(c)
    ln = F.length(s)
    ch = F.split(s, "")
    acc = ch
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(ch, j + 1, F.greatest(ln - j, F.lit(1))),
            lambda a, b: F.concat(a, b),
        )
    full = F.slice(acc, 1, F.greatest(ln - n + 1, F.lit(1)))
    return F.when(ln >= n, full).otherwise(F.array(s))


def nfc_normalize(c: Column) -> Column:
    """Unicode NFC normalization — text canonicalization ahead of dedup /
    tokenization (decomposed 'a'+combining-acute → composed 'á').

    Spark has no built-in normalizer, so this is the Arrow path: a
    vectorized pandas UDF over ``unicodedata.normalize`` (same Unicode
    standard as DuckDB's utf8proc-based nfc_normalize — outputs agree
    byte-for-byte, which the gate checks)."""
    def _norm(s):
        # pandas' vectorized normalizer (unicodedata underneath, NaN-safe)
        return s.str.normalize("NFC")

    return F.pandas_udf(_norm, "string")(c)


def fingerprint64(c: Column) -> Column:
    """Stable 64-bit document fingerprint (xxhash64 of normalized text) —
    the exact-dedup key and lineage content hash."""
    return F.xxhash64(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
PII_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def pii_redact(c: Column) -> Column:
    """PII scrubbing for training corpora: emails, SSN-shaped ids, and
    phone-shaped digit runs replaced with typed placeholder tags. Pure
    regexp_replace chain — JVM-side, codegen-resident, scan-speed at 100 TB
    (the standard pre-tokenization redaction pass). Order matters: SSN
    before phone (an SSN also matches the phone shape)."""
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN_RE, "<SSN>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return out


def pii_counts(c: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ssns, n_phones) found in the raw text — the audit
    metric that accompanies redaction. Phones are counted on the
    email+SSN-redacted text, mirroring ``pii_redact``'s application order
    exactly: a digit run inside an email (user123456789@...) is an email,
    not a phone, and counting it as both would make the audit disagree
    with the redacted output it describes."""
    n_email = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_ssn = F.size(F.regexp_extract_all(c, F.lit(PII_SSN_RE), 0))
    wo_prior = F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"), PII_SSN_RE, "<SSN>"
    )
    n_phone = F.size(F.regexp_extract_all(wo_prior, F.lit(PII_PHONE_RE), 0))
    return n_email, n_ssn, n_phone


def compression_stats(c: Column, *, level: int = 6) -> Column:
    """zlib compressibility of the UTF-8 text — the classic repetition /
    boilerplate quality signal (highly compressible text is templated or
    degenerate; near-incompressible text is noise/binary-ish). Returns a
    struct ``(n_bytes, zlib_bytes, compression_ppm)`` where
    ``compression_ppm = zlib_bytes * 1_000_000 DIV n_bytes`` — exact
    integer parts-per-million, no float in the gate. NULL or empty text
    yields ``(0, 0, 0)``.

    This is the intended-Arrow tier (alongside :func:`nfc_normalize`):
    one vectorized pandas-UDF map pass, no shuffle. zlib output is
    deterministic for a fixed library + level, and the oracle fixture is
    produced by the same CPython zlib (scripts/make_fixtures.py), so the
    gate hash-compares exact integers.
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    fields = StructType([
        StructField("n_bytes", LongType()),
        StructField("zlib_bytes", LongType()),
        StructField("compression_ppm", LongType()),
    ])

    def _comp(texts):
        import zlib

        nb, zb, ppm = [], [], []
        for t in texts:
            if t is None or t == "":
                nb.append(0); zb.append(0); ppm.append(0)
                continue
            raw = t.encode("utf-8")
            z = len(zlib.compress(raw, level))
            nb.append(len(raw)); zb.append(z)
            ppm.append(z * 1_000_000 // len(raw))
        return pd.DataFrame({"n_bytes": nb, "zlib_bytes": zb,
                             "compression_ppm": ppm})

    return F.pandas_udf(_comp, fields)(c)


def readability_counts(c: Column) -> tuple[Column, Column, Column]:
    """(n_words, n_sentences, n_syllables) under PINNED counting rules —
    words = non-whitespace runs, sentences = max(1, runs of [.!?]) for
    any doc with at least one word, syllables = [aeiouy]+ runs in the
    lowercased text (the classic vowel-run heuristic; no per-word
    minimum — pinned so an independent engine reproduces it with three
    regexp counts). NULL text -> NULL counts."""
    words = F.regexp_count(c, F.lit(r"\S+")).cast("bigint")
    sents = F.greatest(
        F.lit(1).cast("bigint"),
        F.regexp_count(c, F.lit(r"[.!?]+")).cast("bigint"),
    )
    syll = F.regexp_count(F.lower(c), F.lit("[aeiouy]+")).cast("bigint")
    none = F.lit(None).cast("bigint")
    return (
        F.when(c.isNotNull(), words).otherwise(none),
        F.when(c.isNotNull() & (words > 0), sents).otherwise(none),
        F.when(c.isNotNull(), syll).otherwise(none),
    )


def flesch_milli_from_counts(words: Column, sents: Column, syll: Column) -> Column:
    """:func:`flesch_milli` assembled from ALREADY-COMPUTED
    :func:`readability_counts` columns. Identical result by case analysis
    (NULL text -> NULL words -> NULL; words=0 -> NULL; otherwise sents and
    syll are their in-branch values), but the caller's projection computes
    each regexp count ONCE — inlining the counts into the conditional, as
    ``flesch_milli(c)`` must, re-evaluates the word regex ~5x because
    Spark's subexpression elimination skips conditional branches."""
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    dec = "decimal(38,0)"
    return F.when(
        words > 0,
        F.lit(206835).cast("bigint")
        - exact_floor_div(
            (words * F.lit(1015)).cast(dec), sents.cast(dec)
        ).cast("bigint")
        - exact_floor_div(
            (syll * F.lit(84600)).cast(dec), words.cast(dec)
        ).cast("bigint"),
    ).cast("bigint")


def flesch_milli(c: Column) -> Column:
    """Flesch reading-ease on the integer milli-point grid:
    ``206835 - floor(1015·words/sentences) - floor(84600·syllables/words)``
    with :func:`readability_counts`'s pinned counting rules — no float
    anywhere, so the score is bit-reproducible in any engine (divide by
    1000 for the classic scale; ~90000 = very easy, <30000 = academic).
    NULL for empty/NULL docs."""
    words, sents, syll = readability_counts(c)
    return flesch_milli_from_counts(words, sents, syll)
