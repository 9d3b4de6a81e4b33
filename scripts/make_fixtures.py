"""Generate oracle fixtures for the hash-dependent dedup gate queries.

The driver's DuckDB oracle cannot compute Spark's xxhash64, so the expected
outputs of ``minhash_lsh_pairs`` and ``simhash_near_pairs`` are precomputed
here by an INDEPENDENT pure-Python re-implementation of the pipelines
(tokenizing, shingling, MinHash, banding, bucket cap, signature pre-filter,
exact verify / SimHash bit votes, chunk blocking, Hamming verify) on top of
``functions/xxh64.py`` (locked against Spark in tests/test_xxh64.py).
``oracle_sql()`` then just selects the fixture parquet.

Run whenever the testdata changes:  python scripts/make_fixtures.py
tests/test_fixture_oracles.py asserts fixture == live Spark output, so a
stale fixture fails fast.
"""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from funcify_feature_eng_spark.functions.xxh64 import spark_xxhash64

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "fixtures")

# parameters MUST mirror __spark_entry__.q_minhash_lsh_pairs / q_simhash_near_pairs
MINHASH = dict(num_hashes=64, bands=16, shingle_k=3, verify_threshold=0.5,
               bucket_cap=64, prefilter_margin=0.25)
SIMHASH = dict(max_hamming=3, bucket_cap=256)
# parameters MUST mirror __spark_entry__.q_dsir_select
DSIR = dict(n_buckets=4096, smoothing=1, scale=1_000_000, k=200,
            target_lang="en")
# parameters MUST mirror __spark_entry__.q_bpe_vocab / q_bpe_pieces
BPE = dict(n_merges=60, vocab_words=4096, min_count=2)
NGRAM_LM = dict(n=3, min_count=2, max_grams=20000, alpha=0.4)


# Java/Spark semantics, NOT Python's: Spark trim() strips only the SPACE
# character (0x20), and Java \s is ASCII [ \t\n\x0B\f\r] — Python str.strip()
# and re's \s additionally strip/match unicode whitespace (\xa0,  , …),
# which would silently diverge from the engine on non-ASCII corpora.
_JWS = r"[ \t\n\x0b\f\r]+"


def _jtrim(s: str) -> str:
    return s.strip(" ")


def _tokens(text: str) -> list[str]:
    t = _jtrim(text)
    return re.split(_JWS, t) if t else []


def _shingles(text: str, k: int) -> list[str]:
    tk = _tokens(text.lower())
    if len(tk) >= k:
        return [" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)]
    return [" ".join(tk)]


def _fingerprint64(text: str) -> int:
    return spark_xxhash64(_jtrim(re.sub(_JWS, " ", text)).lower())


def _round6_half_up(x: float) -> float:
    # Spark Round(double, 6): BigDecimal.valueOf(x).setScale(6, HALF_UP)
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def minhash_pairs(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    p = MINHASH
    # 1) exact-dup collapse
    groups: dict[int, list[int]] = defaultdict(list)
    texts: dict[int, str] = {}
    for doc_id, text in docs:
        fp = _fingerprint64(text)
        groups[fp].append(doc_id)
        if fp not in texts:
            texts[fp] = text  # representative text (identical within group)
    reps = {fp: min(ids) for fp, ids in groups.items()}

    # 2) signatures + gram sets per representative. Mirrors
    # operators/dedup._minhash_sig_expr: per shingle a = xxh64(s) once (the
    # only string hash); slot i = xxh64(a as long, i as int) — the long is
    # re-keyed per slot, the string never re-hashed.
    sig: dict[int, list[int]] = {}
    grams: dict[int, set[int]] = {}
    for fp, text in texts.items():
        sh = list(dict.fromkeys(_shingles(text, p["shingle_k"])))
        hs = [spark_xxhash64(s) for s in sh]
        grams[fp] = set(hs)
        sig[fp] = [
            min(spark_xxhash64(("long", a), ("int", i)) for a in hs)
            for i in range(p["num_hashes"])
        ]

    # 3) banding + bucket cap
    rpb = p["num_hashes"] // p["bands"]
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for fp, s in sig.items():
        for b in range(p["bands"]):
            bsig = spark_xxhash64(*[("long", v) for v in s[b * rpb : (b + 1) * rpb]])
            buckets[(b, bsig)].append(fp)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if p["bucket_cap"] and len(members) > p["bucket_cap"]:
            continue
        ms = sorted(members, key=lambda fp: reps[fp])
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                if reps[a] != reps[b]:
                    cand.add((a, b) if reps[a] < reps[b] else (b, a))

    # 4) signature-agreement pre-filter + 5) exact verify
    min_agree = int((p["verify_threshold"] - p["prefilter_margin"]) * p["num_hashes"])
    rep_pairs: list[tuple[int, int, float]] = []
    for fa, fb in cand:
        agree = sum(1 for x, y in zip(sig[fa], sig[fb]) if x == y)
        if agree < min_agree:
            continue
        inter = len(grams[fa] & grams[fb])
        union = len(grams[fa] | grams[fb])
        j = _round6_half_up(inter / union)
        if j >= p["verify_threshold"]:
            rep_pairs.append((fa, fb, j))

    # expand exact-dup groups
    out: list[tuple[int, int, float]] = []
    for fa, fb, j in rep_pairs:
        for da in groups[fa]:
            for db in groups[fb]:
                out.append((min(da, db), max(da, db), j))
    if p["verify_threshold"] <= 1.0:
        for ids in groups.values():
            s = sorted(ids)
            for i in range(len(s)):
                for k in range(i + 1, len(s)):
                    out.append((s[i], s[k], 1.0))
    return sorted(out)


def simhash_pairs(docs: list[tuple[int, str]]) -> list[tuple[int, int, int]]:
    p = SIMHASH
    M = (1 << 64) - 1
    sim: dict[int, int] = {}  # doc -> unsigned simhash
    for doc_id, text in docs:
        # Spark: split(lower(trim(text)), \s+) — empty text yields [""],
        # matching re.split's behavior on ""; Java-exact trim/\s as above
        toks = re.split(_JWS, _jtrim(text).lower())
        votes = [0] * 64
        for t in toks:
            u = spark_xxhash64(t) & M
            for i in range(64):
                votes[i] += 1 if (u >> i) & 1 else -1
        u = 0
        for i in range(64):
            if votes[i] > 0:
                u |= 1 << i
        sim[doc_id] = u

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, u in sim.items():
        for ci in range(4):
            buckets[(ci, (u >> (16 * ci)) & 0xFFFF)].append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if p["bucket_cap"] and len(members) > p["bucket_cap"]:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    out = []
    for a, b in cand:
        h = bin(sim[a] ^ sim[b]).count("1")
        if h <= p["max_hamming"]:
            out.append((a, b, h))
    return sorted(out)


# MUST mirror __spark_entry__.q_kmv_distinct / operators/sketches.py
KMV_K = 128
KMV_DOMAIN = 1 << 63


def kmv_distinct_counts(rows: list[tuple[str, str]]) -> list[tuple[str, int]]:
    """Independent KMV re-computation: per group, the k smallest distinct
    63-bit hashes (Spark xxhash64 with the sign bit masked — Python's `&`
    on a negative int yields the same two's-complement low bits) and the
    order-statistic estimate floor((k-1)·domain / h_k) in IEEE doubles,
    exactly the arithmetic operators/sketches.py::kmv_estimate runs."""
    import math

    groups: defaultdict[str, set[int]] = defaultdict(set)
    for g, v in rows:
        groups[g].add(spark_xxhash64(v) & (KMV_DOMAIN - 1))
    out = []
    for g, hs in groups.items():
        s = sorted(hs)
        if len(s) < KMV_K:
            est = len(s)
        else:
            est = math.floor(float((KMV_K - 1) * KMV_DOMAIN) / float(s[KMV_K - 1]))
        out.append((g, est))
    return sorted(out)


# MUST mirror __spark_entry__.q_cms_tokens / operators/sketches.py
CMS_WIDTH = 512
CMS_DEPTH = 4
CMS_MIN_COUNT = 30


def cms_token_estimates(texts: list[str]) -> list[tuple[str, int, int]]:
    """Independent count-min re-computation for the cms_tokens gate:
    single-space tokenization, per-token exact counts, a depth×width counter
    table incremented at ``spark_xxhash64(('int', d), token) pmod width``
    (Python's %% on a positive modulus IS pmod), and for every token with
    exact count >= CMS_MIN_COUNT the estimate min over depth rows —
    exactly the arithmetic operators/sketches.py::cms_sketch/cms_estimate
    runs. Threshold-set membership (not top-k) keeps the query set
    tie-free."""
    from collections import Counter

    cnt: Counter[str] = Counter(
        tok for t in texts for tok in t.split(" ") if tok
    )
    table = [[0] * CMS_WIDTH for _ in range(CMS_DEPTH)]
    buckets: dict[str, list[int]] = {}
    for tok, c in cnt.items():
        bs = [
            spark_xxhash64(("int", d), tok) % CMS_WIDTH for d in range(CMS_DEPTH)
        ]
        buckets[tok] = bs
        for d, b in enumerate(bs):
            table[d][b] += c
    out = []
    for tok, c in cnt.items():
        if c >= CMS_MIN_COUNT:
            est = min(table[d][b] for d, b in enumerate(buckets[tok]))
            out.append((tok, c, est))
    return sorted(out)


# MUST mirror __spark_entry__.q_bloom_probe / operators/sketches.py
BLOOM_M = 512
BLOOM_DEPTH = 3


def bloom_probe_counts(
    rows: list[tuple[str, int, str]],
) -> list[tuple[str, int, int]]:
    """Independent Bloom-filter re-computation for the bloom_probe gate:
    per lang, insert even-doc texts (bit d of a text =
    ``spark_xxhash64(('int', d), text) pmod BLOOM_M``), probe the DISTINCT
    odd-doc texts, and report (probed, hits) — hits counts probes whose
    every bit is set (true members + deterministic false positives at this
    m/n ratio), exactly the arithmetic operators/sketches.py::bloom_sketch/
    bloom_contains runs."""
    inserted: defaultdict[str, set[int]] = defaultdict(set)
    probes: defaultdict[str, set[str]] = defaultdict(set)
    for lang, doc_id, text in rows:
        if doc_id % 2 == 0:
            for d in range(BLOOM_DEPTH):
                inserted[lang].add(spark_xxhash64(("int", d), text) % BLOOM_M)
        else:
            probes[lang].add(text)
    out = []
    for lang in sorted(probes):
        bits = inserted.get(lang, set())
        hits = sum(
            1
            for t in probes[lang]
            if all(
                spark_xxhash64(("int", d), t) % BLOOM_M in bits
                for d in range(BLOOM_DEPTH)
            )
        )
        out.append((lang, len(probes[lang]), hits))
    return out


# MUST mirror __spark_entry__.q_kmv_overlap / operators/sketches.py
KMV_OVERLAP_K = 64


def kmv_overlap_counts(
    rows: list[tuple[str, int, str]],
) -> list[tuple[str, int, int]]:
    """Independent KMV-intersection re-computation for the kmv_overlap gate:
    per lang, docs split by doc_id parity into halves A/B; each half's
    sketch is its k smallest distinct 63-bit text hashes; the overlap
    estimate is the Beyer et al. 2007 algebra — merged = k smallest of
    A∪B, est = floor(|merged ∩ A ∩ B| / |merged| * est_union) with the
    same IEEE-double arithmetic operators/sketches.py::kmv_overlap_estimate
    runs. Langs present in only one half drop (the gate inner-joins)."""
    import math

    k = KMV_OVERLAP_K
    halves: defaultdict[tuple[str, int], set[int]] = defaultdict(set)
    for lang, doc_id, text in rows:
        halves[(lang, doc_id % 2)].add(spark_xxhash64(text) & (KMV_DOMAIN - 1))
    out = []
    for lang in sorted({g for g, _ in halves}):
        if (lang, 0) not in halves or (lang, 1) not in halves:
            continue
        ska = sorted(halves[(lang, 0)])[:k]
        skb = sorted(halves[(lang, 1)])[:k]
        merged = sorted(set(ska) | set(skb))[:k]
        matches = len(set(merged) & set(ska) & set(skb))
        only_a = len((set(merged) & set(ska)) - set(skb))
        if len(merged) < k:
            est_union = len(merged)
        else:
            est_union = math.floor(
                float((k - 1) * KMV_DOMAIN) / float(merged[k - 1])
            )
        est = math.floor(float(matches) * float(est_union) / float(len(merged)))
        est_d = math.floor(float(only_a) * float(est_union) / float(len(merged)))
        out.append((lang, est, est_d))
    return out


def dsir_topk(rows: list[tuple[int, str, str]]) -> list[tuple[int, int]]:
    """Independent pure-Python DSIR top-k (mirror of operators/selection.py).

    rows = (doc_id, text, lang); target distribution = lang == DSIR
    ['target_lang'], raw = all rows. Grams are word unigrams + bigrams via
    the same ``_shingles`` twin the dedup fixtures use; buckets are
    ``spark_xxhash64(gram) % n_buckets`` (Python ``%`` on a positive
    modulus == Spark pmod); bucket scores are integer micro-nat
    log-likelihood ratios ``floor(scale*llr + 0.5)``.
    """
    p = DSIR
    nb, a, scale = p["n_buckets"], p["smoothing"], p["scale"]
    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc: list[tuple[int, list[int]]] = []
    for doc_id, text, lang in rows:
        text = text or ""
        grams = _shingles(text, 1) + _shingles(text, 2)
        bs = [spark_xxhash64(g) % nb for g in grams]
        per_doc.append((doc_id, bs))
        raw.update(bs)
        if lang == p["target_lang"]:
            tgt.update(bs)
    denom_raw = sum(raw.values()) + a * nb
    denom_tgt = sum(tgt.values()) + a * nb
    score = {
        b: int(
            math.floor(
                (
                    math.log(tgt[b] + a)
                    - math.log(denom_tgt)
                    - math.log(raw[b] + a)
                    + math.log(denom_raw)
                )
                * scale
                + 0.5
            )
        )
        for b in raw
    }
    scored = [(doc_id, sum(score[b] for b in bs)) for doc_id, bs in per_doc]
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[: p["k"]]


def bpe_merges(texts: list[str]) -> list[tuple[int, str, str]]:
    """Independent pure-Python BPE training (mirror of operators/bpe.py::
    bpe_train): word counts over the Java-semantics tokens of lowered
    text, top vocab_words by (count desc, word asc), then the classic
    Sennrich merge loop — overlapping pair counts, left-to-right
    non-overlapping apply, ties to the lexicographically smallest pair,
    stop below min_count."""
    p = BPE
    wc: Counter = Counter()
    for t in texts:
        for w in _tokens((t or "").lower()):
            if w:
                wc[w] += 1
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[: p["vocab_words"]]

    def apply(sym: tuple, pair: tuple) -> tuple:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return tuple(out)

    words = [(tuple(w), c) for w, c in top]
    merges: list[tuple[str, str]] = []
    for _ in range(p["n_merges"]):
        pc: Counter = Counter()
        for sym, c in words:
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        bc = max(pc.values())
        if bc < p["min_count"]:
            break
        best = min(q for q, c in pc.items() if c == bc)
        merges.append(best)
        words = [(apply(sym, best), c) for sym, c in words]
    return [(i, a, b) for i, (a, b) in enumerate(merges)]


def bpe_pieces(
    rows: list[tuple[int, str]],
    merges: list[tuple[int, str, str]] | None = None,
) -> list[tuple[int, int, str]]:
    """Independent pure-Python BPE apply (mirror of operators/bpe.py::
    bpe_tokenize): per word, repeatedly merge ALL non-overlapping
    occurrences of the lowest-rank adjacent pair. Returns
    (doc_id, n_pieces, pieces joined by space). Pass the precomputed
    ``merges`` so the pieces fixture is generated against the SAME merge
    table as the merges fixture (re-training here would both double the
    O(vocab x merges) cost and risk silent divergence if the call sites
    ever feed different corpora)."""
    if merges is None:
        merges = bpe_merges([t for _, t in rows])
    ranks = {(a, b): r for r, a, b in merges}

    def apply(sym: tuple, pair: tuple) -> tuple:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return tuple(out)

    cache: dict = {}

    def encode_word(w: str) -> list[str]:
        if w in cache:
            return cache[w]
        sym = tuple(w)
        while len(sym) > 1:
            cand = [(ranks[(sym[i], sym[i + 1])], (sym[i], sym[i + 1]))
                    for i in range(len(sym) - 1)
                    if (sym[i], sym[i + 1]) in ranks]
            if not cand:
                break
            sym = apply(sym, min(cand)[1])
        cache[w] = list(sym)
        return cache[w]

    out = []
    for doc_id, t in rows:
        pieces: list[str] = []
        for w in _tokens((t or "").lower()):
            pieces.extend(encode_word(w))
        out.append((doc_id, len(pieces), " ".join(pieces)))
    return out


def doc_perplexity(rows: list[tuple[int, str]]) -> list[tuple[int, int, int, int]]:
    """Independent pure-Python n-gram LM train + stupid-backoff scoring
    (mirror of operators/ngram_lm.py): count all order-1..n grams of the
    Java-semantics tokens of lowered text, prune per order to the top
    max_grams by (count desc, gram asc) keeping count >= min_count,
    normalize unigrams by the UN-pruned total, then score each doc
    left-to-right with S(w|ctx) = count(ctx·w)/count(ctx), backoff
    alpha·S(w|shorter ctx), unigram base count(w)/total, OOV alpha/total.
    Returns (doc_id, n_tokens, lp_micro, ppl_micro) in round-half-up
    micros."""
    import math

    p = NGRAM_LM
    n, alpha = p["n"], p["alpha"]
    counts: list[Counter] = [Counter() for _ in range(n)]
    for _, t in rows:
        ws = _tokens((t or "").lower())
        for k in range(1, n + 1):
            for i in range(len(ws) - k + 1):
                counts[k - 1][" ".join(ws[i : i + k])] += 1
    total = sum(counts[0].values())
    pruned: list[dict] = []
    for k in range(n):
        top = sorted(
            ((g, c) for g, c in counts[k].items() if c >= p["min_count"]),
            key=lambda kv: (-kv[1], kv[0]),
        )[: p["max_grams"]]
        pruned.append(dict(top))

    out = []
    for doc_id, t in rows:
        ws = _tokens((t or "").lower())
        nt = len(ws)
        if nt == 0:
            out.append((doc_id, 0, 0, 0))
            continue
        lp = 0.0
        for i in range(nt):
            s = None
            mult = 1.0
            for k in range(min(n - 1, i), 0, -1):
                c = pruned[k].get(" ".join(ws[i - k : i + 1]))
                if c:
                    ctx = pruned[k - 1].get(" ".join(ws[i - k : i]))
                    if ctx:
                        s = mult * c / ctx
                        break
                mult *= alpha
            if s is None:
                c1 = pruned[0].get(ws[i])
                s = mult * (c1 if c1 else alpha) / total
            lp += math.log10(s)
        ppl = 10.0 ** (-lp / nt)
        out.append(
            (doc_id, nt, int(math.floor(lp * 1e6 + 0.5)), int(math.floor(ppl * 1e6 + 0.5)))
        )
    return out


def doc_compression(rows: list[tuple[int, str]]) -> list[tuple[int, int, int, int]]:
    """Independent zlib twin of functions/text.py::compression_stats:
    (doc_id, n_bytes, zlib_bytes, compression_ppm) with ppm as exact
    integer division; NULL/empty text -> zeros. Deterministic for a fixed
    CPython zlib at level 6 (the same library the Spark UDF calls)."""
    import zlib

    out = []
    for doc_id, t in rows:
        if not t:
            out.append((doc_id, 0, 0, 0))
            continue
        raw = t.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        out.append((doc_id, len(raw), z, z * 1_000_000 // len(raw)))
    return out


# parameters MUST mirror __spark_entry__.q_incremental_minhash
INC_MINHASH = dict(num_hashes=64, bands=16, shingle_k=3, est_threshold=0.7,
                   bucket_cap=64)


def incremental_minhash_kept(
    docs: list[tuple[int, str]]
) -> list[tuple[int, bool]]:
    """Independent pure-Python twin of operators/dedup.py::
    incremental_minhash_dedup run as a two-batch chain (batch 1 = even
    doc_ids, batch 2 = odd): per batch, fingerprint-collapse (min-id
    winner), MinHash signatures for reps, band keys, combined-occupancy
    bucket cap, then drop a doc when signature agreement with any
    smaller-id batch rep or any stored signature reaches
    int(est_threshold * num_hashes) slots. The store carries ALL reps.
    Returns (doc_id, kept) for every doc."""
    p = INC_MINHASH
    rpb = p["num_hashes"] // p["bands"]
    min_agree = int(p["est_threshold"] * p["num_hashes"])

    def sig_of(text: str) -> list[int]:
        sh = list(dict.fromkeys(_shingles(text, p["shingle_k"])))
        hs = [spark_xxhash64(s) for s in sh]
        return [
            min(spark_xxhash64(("long", a), ("int", i)) for a in hs)
            for i in range(p["num_hashes"])
        ]

    def band_keys(s: list[int]) -> list[tuple[int, int]]:
        return [
            (b, spark_xxhash64(*[("long", v) for v in s[b * rpb : (b + 1) * rpb]]))
            for b in range(p["bands"])
        ]

    kept: dict[int, bool] = {}
    store_sigs: dict[int, list[int]] = {}
    for parity in (0, 1):
        batch = sorted((d, t) for d, t in docs if d % 2 == parity)
        # fingerprint collapse: min-id winner per identical text
        reps: dict[int, str] = {}
        seen_fp: dict[int, int] = {}
        for d, t in batch:
            fp = _fingerprint64(t)
            if fp in seen_fp:
                kept[d] = False
            else:
                seen_fp[fp] = d
                reps[d] = t
        sigs = {d: sig_of(t) for d, t in reps.items()}
        keys = {d: band_keys(s) for d, s in sigs.items()}
        old_keys = {d: band_keys(s) for d, s in store_sigs.items()}
        occ: dict[tuple[int, int], int] = defaultdict(int)
        for ks in list(keys.values()) + list(old_keys.values()):
            for k in ks:
                occ[k] += 1
        ok = {k for k, n in occ.items() if not p["bucket_cap"] or n <= p["bucket_cap"]}
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        old_buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for d, ks in keys.items():
            for k in ks:
                if k in ok:
                    buckets[k].append(d)
        for d, ks in old_keys.items():
            for k in ks:
                if k in ok:
                    old_buckets[k].append(d)
        cand: set[tuple[int, int]] = set()
        for k, members in buckets.items():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i):
                    cand.add((ms[i], ms[j]))  # (doc, smaller-id witness)
            for d in members:
                for o in old_buckets.get(k, ()):
                    cand.add((d, o))
        dropped = set()
        for d, w in cand:
            ws = sigs[w] if w in sigs else store_sigs[w]
            agree = sum(1 for x, y in zip(sigs[d], ws) if x == y)
            if agree >= min_agree:
                dropped.add(d)
        for d in reps:
            kept[d] = d not in dropped
        store_sigs.update(sigs)
    return sorted(kept.items())


def hash_cross_buckets(
    rows: list[tuple[int, str | None, str | None]], n_buckets: int = 64
) -> list[tuple[int, int]]:
    """Pure-Python twin of operators/encoding.py::hash_cross over
    (lang, source): Spark's chained xxhash64 (seed 42, each column's hash
    seeds the next; NULL columns are SKIPPED, not hashed) followed by
    pmod. Params MUST mirror __spark_entry__.q_hash_crosses."""
    out = []
    for doc_id, lang, source in rows:
        vals = [v for v in (lang, source) if v is not None]
        h = spark_xxhash64(*vals)
        out.append((doc_id, h % n_buckets))  # python % == pmod for m > 0
    return sorted(out)


# MUST mirror __spark_entry__.q_hashed_features / operators/vectorize.py
HV_DIM = 64
HV_SEED = 5
HV_DOC_MOD = 20


def hashed_vector_rows(
    docs: list[tuple[int, str]]
) -> list[tuple[int, int, int]]:
    """Pure-Python twin of operators/vectorize.py::hashed_count_vector for
    the hashed_features gate: single-space tokens of every doc with
    ``doc_id %% HV_DOC_MOD == 0``, slot = ``spark_xxhash64(('int', seed),
    tok) pmod dim``, signed contribution ±1 from the hash's sign bit,
    per-(doc, slot) signed sums — INCLUDING slots whose collisions cancel
    to 0 (the occupied-slot set is a function of the tokens alone)."""
    out = []
    for doc_id, text in docs:
        # NULL text → NULL token array → NULL vector → explode drops the
        # doc entirely on the Spark side; mirror that here
        if doc_id % HV_DOC_MOD != 0 or text is None:
            continue
        sums: dict[int, int] = {}
        for tok in text.split(" "):
            if not tok:
                continue
            h = spark_xxhash64(("int", HV_SEED), tok)
            slot = h % HV_DIM  # python % == pmod for m > 0
            sums[slot] = sums.get(slot, 0) + (-1 if h < 0 else 1)
        for slot in sorted(sums):
            out.append((doc_id, slot, sums[slot]))
    return out


def make_shows_csv(path: str) -> int:
    """Raw netflix-shaped CSV derived from the deterministic gen_shows
    fixture: duration back-formatted to '<n> min' / '<n> Season(s)', dates to
    'Month DD, YYYY', list columns comma-joined — the S5 scan+reshaping gate
    input (the driver testdata has no raw CSV table)."""
    import csv
    import datetime as dt

    from funcify_feature_eng_spark.datagen import gen_shows

    tbl = gen_shows().to_pylist()
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["show_id", "type", "title", "director", "cast", "country",
             "date_added", "release_year", "rating", "duration",
             "listed_in", "description"]
        )
        for r in tbl:
            if r["duration_min"] is not None:
                duration = f"{r['duration_min']} min"
            else:
                n = r["num_seasons"]
                duration = f"{n} Season" + ("s" if n != 1 else "")
            d: dt.date = r["date_added"]
            date_added = f"{d.strftime('%B')} {d.day:02d}, {d.year}"
            w.writerow(
                [r["show_id"], r["type"], r["title"], r["director"] or "",
                 ", ".join(r["cast"]), r["country"] or "", date_added,
                 r["release_year"], r["rating"], duration,
                 ", ".join(r["listed_in"]), r["description"]]
            )
    return len(tbl)


def source_stamp(sf_dir: str) -> str:
    """Identity of the fixture's source data: path + CONTENT hash.

    Content-keyed, not mtime-keyed: a byte-identical rewrite of the testdata
    (re-download, touch) must not look like a data change — otherwise the
    oracle would silently regenerate committed fixtures at gate time."""
    import hashlib

    p = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.sha256()
    with open(p, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return f"{p}:{h.hexdigest()}"


def main(sf_dir: str | None = None) -> None:
    sf_dir = sf_dir or (sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    sf = os.path.basename(sf_dir.rstrip("/"))
    os.makedirs(FIXDIR, exist_ok=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    print(f"{len(docs)} docs from {sf_dir}")

    mh = minhash_pairs(docs)
    pq.write_table(
        pa.table(
            {
                "doc_a": pa.array([r[0] for r in mh], pa.int64()),
                "doc_b": pa.array([r[1] for r in mh], pa.int64()),
                "jaccard": pa.array([r[2] for r in mh], pa.float64()),
            }
        ),
        os.path.join(FIXDIR, f"minhash_pairs_{sf}.parquet"),
    )
    print(f"minhash_pairs_{sf}.parquet: {len(mh)} pairs")

    sh = simhash_pairs(docs)
    pq.write_table(
        pa.table(
            {
                "doc_a": pa.array([r[0] for r in sh], pa.int64()),
                "doc_b": pa.array([r[1] for r in sh], pa.int64()),
                "hamming": pa.array([r[2] for r in sh], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, f"simhash_pairs_{sf}.parquet"),
    )
    print(f"simhash_pairs_{sf}.parquet: {len(sh)} pairs")

    ltbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    km = kmv_distinct_counts(
        list(zip(ltbl["lang"].to_pylist(), ltbl["text"].to_pylist()))
    )
    pq.write_table(
        pa.table(
            {
                "lang": pa.array([r[0] for r in km], pa.string()),
                "est_distinct": pa.array([r[1] for r in km], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"kmv_distinct_{sf}.parquet"),
    )
    print(f"kmv_distinct_{sf}.parquet: {len(km)} groups")

    otbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "doc_id", "text"],
    )
    ov = kmv_overlap_counts(
        list(
            zip(
                otbl["lang"].to_pylist(),
                otbl["doc_id"].to_pylist(),
                otbl["text"].to_pylist(),
            )
        )
    )
    pq.write_table(
        pa.table(
            {
                "lang": pa.array([r[0] for r in ov], pa.string()),
                "est_overlap": pa.array([r[1] for r in ov], pa.int64()),
                "est_only_a": pa.array([r[2] for r in ov], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"kmv_overlap_{sf}.parquet"),
    )
    print(f"kmv_overlap_{sf}.parquet: {len(ov)} groups")

    cm = cms_token_estimates([t for _, t in docs])
    pq.write_table(
        pa.table(
            {
                "tok": pa.array([r[0] for r in cm], pa.string()),
                "exact_cnt": pa.array([r[1] for r in cm], pa.int64()),
                "est_count": pa.array([r[2] for r in cm], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"cms_tokens_{sf}.parquet"),
    )
    print(f"cms_tokens_{sf}.parquet: {len(cm)} tokens")

    bp = bloom_probe_counts(
        list(
            zip(
                otbl["lang"].to_pylist(),
                otbl["doc_id"].to_pylist(),
                otbl["text"].to_pylist(),
            )
        )
    )
    pq.write_table(
        pa.table(
            {
                "lang": pa.array([r[0] for r in bp], pa.string()),
                "probed": pa.array([r[1] for r in bp], pa.int64()),
                "hits": pa.array([r[2] for r in bp], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"bloom_probe_{sf}.parquet"),
    )
    print(f"bloom_probe_{sf}.parquet: {len(bp)} groups")

    dtbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ds = dsir_topk(
        list(
            zip(
                dtbl["doc_id"].to_pylist(),
                dtbl["text"].to_pylist(),
                dtbl["lang"].to_pylist(),
            )
        )
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in ds], pa.int64()),
                "dsir_score": pa.array([r[1] for r in ds], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"dsir_topk_{sf}.parquet"),
    )
    print(f"dsir_topk_{sf}.parquet: {len(ds)} rows")

    bm = bpe_merges([t for _, t in docs])
    pq.write_table(
        pa.table(
            {
                "rank": pa.array([r[0] for r in bm], pa.int32()),
                "left": pa.array([r[1] for r in bm], pa.string()),
                "right": pa.array([r[2] for r in bm], pa.string()),
            }
        ),
        os.path.join(FIXDIR, f"bpe_merges_{sf}.parquet"),
    )
    print(f"bpe_merges_{sf}.parquet: {len(bm)} merges")

    bp2 = bpe_pieces(docs, merges=bm)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in bp2], pa.int64()),
                "n_pieces": pa.array([r[1] for r in bp2], pa.int32()),
                "pieces_str": pa.array([r[2] for r in bp2], pa.string()),
            }
        ),
        os.path.join(FIXDIR, f"bpe_pieces_{sf}.parquet"),
    )
    print(f"bpe_pieces_{sf}.parquet: {len(bp2)} rows")

    pp = doc_perplexity(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in pp], pa.int64()),
                "n_tokens": pa.array([r[1] for r in pp], pa.int64()),
                "lp_micro": pa.array([r[2] for r in pp], pa.int64()),
                "ppl_micro": pa.array([r[3] for r in pp], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"doc_perplexity_{sf}.parquet"),
    )
    print(f"doc_perplexity_{sf}.parquet: {len(pp)} rows")

    cz = doc_compression(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in cz], pa.int64()),
                "n_bytes": pa.array([r[1] for r in cz], pa.int64()),
                "zlib_bytes": pa.array([r[2] for r in cz], pa.int64()),
                "compression_ppm": pa.array([r[3] for r in cz], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"doc_compression_{sf}.parquet"),
    )
    print(f"doc_compression_{sf}.parquet: {len(cz)} rows")

    ik = incremental_minhash_kept(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in ik], pa.int64()),
                "kept": pa.array([r[1] for r in ik], pa.bool_()),
            }
        ),
        os.path.join(FIXDIR, f"incremental_minhash_{sf}.parquet"),
    )
    print(f"incremental_minhash_{sf}.parquet: {len(ik)} rows "
          f"({sum(1 for _, k in ik if not k)} dropped)")

    htbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source"],
    )
    hc = hash_cross_buckets(
        list(
            zip(
                htbl["doc_id"].to_pylist(),
                htbl["lang"].to_pylist(),
                htbl["source"].to_pylist(),
            )
        )
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in hc], pa.int64()),
                "cross_bucket": pa.array([r[1] for r in hc], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, f"hash_cross_{sf}.parquet"),
    )
    print(f"hash_cross_{sf}.parquet: {len(hc)} rows")

    hv = hashed_vector_rows(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in hv], pa.int64()),
                "slot": pa.array([r[1] for r in hv], pa.int32()),
                "val": pa.array([r[2] for r in hv], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, f"hashed_features_{sf}.parquet"),
    )
    print(f"hashed_features_{sf}.parquet: {len(hv)} rows")

    n = make_shows_csv(os.path.join(FIXDIR, "shows_raw.csv"))
    print(f"shows_raw.csv: {n} rows")

    with open(os.path.join(FIXDIR, f".stamp_{sf}"), "w") as f:
        f.write(source_stamp(sf_dir))


if __name__ == "__main__":
    main()
