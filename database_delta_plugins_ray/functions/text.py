"""Text-analysis kernels for large-scale training-data pipelines.

All functions are batch-vectorized (numpy / pandas.str) or cheap per-row
primitives composed inside ``map_batches``. Stateful pieces (compiled
regexes, stopword tables) live in actor ``__init__`` when used as pool
stages (see stages/textstage.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
WS_RE = re.compile(r"\s+")

#: tiny per-language stopword tables for the n-gram/stopword language-ID
#: heuristic (public-knowledge word lists).
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on",
           "with", "as", "this", "was", "are", "be", "at", "by", "or"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "von", "auf", "für", "im", "dem", "sich", "des"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "se",
           "del", "las", "por", "con", "para", "su", "al", "lo", "como"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "par", "plus", "avec"},
    "zh": set(),  # han-script detection handles zh
}


def token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace/word tokens per document (vectorized regex count)."""
    return texts.str.count(TOKEN_RE.pattern).to_numpy(dtype=np.int64)


def bpe_ish_token_counts(texts: pd.Series) -> np.ndarray:
    """BPE-ish proxy: word tokens + punctuation marks each count as a token
    (a common pre-tokenizer split), deterministic and vectorized."""
    words = texts.str.count(r"[A-Za-z0-9_]+")
    punct = texts.str.count(r"[^\sA-Za-z0-9_]")
    return (words + punct).to_numpy(dtype=np.int64)


def fingerprint(texts: pd.Series) -> pd.Series:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (stable across runs/processes; SQL-expressible for the oracle)."""
    norm = texts.str.lower().str.replace(WS_RE.pattern, " ", regex=True).str.strip()
    return norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())


_LANG_PATTERNS = {
    l: r"\b(?:" + "|".join(sorted(ws)) + r")\b"
    for l, ws in STOPWORDS.items() if ws
}


def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: han-script ratio -> zh; else argmax stopword
    hit-rate over the per-language tables; 'und' when nothing matches.
    Fully vectorized: one ``str.count`` per language over the batch (the
    stopword alternation regex), no per-document Python loop."""
    low = texts.str.lower()
    n_tokens = low.str.count(TOKEN_RE.pattern).to_numpy(dtype=np.int64)
    n = np.maximum(1, n_tokens)
    han = texts.str.count(r"[一-鿿]").to_numpy(dtype=np.int64)
    langs = list(_LANG_PATTERNS)
    rates = np.stack(
        [low.str.count(_LANG_PATTERNS[l]).to_numpy(dtype=np.float64) / n
         for l in langs]
    )  # (langs, docs)
    best_idx = rates.argmax(axis=0)  # first max wins, same as the scan order
    best_r = rates[best_idx, np.arange(rates.shape[1])]
    best_lang = np.array(langs, dtype=object)[best_idx]
    out = np.where(best_r >= 0.05, best_lang, "und")
    out = np.where((han > 0) & (han >= n), "zh", out)
    return pd.Series(out, index=texts.index)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features: length, token count, mean word length,
    punctuation ratio, stopword(en) ratio, alpha ratio, and a composite
    score in [0,1] (Gopher/C4-style rule-of-thumb filters)."""
    n_chars = texts.str.len().to_numpy(dtype=np.int64)
    n_tokens = token_counts(texts)
    n_punct = texts.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    n_alpha = texts.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    low = texts.str.lower()
    safe_tokens = np.maximum(1, n_tokens)
    # vectorized: stopword hits via one alternation-regex count; mean word
    # length = total word chars / token count (tokens are maximal \w+ runs)
    stop_ratio = (low.str.count(_LANG_PATTERNS["en"]).to_numpy(dtype=np.float64)
                  / safe_tokens)
    word_chars = texts.str.count(r"[A-Za-z0-9_]").to_numpy(dtype=np.int64)
    mean_word_len = np.where(n_tokens > 0, word_chars / safe_tokens, 0.0)
    punct_ratio = n_punct / np.maximum(1, n_chars)
    alpha_ratio = n_alpha / np.maximum(1, n_chars)
    score = (
        np.clip(n_tokens / 50.0, 0, 1) * 0.3
        + np.clip((mean_word_len - 2) / 6.0, 0, 1) * 0.2
        + (1 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
        + np.clip(alpha_ratio * 1.2, 0, 1) * 0.2
        + np.clip(stop_ratio * 5, 0, 1) * 0.1
    )

    def r4(x: np.ndarray) -> np.ndarray:
        # explicit half-up on the double (floor(x*1e4+0.5)/1e4): the SQL
        # oracle uses the LITERAL same expression, so both sides make the
        # identical representability-edge decisions — np.round (scaled
        # rint) and DuckDB round_even diverge on values like 0.65975 whose
        # double sits just below the true decimal half
        return np.floor(x * 10000.0 + 0.5) / 10000.0

    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_word_len": r4(mean_word_len),
            "punct_ratio": r4(punct_ratio),
            "stop_ratio": r4(stop_ratio),
            "alpha_ratio": r4(alpha_ratio),
            "quality_score": r4(score),
        },
        index=texts.index,
    )


# ---------------------------------------------------------------------------
# shingling / sketches (dedup building blocks)
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique 64-bit hashes of word n-gram shingles (vectorized
    siphash over the gram strings)."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    h = pd.util.hash_array(np.array(grams, dtype=object), hash_key="shingle_hashkey0")
    return np.unique(h)


_MERSENNE = np.uint64((1 << 61) - 1)


def _rot64(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint64(k)
    with np.errstate(over="ignore"):
        return (x << k) | (x >> (np.uint64(64) - k))


def shingle_hashes_concat(
    texts: pd.Series, n: int = 3
) -> tuple[np.ndarray, np.ndarray, int]:
    """Batch shingling with NO per-document hashing calls: tokenize the
    whole batch, hash every token in ONE pd.util.hash_array pass, and
    combine each length-``n`` window with xor-of-rotations (no uint64
    multiplies — the slow op class on this host). Returns
    ``(gram_hashes, gram_doc_idx, n_docs)`` in concatenated form for the
    OPH signature kernel. Docs shorter than ``n`` contribute one gram over
    all their tokens (shingle_hashes' short-doc rule); empty docs none."""
    flat, doc_idx, lens = _flat_lower_tokens(texts)
    n_docs = len(texts)
    total = len(flat)
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), n_docs)
    th = pd.util.hash_array(flat, hash_key="shingle_hashkey0").astype(np.uint64)
    if n <= 1:
        return th, doc_idx, n_docs
    m = total - n + 1
    if m > 0:
        g = _rot64(th[:m], 17)
        for j in range(1, n):
            g = g ^ _rot64(th[j:j + m], (17 * (j + 1)) % 63 + 1)
        valid = doc_idx[:m] == doc_idx[n - 1:]
        grams = [g[valid]]
        gram_doc = [doc_idx[:m][valid]]
    else:
        grams, gram_doc = [], []
    # short docs (0 < len < n): one gram over all their tokens
    short = np.flatnonzero((lens > 0) & (lens < n))
    if len(short):
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        sg = np.empty(len(short), dtype=np.uint64)
        for i, di in enumerate(short):
            seg = th[starts[di]:starts[di + 1]]
            acc = _rot64(seg[:1], 17)[0]
            for j in range(1, len(seg)):
                acc ^= _rot64(seg[j:j + 1], (17 * (j + 1)) % 63 + 1)[0]
            sg[i] = acc
        grams.append(sg)
        gram_doc.append(short)
    gh = np.concatenate(grams) if grams else np.empty(0, np.uint64)
    gd = np.concatenate(gram_doc) if gram_doc else np.empty(0, np.int64)
    order = np.argsort(gd, kind="stable")
    return gh[order], gd[order], n_docs


def oph_signatures_concat(
    gram_hashes: np.ndarray, gram_doc: np.ndarray, n_docs: int,
    num_perm: int = 64,
) -> np.ndarray:
    """One-Permutation-Hashing signatures straight from concatenated gram
    hashes (see minhash_signature_many for the scheme); min over a multiset
    equals min over the set, so no per-doc dedup is needed."""
    assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of two"
    FULL = np.iinfo(np.uint64).max
    sig = np.full((n_docs, num_perm), FULL, dtype=np.uint64)
    if len(gram_hashes) == 0:
        return sig
    shift = np.uint64(64 - int(np.log2(num_perm)))
    bins = (gram_hashes >> shift).astype(np.int64)
    np.minimum.at(sig.reshape(-1), gram_doc * num_perm + bins, gram_hashes)
    empty = sig == FULL
    if empty.any():
        for k in range(1, num_perm):
            rolled = np.roll(sig, -k, axis=1)
            fill = empty & (rolled != FULL)
            sig[fill] = rolled[fill]
            empty &= ~fill
            if not empty.any():
                break
    return sig


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _mersenne_fold(hv: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) without division: fold high bits onto low bits.
    Integer division/modulo on uint64 is pathologically slow on this host
    (software div + steal time, 100x+ the cost of shifts); the fold is
    exact for the Mersenne modulus and all-shift/add. In-place on ``hv``."""
    lo = hv & _MERSENNE
    hv >>= np.uint64(61)
    hv += lo
    np.subtract(hv, _MERSENNE, out=hv, where=hv >= _MERSENNE)
    return hv


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values over the shingle hash set (universal hashing
    modulo a Mersenne prime, division-free)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hv = sh.astype(np.uint64)[:, None] * a[None, :]
        hv += b[None, :]
        hv = _mersenne_fold(hv)
    return hv.min(axis=0)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """LSH band hashes: split the signature into ``bands`` rows-per-band
    groups and hash each group to 64 bits."""
    return band_hashes_matrix(sig.reshape(1, -1), bands)[0]


def band_hashes_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized band hashes for a (n_docs, num_perm) signature matrix ->
    (n_docs, bands) uint64 (polynomial mix over each band's values)."""
    n, p = sigs.shape
    r = p // bands
    s = sigs[:, : bands * r].reshape(n, bands, r).astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.full((n, bands), np.uint64(0xCBF29CE484222325))
        for j in range(r):
            acc = (acc ^ s[:, :, j]) * np.uint64(0x100000001B3)
            acc ^= acc >> np.uint64(29)
    return acc


def minhash_signature_many(
    shingle_sets: list[np.ndarray], num_perm: int = 64
) -> np.ndarray:
    """Batch minhash signatures via One-Permutation Hashing (Li et al.,
    NIPS 2012) with rotation densification (Shrivastava & Li, ICML 2014):
    each shingle's single 64-bit hash selects a bin by its top bits; the
    signature is the per-bin minimum; empty bins borrow the nearest
    non-empty bin to their right (cyclic).

    O(total_shingles) shifts/mins — NO per-permutation multiply. The
    classic (a*x+b) K-permutation scheme costs num_perm uint64 multiplies
    per shingle, and uint64 multiply is pathologically slow on this host
    (~100x; measured 16s for 12M ops); OPH removes that term entirely.
    The bin-match rate between two signatures estimates Jaccard exactly
    like K-permutation agreement does. NOTE: NOT row-compatible with the
    per-doc K-permutation ``minhash_signature`` — use one scheme per
    pipeline (MinHasher uses this one)."""
    num_perm = int(num_perm)
    assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of two"
    n_docs = len(shingle_sets)
    FULL = np.iinfo(np.uint64).max
    sig = np.full((n_docs, num_perm), FULL, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    if lens.sum() == 0:
        return sig
    cat = np.concatenate([s for s in shingle_sets if len(s)]).astype(np.uint64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    shift = np.uint64(64 - int(np.log2(num_perm)))
    bins = (cat >> shift).astype(np.int64)
    np.minimum.at(sig.reshape(-1), doc_idx * num_perm + bins, cat)
    empty = sig == FULL
    if empty.any():
        for k in range(1, num_perm):
            rolled = np.roll(sig, -k, axis=1)
            fill = empty & (rolled != FULL)
            sig[fill] = rolled[fill]
            empty &= ~fill
            if not empty.any():
                break
    return sig


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash of one document (unweighted unique word tokens)."""
    return int(simhash64_many(pd.Series([text]))[0])


def simhash64_many(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit SimHash for a batch of documents: hash every
    (doc, unique-token) pair in ONE pd.util.hash_array call, expand to a
    sign matrix with numpy bit ops, and segment-sum per document with
    np.add.reduceat — no per-token Python in the hash or accumulate path."""
    flat, doc_idx, _ = _flat_lower_tokens(texts)
    out = np.zeros(len(texts), dtype=np.uint64)
    if len(flat) == 0:
        return out
    hashed = pd.util.hash_array(flat, hash_key="simhash_hashkey0")  # 16 bytes
    # unique tokens per document (SimHash over the token SET)
    uniq = pd.DataFrame({"d": doc_idx, "h": hashed}).drop_duplicates()
    d = uniq["d"].to_numpy()
    h = np.ascontiguousarray(uniq["h"].to_numpy(dtype=np.uint64))
    # bit expansion via byte views + unpackbits (C speed) — a 64-wide
    # uint64 broadcast shift is pathologically slow on this host (same
    # class of trap as the minhash multiply)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)
    # segment sums via cumsum + gather-diff: np.add.reduceat on a 2-D
    # array is ~100x slower than one cumsum pass (measured 13.9s vs
    # <0.2s for 270k x 64)
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    ends = np.r_[starts[1:], len(d)] - 1
    cs = np.cumsum(bits, axis=0, dtype=np.int32)
    g = cs[ends]
    acc = np.empty_like(g)
    acc[0] = g[0]
    np.subtract(g[1:], g[:-1], out=acc[1:])  # ones per segment per bit
    seg_len = (ends - starts + 1).astype(np.int32)
    # simhash bit set when set-bits outnumber clear-bits in the segment
    maj = (2 * acc > seg_len[:, None]).astype(np.uint8)
    packed = np.packbits(maj, axis=1)
    vals = np.ascontiguousarray(packed).view(np.uint64).reshape(-1)
    out[d[starts]] = vals
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# PII-style redaction (RE2-compatible patterns; DuckDB regexp_replace parity)
# ---------------------------------------------------------------------------

#: RE2-safe patterns — pyarrow.compute's regex kernels and DuckDB both run
#: RE2, so replace/count semantics match the SQL oracle exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_redact(texts) -> "pd.DataFrame":
    """Scrub emails then phone numbers from ``texts`` (a pandas Series or
    pyarrow array of strings), returning columns ``(redacted,
    n_redactions)``.

    Counting mirrors the replacement order: emails counted on the
    original text, phones counted AFTER email redaction (so digits
    inside an address are never double-counted). All four kernels are
    vectorized Arrow RE2 calls — no Python per-row loop.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string()) if not isinstance(
        texts, (pa.Array, pa.ChunkedArray)) else texts
    n_email = pc.count_substring_regex(arr, EMAIL_RE)
    no_email = pc.replace_substring_regex(arr, EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(no_email, PHONE_RE)
    redacted = pc.replace_substring_regex(no_email, PHONE_RE, "<PHONE>")
    n = pc.add(n_email, n_phone).cast(pa.int64())
    return pd.DataFrame(
        {"redacted": redacted.to_pandas(), "n_redactions": n.to_pandas()}
    )


# ---------------------------------------------------------------------------
# n-gram overlap (decontamination) + repetition statistics (Gopher-style)
# ---------------------------------------------------------------------------

#: pd.util.hash_array key (must be exactly 16 bytes) shared by the gram /
#: repetition kernels so hashes agree across batches, actors and processes.
_GRAM_HASH_KEY = "gramstats_hshky0"
#: odd multiplier for the polynomial n-gram combine (wrapping uint64):
#: equal token sequences hash equal; distinct ones collide w.p. ~2^-64.
_GRAM_P = np.uint64(0x9E3779B97F4A7C15)


def _flat_lower_tokens(texts: pd.Series):
    """Tokenize a batch into one flat object array of lowercased word
    tokens plus the owning-doc index per token (the shared layout the
    simhash / shingle / repetition / gram kernels segment-reduce over).
    Null/None texts contribute zero tokens."""
    toks = texts.str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for ts in toks:
        k = len(ts) if isinstance(ts, list) else 0
        if k:
            flat[pos:pos + k] = ts
        pos += k
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return flat, doc_idx, lens


def ngram_hashes(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word-level n-gram hashes of a batch: ``(hashes uint64,
    doc_idx int64)``. One ``pd.util.hash_array`` pass over the tokens,
    then a vectorized polynomial combine over ``n`` shifted views — no
    per-gram string building, no Python loop over grams."""
    flat, doc_idx, _ = _flat_lower_tokens(texts)
    m = len(flat) - n + 1
    if len(flat) == 0 or m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
    # a gram starting at i is real only if it stays inside one document
    valid = doc_idx[:m] == doc_idx[n - 1:]
    h = th[:m].copy()
    for k in range(1, n):
        h = h * _GRAM_P + th[k:k + m]
    return h[valid], doc_idx[:m][valid]


def chunk_layout(texts: pd.Series, chunk: int):
    """Token layout for fixed-size passage chunking: ``(flat tokens,
    doc_idx, off)`` where ``off`` is each token's offset within its own
    document (so ``off // chunk`` is its passage index)."""
    flat, doc_idx, lens = _flat_lower_tokens(texts)
    if len(flat) == 0:
        return flat, doc_idx, np.empty(0, np.int64), lens
    doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    off = np.arange(len(flat), dtype=np.int64) - np.repeat(doc_starts, lens)
    return flat, doc_idx, off, lens


def chunk_hashes(texts: pd.Series, chunk: int):
    """Hash every non-overlapping ``chunk``-token passage of a batch:
    ``(hashes uint64, doc_idx int64, pos int64)``. Position-weighted
    token-hash sum (token j of a passage contributes ``hash * P^j``),
    segment-reduced with one ``np.add.reduceat`` over the contiguous
    passage runs — equal token sequences hash equal, distinct ones
    collide w.p. ~2^-64; no per-passage strings or Python loops."""
    flat, doc_idx, off, _ = chunk_layout(texts, chunk)
    if len(flat) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
    pows = np.empty(chunk, dtype=np.uint64)
    pows[0] = 1
    for k in range(1, chunk):
        pows[k] = pows[k - 1] * _GRAM_P
    vals = th * pows[off % chunk]
    cstarts = np.flatnonzero(off % chunk == 0)
    h = np.add.reduceat(vals, cstarts)
    return h, doc_idx[cstarts], off[cstarts] // chunk


def repetition_stats(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style per-document repetition features (Rae et al. 2021,
    "Scaling Language Models", table A1 repetition filters — public
    paper): most-frequent-token count and duplicate-bigram count, plus
    the filter flag ``5*top_token_n > n_tokens OR 4*dup_bigram_n >
    n_bigrams``. Integer outputs only, so the DuckDB oracle matches
    hash-exactly. Vectorized: one token-hash pass + two C-level pandas
    groupbys per batch."""
    flat, doc_idx, lens = _flat_lower_tokens(texts)
    nd = len(texts)
    top = np.zeros(nd, np.int64)
    dup = np.zeros(nd, np.int64)
    n_big = np.maximum(lens - 1, 0)
    if len(flat):
        th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
        c = (pd.DataFrame({"d": doc_idx, "h": th})
             .groupby(["d", "h"], sort=False).size())
        tmax = c.groupby(level=0).max()
        top[tmax.index.to_numpy()] = tmax.to_numpy()
        if len(th) >= 2:
            valid = doc_idx[:-1] == doc_idx[1:]
            if valid.any():
                bh = th[:-1][valid] * _GRAM_P + th[1:][valid]
                bd = doc_idx[:-1][valid]
                distinct = (pd.DataFrame({"d": bd, "h": bh})
                            .groupby("d", sort=False)["h"].nunique())
                di = distinct.index.to_numpy()
                dup[di] = n_big[di] - distinct.to_numpy()
    flagged = ((5 * top > lens) | (4 * dup > n_big)).astype(np.int64)
    return pd.DataFrame({
        "n_tokens": lens, "top_token_n": top,
        "n_bigrams": n_big, "dup_bigram_n": dup, "flagged": flagged,
    })


def compression_stats(texts: pd.Series) -> pd.DataFrame:
    """zlib compression-ratio quality signal (the Dolma / RedPajama-v2
    `ccnet`-family heuristic — public pipelines): highly compressible
    text is boilerplate/repetitive, near-incompressible text is
    noise/binary-like. One C-level ``zlib.compress`` call per document
    (inherently per-row, like model inference — not a Python hot loop
    over tokens); level pinned at 6 so the byte counts are
    deterministic across runs and platforms. Integer outputs
    (n_bytes, n_zbytes) plus the flag rule
    ``100*n_zbytes < 25*n_bytes OR 100*n_zbytes > 70*n_bytes``
    (ratio < 0.25 or > 0.70), kept in integer space — natural prose
    sits ~0.30-0.55 under zlib-6; boilerplate repetition falls below
    0.25 and base64/noise-like text rises above 0.70."""
    import zlib

    raw = [t.encode("utf-8", "surrogatepass") for t in texts]
    n_bytes = np.fromiter((len(b) for b in raw), np.int64, len(raw))
    n_z = np.fromiter(
        (len(zlib.compress(b, 6)) for b in raw), np.int64, len(raw))
    flagged = (((100 * n_z < 25 * n_bytes) | (100 * n_z > 70 * n_bytes))
               & (n_bytes > 0)).astype(np.int64)
    return pd.DataFrame({
        "n_bytes": n_bytes, "n_zbytes": n_z, "flagged": flagged,
    })
