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


def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: han-script ratio -> zh; else argmax stopword
    hit-rate over the per-language tables; 'und' when nothing matches."""
    toks = texts.str.lower().str.findall(TOKEN_RE)
    han = texts.str.count(r"[一-鿿]")
    out = []
    langs = [l for l in STOPWORDS if l != "zh"]
    for ts, h in zip(toks, han):
        if h and h >= max(1, len(ts)):
            out.append("zh")
            continue
        n = max(1, len(ts))
        best, best_r = "und", 0.0
        for l in langs:
            r = sum(1 for t in ts if t in STOPWORDS[l]) / n
            if r > best_r:
                best, best_r = l, r
        out.append(best if best_r >= 0.05 else "und")
    return pd.Series(out, index=texts.index)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features: length, token count, mean word length,
    punctuation ratio, stopword(en) ratio, alpha ratio, and a composite
    score in [0,1] (Gopher/C4-style rule-of-thumb filters)."""
    n_chars = texts.str.len().to_numpy(dtype=np.int64)
    n_tokens = token_counts(texts)
    n_punct = texts.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    n_alpha = texts.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    toks = texts.str.lower().str.findall(TOKEN_RE)
    sw = STOPWORDS["en"]
    stop_ratio = np.array(
        [sum(1 for t in ts if t in sw) / max(1, len(ts)) for ts in toks]
    )
    safe_tokens = np.maximum(1, n_tokens)
    mean_word_len = np.array(
        [np.mean([len(t) for t in ts]) if ts else 0.0 for ts in toks]
    )
    punct_ratio = n_punct / np.maximum(1, n_chars)
    alpha_ratio = n_alpha / np.maximum(1, n_chars)
    score = (
        np.clip(n_tokens / 50.0, 0, 1) * 0.3
        + np.clip((mean_word_len - 2) / 6.0, 0, 1) * 0.2
        + (1 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
        + np.clip(alpha_ratio * 1.2, 0, 1) * 0.2
        + np.clip(stop_ratio * 5, 0, 1) * 0.1
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_word_len": mean_word_len.round(4),
            "punct_ratio": punct_ratio.round(4),
            "stop_ratio": stop_ratio.round(4),
            "alpha_ratio": alpha_ratio.round(4),
            "quality_score": score.round(4),
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


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values over the shingle hash set (universal hashing
    modulo a Mersenne prime)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hv = sh.astype(np.uint64)[:, None] * a[None, :]
        hv += b[None, :]
        hv %= _MERSENNE
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
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Vectorized minhash for many documents at once: one matmul-shaped
    pass over the concatenated shingles + segmented min (np.minimum.reduceat)
    instead of a per-document loop."""
    num_perm = len(a)
    n_docs = len(shingle_sets)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    cat = np.concatenate([s for s in shingle_sets if len(s)]).astype(np.uint64)
    # in-place ops: the naive expression allocates large temporaries, which
    # is pathologically slow on this host (allocation-bound, 100x+)
    with np.errstate(over="ignore"):
        hv = cat[:, None] * a[None, :]
        hv += b[None, :]
        hv %= _MERSENNE
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    mins = np.minimum.reduceat(hv, offsets, axis=0)
    out[nonempty] = mins
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unweighted)."""
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in set(toks):
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        ))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
