"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — the training-corpus op every LLM data pipeline runs
before token counting, packing, or budget mixing.

The scale split is the classic one (also how the public HuggingFace
``tokenizers`` word-level trainer works): BPE training only needs the
DISTINCT-WORD frequency histogram, never the corpus itself. So:

1. **Distributed word histogram** — one ``map_batches`` pass emits
   per-batch ``(word, count)`` partials (pandas ``value_counts`` over
   the shared lowercase tokenization), a vocabulary ``groupby`` folds
   them exactly. The exchange is bounded by distinct-words-per-batch,
   not rows; 100 TB of text folds to the (Zipf-bounded) vocabulary.
2. **Deterministic cap** — ``max_words`` keeps the top-V words by
   ``(-count, word)`` so the driver set is bounded at any corpus size.
   The cap drops only the histogram TAIL, whose pair-count mass is
   bounded by ``sum(tail counts × tail word lengths)`` — negligible
   under Zipf at V ≫ 10⁵ (and the cap is off by default at test scale,
   where training is EXACT).
3. **Driver merge loop** — pure-Python BPE over the word histogram:
   O(V · word_len) per merge, independent of corpus size. Tiebreak is
   total order (count DESC, pair ASC) so the merge table is
   bit-identical at any parallelism.
4. **Broadcast encode** — the learned merge ranks ship once via
   ``ray.put``; encoding memoizes per DISTINCT word within each batch
   (Zipf again: a 4k-row batch has far fewer distinct words than
   tokens), so the per-batch cost is distinct-words × merges, and the
   corpus pass stays embarrassingly parallel.

No counterpart in the reference (it replicates source rows, never
tokenizes); cited to the public paper only.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["word_histogram", "train_bpe", "encode_words", "encode_stats"]

#: end-of-word sentinel (Sennrich §3.2); kept out of TOKEN_RE's class so
#: it can never collide with a real character.
EOW = "</w>"


def word_histogram(ds, *, text_col: str = "text",
                   max_words: int | None = None) -> pd.DataFrame:
    """Exact distributed word-frequency histogram ``(word, cnt)`` of a
    documents Dataset, descending by ``(-cnt, word)``. ``max_words``
    caps the result deterministically (top-V under that total order).
    """
    from ray.data.aggregate import Sum

    import pyarrow as pa

    schema = pa.schema([("word", pa.string()), ("cnt", pa.int64())])

    def partial(df: pd.DataFrame) -> "pa.Table":
        from ..functions.text import _flat_lower_tokens

        flat, _, _ = _flat_lower_tokens(df[text_col].reset_index(drop=True))
        if not len(flat):  # one pinned Arrow schema for every block
            return schema.empty_table()
        vc = pd.Series(flat).value_counts()
        return pa.table({"word": vc.index.to_numpy(dtype=object),
                         "cnt": vc.to_numpy(dtype=np.int64)},
                        schema=schema)

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    hist = hist.sort_values(["cnt", "word"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    if max_words is not None:
        hist = hist.head(max_words).reset_index(drop=True)
    return hist


def _pair_counts(vocab: dict[tuple, int]) -> dict[tuple, int]:
    out: dict[tuple, int] = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            out[p] = out.get(p, 0) + freq
    return out


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(word_counts, num_merges: int) -> pd.DataFrame:
    """BPE merge table from a word histogram — ``(rank, left, right,
    freq)``, one row per learned merge, ``freq`` the pair count at the
    moment it was chosen. ``word_counts`` is a ``(word, cnt)`` frame
    (from :func:`word_histogram`) or a ``{word: count}`` dict.

    Deterministic: ties on pair count break to the lexicographically
    smallest ``(left, right)``. Stops early when no pair repeats
    (max count 1 never merges, matching the paper's "until no pair
    occurs more than once" cutoff for small corpora)."""
    if isinstance(word_counts, pd.DataFrame):
        items = zip(word_counts["word"].tolist(),
                    word_counts["cnt"].tolist())
    else:
        items = word_counts.items()
    vocab: dict[tuple, int] = {}
    for w, c in items:
        syms = tuple(w) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(c)

    ranks, lefts, rights, freqs = [], [], [], []
    for rank in range(num_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), freq = best
        if freq < 2:
            break
        joined = l + r
        vocab = {_merge_word(s, (l, r), joined): f
                 for s, f in vocab.items()}
        ranks.append(rank)
        lefts.append(l)
        rights.append(r)
        freqs.append(freq)
    return pd.DataFrame({
        "rank": pd.Series(ranks, dtype="int64"),
        "left": pd.Series(lefts, dtype=object),
        "right": pd.Series(rights, dtype=object),
        "freq": pd.Series(freqs, dtype="int64"),
    })


def _merge_ranks(merges: pd.DataFrame) -> dict[tuple, int]:
    return {(l, r): int(k) for l, r, k in
            zip(merges["left"], merges["right"], merges["rank"])}


def _encode_word(word: str, ranks: dict[tuple, int]) -> tuple:
    """Standard BPE encode: repeatedly apply the lowest-rank merge
    present (exactly reproduces training segmentation on seen words)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def encode_words(words, merges: pd.DataFrame) -> list[tuple]:
    """Encode an iterable of words; memoized per distinct word."""
    ranks = _merge_ranks(merges)
    cache: dict[str, tuple] = {}
    out = []
    for w in words:
        t = cache.get(w)
        if t is None:
            t = _encode_word(w, ranks)
            cache[w] = t
        out.append(t)
    return out


def encode_stats(texts: pd.Series, merges: pd.DataFrame) -> pd.DataFrame:
    """Per-document subword stats under a trained merge table:
    ``(n_words, n_subword_tokens, n_chars)`` — the corpus-compression
    view (tokens/word and chars/token follow). One distinct-word
    encode pass per batch; token totals come from a vectorized
    segment-sum over the word→doc index."""
    from ..functions.text import _flat_lower_tokens

    flat, doc_idx, lens = _flat_lower_tokens(texts.reset_index(drop=True))
    n = len(texts)
    n_tok = np.zeros(n, dtype=np.int64)
    if len(flat):
        ranks = _merge_ranks(merges)
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        per_uniq = np.fromiter(
            (len(_encode_word(w, ranks)) for w in uniq),
            dtype=np.int64, count=len(uniq))
        np.add.at(n_tok, doc_idx, per_uniq[inv])
    n_chars = texts.fillna("").str.len().to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "n_words": lens.astype(np.int64),
        "n_subword_tokens": n_tok,
        "n_chars": n_chars,
    })


def save_merges(merges: pd.DataFrame, path: str) -> None:
    """Persist a merge table as a JSON artifact (tmp+rename, same
    single-writer publish contract as every other persisted artifact
    in this repo)."""
    import json
    import os

    obj = {"format": "bpe-merges-v1",
           "merges": [[l, r, int(f)] for l, r, f in
                      zip(merges["left"], merges["right"],
                          merges["freq"])]}
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def load_merges(path: str, obj: dict | None = None) -> pd.DataFrame:
    import json

    if obj is None:
        with open(path) as fh:
            obj = json.load(fh)
    if obj.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a bpe-merges-v1 artifact: {path}")
    m = obj["merges"]
    return pd.DataFrame({
        "rank": pd.Series(range(len(m)), dtype="int64"),
        "left": pd.Series([x[0] for x in m], dtype=object),
        "right": pd.Series([x[1] for x in m], dtype=object),
        "freq": pd.Series([x[2] for x in m], dtype="int64"),
    })
