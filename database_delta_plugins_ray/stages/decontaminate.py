"""Benchmark decontamination: flag training documents that share any
word-level n-gram with an evaluation set.

The standard LLM corpus-prep pass (public method: GPT-3 appendix C /
PaLM-style 13-gram overlap decontamination); gram size is a parameter —
the synthetic test vocabulary is tiny, so the catalog query uses n=3 to
get a discriminative split, while a real deployment would use 8-13.

Scale design (100 TB corpus): the eval set is a fixed benchmark suite —
tiny relative to the corpus by construction. Its UNIQUE gram hashes are
reduced once (distributed partial-unique per batch, final unique on the
driver over a few MB), ``ray.put`` ONCE, and every corpus task tests
membership with a vectorized ``np.searchsorted`` against the shared
sorted array — no shuffle, no join; the corpus streams through a single
``map_batches``. Gram hashing is the polynomial token-hash combine from
``functions/text.py:ngram_hashes`` (no per-gram strings anywhere).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

#: membership rule for the synthetic eval split: doc_id % EVAL_MOD == 0
EVAL_MOD = 97


def eval_gram_hashes(docs, n: int = 3) -> np.ndarray:
    """Sorted unique n-gram hashes of the eval slice of ``docs`` (a Ray
    dataset with ``doc_id``/``text``). Per-batch partial unique keeps the
    driver reduce at O(unique grams), not O(grams)."""
    from ..functions.text import ngram_hashes

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["doc_id"] % EVAL_MOD == 0]
        h, _ = ngram_hashes(ev["text"].reset_index(drop=True), n)
        return pd.DataFrame({"h": np.unique(h)})

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    return np.unique(parts["h"].to_numpy(dtype=np.uint64))


def decontaminate(docs, eval_ref, n: int = 3):
    """Flag every NON-eval document of ``docs`` whose gram set intersects
    the broadcast eval gram set: returns ``(doc_id, contaminated)``.
    ``eval_ref`` is a ``ray.put`` handle to the sorted hash array."""
    import ray

    from ..functions.text import ngram_hashes

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % EVAL_MOD != 0]
        texts = df["text"].reset_index(drop=True)
        ev = ray.get(eval_ref)
        hit = np.zeros(len(df), dtype=np.int64)
        h, di = ngram_hashes(texts, n)
        if len(h) and len(ev):
            idx = np.searchsorted(ev, h)
            ok = (idx < len(ev)) & (ev[np.minimum(idx, len(ev) - 1)] == h)
            np.maximum.at(hit, di[ok], 1)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "contaminated": hit})

    return docs.map_batches(flag, batch_format="pandas")
