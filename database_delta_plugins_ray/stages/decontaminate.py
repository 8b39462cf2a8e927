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
Batches stay zero-copy Arrow: the eval-split mask is computed on the
int64 id column and applied with ``Table.filter``; only the text column
of the surviving rows is handed to the tokenizer.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: membership rule for the synthetic eval split: doc_id % EVAL_MOD == 0
EVAL_MOD = 97


def _eval_mask(t: pa.Table) -> np.ndarray:
    """Boolean eval-split membership per row, from the id column only."""
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    return did % EVAL_MOD == 0


def eval_gram_hashes(docs, n: int = 3) -> np.ndarray:
    """Sorted unique n-gram hashes of the eval slice of ``docs`` (a Ray
    dataset with ``doc_id``/``text``). Per-batch partial unique keeps the
    driver reduce at O(unique grams), not O(grams)."""
    from ..functions.text import ngram_hashes

    def partial(t: pa.Table) -> pa.Table:
        ev = t.filter(pa.array(_eval_mask(t)))
        h, _ = ngram_hashes(pd.Series(ev["text"].to_pylist()), n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.unique(parts["h"].to_numpy(dtype=np.uint64))


def decontaminate(docs, eval_ref, n: int = 3):
    """Flag every NON-eval document of ``docs`` whose gram set intersects
    the broadcast eval gram set: returns ``(doc_id, contaminated)``.
    ``eval_ref`` is a ``ray.put`` handle to the sorted hash array."""
    import ray

    from ..functions.text import ngram_hashes

    def flag(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(~_eval_mask(t)))
        ev = ray.get(eval_ref)
        hit = np.zeros(t.num_rows, dtype=np.int64)
        h, di = ngram_hashes(pd.Series(t["text"].to_pylist()), n)
        if len(h) and len(ev):
            idx = np.searchsorted(ev, h)
            ok = (idx < len(ev)) & (ev[np.minimum(idx, len(ev) - 1)] == h)
            np.maximum.at(hit, di[ok], 1)
        return pa.table({"doc_id": t["doc_id"],
                         "contaminated": pa.array(hit)})

    return docs.map_batches(flag, batch_format="pyarrow")
