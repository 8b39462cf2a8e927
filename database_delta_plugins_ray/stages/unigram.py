"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization", arXiv:1804.10959; the SentencePiece unigram trainer,
Kudo & Richardson 2018, arXiv:1808.06226) — the other major subword
tokenizer family beside BPE (``stages/bpe.py``), trained by EM over a
piece vocabulary instead of greedy pair merges.

Scale design (same split as the BPE module): unigram training only needs
the DISTINCT-WORD frequency histogram, never the corpus — so every
corpus-sized pass is the one histogram fold, and the EM loop runs over a
vocabulary-bounded Dataset:

1. **Word histogram** — ``stages.bpe.word_histogram``'s map_batches +
   groupby fold, kept as a MATERIALIZED Ray Dataset (bounded by distinct
   words under Zipf, not rows) so the EM rounds re-scan it for free.
2. **Distributed seeding** — one pass over the histogram emits per-batch
   ``(substring, cnt)`` partials for every substring up to
   ``max_piece_len``; a piece groupby folds them exactly; the top
   ``seed_size`` by ``(-score, piece)`` is taken with a per-block
   partial-top-k (exact: post-groupby blocks hold disjoint pieces) so
   the driver never sees the full substring histogram. Every single
   character is force-included and is NEVER pruned (guarantees every
   word stays segmentable).
3. **Distributed E-step, exact at any parallelism** — piece log-probs
   broadcast once per iteration (``ray.put``); each batch runs the
   forward-backward lattice per distinct word (pure-scalar math — the
   per-word loop is bounded by distinct words, the same Zipf argument
   as BPE's memoized encode) and quantizes each word's expected piece
   counts to fixed-point int64 (``round(e · cnt · 2^20)``), so the
   piece groupby fold is EXACT integer addition — training is
   bit-identical at any parallelism (the DSIR trick, ``sample.py``).
4. **Driver M-step + prune** — O(vocab) float math on the driver:
   re-estimate log-probs from the folded counts, then shrink the
   multi-char vocabulary by ``(-count, piece)`` toward ``vocab_size``
   (shrink factor per round, chars kept). This is the public
   SentencePiece structure with the expected-count prune criterion (a
   documented simplification of Kudo's per-piece likelihood-loss
   prune; deterministic, total-ordered).
5. **Viterbi encode** — max-prob segmentation with a deterministic
   tiebreak, memoized per distinct word per batch; unknown characters
   map to ``<unk>``.

No counterpart in the reference (it replicates rows, never tokenizes);
cited to the public papers only.
"""
from __future__ import annotations

import os
import math

import numpy as np
import pandas as pd

__all__ = ["train_unigram", "unigram_encode_words", "unigram_encode_stats"]

#: fixed-point scale for expected counts (2^20, matching sample.py's DSIR)
SCALE = 1 << 20
UNK = "<unk>"


# ---------------------------------------------------------------------------
# lattice forward-backward (pure scalar math: deterministic everywhere)
# ---------------------------------------------------------------------------


def _logadd(a: float | None, b: float | None) -> float | None:
    if a is None:
        return b
    if b is None:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _edges(word: str, vocab: dict[str, int], max_len: int):
    """Lattice edges: ``edges[i]`` = list of ``(j, piece_id)`` for every
    vocab piece matching ``word[i:j]``."""
    n = len(word)
    out: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for i in range(n):
        top = min(max_len, n - i)
        for ln in range(1, top + 1):
            pid = vocab.get(word[i:i + ln])
            if pid is not None:
                out[i].append((i + ln, pid))
    return out


def _word_expected(word: str, vocab: dict[str, int], logp: list[float],
                   max_len: int) -> tuple[dict[int, float], float | None]:
    """Expected piece counts for one word under the current model plus
    the word's log-evidence ``log Z``; ``(None, None)`` counts for an
    unsegmentable word (impossible once all chars are in the vocab)."""
    n = len(word)
    if n == 0:
        return {}, 0.0
    edges = _edges(word, vocab, max_len)
    alpha: list[float | None] = [None] * (n + 1)
    alpha[0] = 0.0
    for i in range(n):
        ai = alpha[i]
        if ai is None:
            continue
        for j, pid in edges[i]:
            alpha[j] = _logadd(alpha[j], ai + logp[pid])
    z = alpha[n]
    if z is None:
        return {}, None
    beta: list[float | None] = [None] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = None
        for j, pid in edges[i]:
            bj = beta[j]
            if bj is not None:
                acc = _logadd(acc, logp[pid] + bj)
        beta[i] = acc
    exp_counts: dict[int, float] = {}
    for i in range(n):
        ai = alpha[i]
        if ai is None:
            continue
        for j, pid in edges[i]:
            bj = beta[j]
            if bj is None:
                continue
            e = math.exp(ai + logp[pid] + bj - z)
            exp_counts[pid] = exp_counts.get(pid, 0.0) + e
    return exp_counts, z


# ---------------------------------------------------------------------------
# distributed training
# ---------------------------------------------------------------------------


def _seed_pieces(hist_ds, *, max_piece_len: int, seed_size: int) -> pd.DataFrame:
    """Substring-frequency seeding over the word-histogram Dataset:
    ``(piece, score)`` for the top ``seed_size`` substrings by
    ``(-score, piece)`` UNION every single character (force-included).
    Exact: the per-block top-k runs after the piece groupby, where
    blocks hold disjoint pieces."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    schema = pa.schema([("piece", pa.string()), ("score", pa.int64())])

    def partial(df: pd.DataFrame) -> "pa.Table":
        acc = _seed_acc(df["word"], df["cnt"], max_piece_len)
        if not acc:
            return schema.empty_table()
        return pa.table({"piece": list(acc), "score": list(acc.values())},
                        schema=schema)

    folded = (hist_ds.map_batches(partial, batch_format="pandas")
              .groupby("piece").aggregate(Sum("score", alias_name="score")))

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "piece"], ascending=[False, True],
                            kind="mergesort")
        keep = df.head(seed_size)
        chars = df[df["piece"].str.len() == 1]
        return (pd.concat([keep, chars])
                .drop_duplicates("piece").reset_index(drop=True))

    cand = folded.map_batches(topk_block, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["score", "piece"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    is_char = cand["piece"].str.len() == 1
    head = cand.head(seed_size)
    out = (pd.concat([head, cand[is_char]])
           .drop_duplicates("piece").reset_index(drop=True))
    return out[["piece", "score"]]


def _seed_acc(words, cnts, max_piece_len: int) -> dict:
    """Shared substring-count kernel of the seeding pass."""
    acc: dict[str, int] = {}
    for w, c in zip(words, cnts):
        c = int(c)
        n = len(w)
        for i in range(n):
            top = min(max_piece_len, n - i)
            for ln in range(1, top + 1):
                p = w[i:i + ln]
                acc[p] = acc.get(p, 0) + c
    return acc


def _seed_pieces_local(hist: pd.DataFrame, *, max_piece_len: int,
                       seed_size: int) -> pd.DataFrame:
    """Driver-local seeding over a small histogram — same kernel and
    the same (-score, piece) cap + forced-chars rule as the
    distributed path (the per-block top-k there is only a pruning
    optimization), so results are identical."""
    acc = _seed_acc(hist["word"], hist["cnt"], max_piece_len)
    cand = pd.DataFrame({
        "piece": np.array(list(acc), dtype=object),
        "score": np.fromiter(acc.values(), np.int64, len(acc))})
    cand = cand.sort_values(["score", "piece"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    is_char = cand["piece"].str.len() == 1
    out = (pd.concat([cand.head(seed_size), cand[is_char]])
           .drop_duplicates("piece").reset_index(drop=True))
    return out[["piece", "score"]]


def _e_acc(words, cnts, vocab: dict, logp: list[float],
           max_piece_len: int) -> dict:
    """Shared E-step kernel: fixed-point expected counts per piece id."""
    acc: dict[int, int] = {}
    for w, c in zip(words, cnts):
        ec, _ = _word_expected(w, vocab, logp, max_piece_len)
        c = int(c)
        for pid, e in ec.items():
            q = int(math.floor(e * c * SCALE + 0.5))
            if q:
                acc[pid] = acc.get(pid, 0) + q
    return acc


def _e_step_local(hist: pd.DataFrame, pieces: list[str],
                  logp: list[float], max_piece_len: int) -> np.ndarray:
    """Driver-local E-step over a small histogram — identical int64
    sums as the distributed fold (integer addition is order-free)."""
    vocab = {p: i for i, p in enumerate(pieces)}
    acc = _e_acc(hist["word"], hist["cnt"], vocab, logp, max_piece_len)
    out = np.zeros(len(pieces), dtype=np.int64)
    for pid, q in acc.items():
        out[pid] = q
    return out


def _e_step(hist_ds, pieces: list[str], logp: list[float],
            max_piece_len: int) -> np.ndarray:
    """One distributed E-step: fixed-point int64 expected counts per
    piece, folded exactly by a piece-id groupby."""
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    vocab = {p: i for i, p in enumerate(pieces)}
    model_ref = ray.put((vocab, list(logp)))
    schema = pa.schema([("pid", pa.int32()), ("q", pa.int64())])

    def partial(df: pd.DataFrame) -> "pa.Table":
        vb, lp = ray.get(model_ref)
        acc = _e_acc(df["word"], df["cnt"], vb, lp, max_piece_len)
        if not acc:
            return schema.empty_table()
        return pa.table({"pid": np.fromiter(acc, dtype=np.int32,
                                            count=len(acc)),
                         "q": np.fromiter(acc.values(), dtype=np.int64,
                                          count=len(acc))},
                        schema=schema)

    folded = (hist_ds.map_batches(partial, batch_format="pandas")
              .groupby("pid").aggregate(Sum("q", alias_name="q"))
              .to_pandas())
    out = np.zeros(len(pieces), dtype=np.int64)
    if len(folded):
        out[folded["pid"].to_numpy()] = folded["q"].to_numpy()
    return out


def train_unigram(ds, *, text_col: str = "text", vocab_size: int = 256,
                  seed_size: int | None = None, max_piece_len: int = 8,
                  em_iters: int = 2, shrink: float = 0.75,
                  max_words: int | None = None) -> pd.DataFrame:
    """Train a unigram-LM piece vocabulary over a documents Dataset.

    Returns ``(piece, q_count, logprob)`` sorted by ``(-q_count,
    piece)`` — ``q_count`` the fixed-point expected count from the
    final E-step (exact int64, hence bit-identical at any parallelism),
    ``logprob`` the model's final piece log-probability (a pure
    function of the q-vector, computed once on the driver)."""
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    if seed_size is None:
        seed_size = 4 * vocab_size

    # 1) corpus -> distinct-word histogram, kept DISTRIBUTED (the driver
    # never holds it — unlike BPE, whose merge loop is driver-side by
    # design): one map_batches pass of per-batch value_counts partials,
    # one exact word groupby, materialized once so the EM rounds re-scan
    # cached vocabulary-sized blocks instead of the corpus.
    wschema = pa.schema([("word", pa.string()), ("cnt", pa.int64())])

    def wpartial(df: pd.DataFrame) -> "pa.Table":
        from ..functions.text import _flat_lower_tokens

        flat, _, _ = _flat_lower_tokens(df[text_col].reset_index(drop=True))
        if not len(flat):
            return wschema.empty_table()
        vc = pd.Series(flat).value_counts()
        return pa.table({"word": vc.index.to_numpy(dtype=object),
                         "cnt": vc.to_numpy(dtype=np.int64)},
                        schema=wschema)

    hist_ds = (ds.map_batches(wpartial, batch_format="pandas")
               .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    if max_words is not None:
        # deterministic cap, exact via per-block top-k (post-groupby
        # blocks hold disjoint words) + one bounded driver fold
        def wtopk(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["cnt", "word"], ascending=[False, True],
                                  kind="mergesort").head(max_words)

        capped = (hist_ds.map_batches(wtopk, batch_format="pandas")
                  .to_pandas())
        capped = (capped.sort_values(["cnt", "word"],
                                     ascending=[False, True],
                                     kind="mergesort")
                  .head(max_words).reset_index(drop=True))
        hist_ds = ray.data.from_pandas(capped)
    # small-histogram fast path: when the distinct-word histogram fits
    # comfortably on the driver, the seeding pass and every EM round
    # run locally with the SAME integer kernels — int64 sums are
    # order-free, so results are bit-identical to the distributed fold
    # (parity-tested), while each of the ~10 EM/prune rounds stops
    # paying a full Ray Data job launch. Large corpora keep the
    # distributed path (the histogram is bounded by distinct words,
    # which CAN exceed driver memory at web scale) and only THEY pay
    # the EM-oriented repartition.
    hist_ds = hist_ds.materialize()
    local_cap = int(os.environ.get("RAY_GRAFT_UNIGRAM_LOCAL_WORDS",
                                   "200000"))
    if hist_ds.count() <= local_cap:
        hist_local = hist_ds.to_pandas()
    else:
        hist_local = None
        cpus = int(ray.cluster_resources().get("CPU", 4))
        hist_ds = hist_ds.repartition(max(1, cpus)).materialize()

    # 2) seed vocabulary (substring frequencies; chars force-included)
    if hist_local is not None:
        seeds = _seed_pieces_local(hist_local, max_piece_len=max_piece_len,
                                   seed_size=seed_size)
    else:
        seeds = _seed_pieces(hist_ds, max_piece_len=max_piece_len,
                             seed_size=seed_size)
    pieces = seeds["piece"].tolist()
    score = seeds["score"].to_numpy(dtype=np.float64)
    tot = float(score.sum()) or 1.0
    logp = [math.log(s / tot) if s > 0 else -1e9 for s in score]

    # 3) EM + prune rounds until the vocabulary reaches vocab_size
    q = np.zeros(len(pieces), dtype=np.int64)
    while True:
        for _ in range(em_iters):
            q = (_e_step_local(hist_local, pieces, logp, max_piece_len)
                 if hist_local is not None
                 else _e_step(hist_ds, pieces, logp, max_piece_len))
            tot_q = int(q.sum()) or 1
            logp = [math.log(v / tot_q) if v > 0 else -1e9 for v in q]
        n = len(pieces)
        if n <= vocab_size:
            break
        frame = pd.DataFrame({"piece": pieces, "q": q})
        frame = frame.sort_values(["q", "piece"], ascending=[False, True],
                                  kind="mergesort")
        is_char = frame["piece"].str.len() == 1
        chars = frame[is_char]
        multi = frame[~is_char]
        target = max(vocab_size, int(n * shrink))
        keep_multi = max(0, target - len(chars))
        kept = pd.concat([chars, multi.head(keep_multi)])
        kept = kept.sort_values(["q", "piece"], ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
        if len(kept) == n:
            # chars are never pruned, so a vocab_size below the distinct
            # character count bottoms out at the char set: done (an
            # unguarded loop would re-run EM forever)
            break
        pieces = kept["piece"].tolist()
        q = kept["q"].to_numpy(dtype=np.int64)
        tot_q = int(q.sum()) or 1
        logp = [math.log(v / tot_q) if v > 0 else -1e9 for v in q]

    out = pd.DataFrame({"piece": pieces,
                        "q_count": pd.Series(q, dtype="int64")})
    tot_q = int(out["q_count"].sum()) or 1
    out["logprob"] = [
        math.log(v / tot_q) if v > 0 else -1e9
        for v in out["q_count"]]
    return (out.sort_values(["q_count", "piece"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Viterbi encode
# ---------------------------------------------------------------------------


def _viterbi_word(word: str, vocab: dict[str, int], logp: list[float],
                  pieces: list[str], max_len: int) -> tuple:
    """Max-probability segmentation; ties break to the LONGER last piece
    (smaller back-pointer start), then the lexicographically smaller
    piece — a total order, so encoding is deterministic. Characters not
    in the vocabulary emit ``<unk>``."""
    n = len(word)
    best = [(-math.inf, -1, "")] * (n + 1)  # (score, back, piece)
    best[0] = (0.0, -1, "")
    for j in range(1, n + 1):
        cand = best[j]
        lo = max(0, j - max_len)
        for i in range(lo, j):
            si = best[i][0]
            if si == -math.inf:
                continue
            p = word[i:j]
            pid = vocab.get(p)
            if pid is None:
                # unknown single char: traversable at a floor score
                if j - i == 1:
                    s = si - 1e6
                    p = UNK
                else:
                    continue
            else:
                s = si + logp[pid]
            cur = best[j]
            if (s > cur[0]
                    or (s == cur[0] and (i < cur[1]
                                         or (i == cur[1] and p < cur[2])))):
                best[j] = (s, i, p)
    out: list[str] = []
    j = n
    while j > 0:
        _, i, p = best[j]
        out.append(p)
        j = i
    out.reverse()
    return tuple(out)


def unigram_encode_words(words, vocab_df: pd.DataFrame) -> list[tuple]:
    """Viterbi-encode an iterable of words under a trained vocabulary;
    memoized per distinct word."""
    pieces = vocab_df["piece"].tolist()
    logp = vocab_df["logprob"].tolist()
    vocab = {p: i for i, p in enumerate(pieces)}
    max_len = max((len(p) for p in pieces), default=1)
    cache: dict[str, tuple] = {}
    out = []
    for w in words:
        t = cache.get(w)
        if t is None:
            t = _viterbi_word(w, vocab, logp, pieces, max_len)
            cache[w] = t
        out.append(t)
    return out


def unigram_encode_stats(texts: pd.Series,
                         vocab_df: pd.DataFrame) -> pd.DataFrame:
    """Per-document piece counts under a trained unigram vocabulary:
    ``(n_words, n_pieces, n_chars)`` — the compression view, one
    distinct-word Viterbi pass per batch (same layout as
    ``bpe.encode_stats``)."""
    from ..functions.text import _flat_lower_tokens

    flat, doc_idx, lens = _flat_lower_tokens(texts.reset_index(drop=True))
    n = len(texts)
    n_tok = np.zeros(n, dtype=np.int64)
    if len(flat):
        pieces = vocab_df["piece"].tolist()
        logp = vocab_df["logprob"].tolist()
        vocab = {p: i for i, p in enumerate(pieces)}
        max_len = max((len(p) for p in pieces), default=1)
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        per_uniq = np.fromiter(
            (len(_viterbi_word(w, vocab, logp, pieces, max_len))
             for w in uniq),
            dtype=np.int64, count=len(uniq))
        np.add.at(n_tok, doc_idx, per_uniq[inv])
    n_chars = texts.fillna("").str.len().to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "n_words": lens.astype(np.int64),
        "n_pieces": n_tok,
        "n_chars": n_chars,
    })


def save_vocab(vocab_df: pd.DataFrame, path: str) -> None:
    """Persist a trained unigram vocabulary as a JSON artifact
    (tmp+rename, the repo's single-writer publish contract)."""
    import json
    import os

    obj = {"format": "unigram-vocab-v1",
           "pieces": [[p, int(q)] for p, q in
                      zip(vocab_df["piece"], vocab_df["q_count"])]}
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def load_vocab(path: str, obj: dict | None = None) -> pd.DataFrame:
    """Load a unigram vocabulary artifact; logprob re-derives from the
    stored exact integer counts (the same pure function of q used at
    train time)."""
    import json

    if obj is None:
        with open(path) as fh:
            obj = json.load(fh)
    if obj.get("format") != "unigram-vocab-v1":
        raise ValueError(f"not a unigram-vocab-v1 artifact: {path}")
    pieces = [x[0] for x in obj["pieces"]]
    q = [int(x[1]) for x in obj["pieces"]]
    tot = sum(q) or 1
    return pd.DataFrame({
        "piece": pd.Series(pieces, dtype=object),
        "q_count": pd.Series(q, dtype="int64"),
        "logprob": [math.log(v / tot) if v > 0 else -1e9 for v in q],
    })
