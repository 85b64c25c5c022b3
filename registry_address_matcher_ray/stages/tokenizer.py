"""Trained byte-pair-encoding tokenizer (Sennrich et al. 2016) — the real
merge-table upgrade over ``functions/textfns.bpe_token_count``'s regex
heuristic. Token-budget sharding and token accounting in a training-data
pipeline should measure the tokens the model will actually see.

Distributed shape (the standard one — HF/``sentencepiece`` train the same
way over aggregated counts):

1. ``bpe_train``: ONE distributed word-frequency aggregate (per-batch
   ``Counter`` partials -> ``groupby(word).sum``), then the vocabulary is
   BOUNDED to the top ``max_words`` by (count desc, word asc) — a
   deterministic distributed sort+limit whose truncation is logged — and the
   classic merge loop runs on the DRIVER over that word-frequency table
   (cost: ``num_merges`` x vocab symbols; never row-level data). Pair-count
   ties break (count desc, pair asc) so training is bit-deterministic.
2. ``bpe_token_counts``: the learned merge ranks ship once via ``ray.put``;
   each worker caches the rank dict AND a word -> n_pieces memo (web text is
   Zipfian — most words repeat), applying the greedy lowest-rank merge rule
   (the GPT-2 encoder loop) per DISTINCT word per batch.

SQL cannot express the merge fixpoint, so the trained-BPE operators are
pytest-gated (parity with an independent sequential implementation) rather
than DuckDB-oracled; the whitespace ``token_shards`` oracle stays exact.
"""

from __future__ import annotations

import logging
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = ["bpe_train", "bpe_token_counts", "bpe_learn_from_freqs",
           "bpe_word_pieces"]

_END = "</w>"


def bpe_learn_from_freqs(
    word_freqs: Dict[str, int], num_merges: int,
) -> List[Tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table (pure kernel,
    driver-side). Each word is a symbol sequence ``chars + [</w>]``; per
    round the most frequent adjacent pair merges (ties: count desc, pair
    asc). Stops early when no pair repeats."""
    vocab: Dict[Tuple[str, ...], int] = {
        tuple(w) + (_END,): c for w, c in word_freqs.items() if w
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best, best_n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def bpe_word_pieces(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Greedy lowest-rank merge encoding of one word (the GPT-2 loop)."""
    sym: List[str] = list(word) + [_END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _words(text: str) -> List[str]:
    return [w for w in (text or "").lower().split() if w]


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> dict:
    """Train a BPE merge table over the corpus (lowercased whitespace
    pre-tokenization). Returns ``{"merges": [(a, b), ...], "n_words":
    distinct words counted, "truncated": bool}``."""
    from ray.data.aggregate import Sum

    def _wf(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_words(t))
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    wf = (ds.select_columns([text_col])
          .map_batches(_wf, batch_format="pyarrow")
          .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    n_words = wf.count()
    truncated = n_words > max_words
    if truncated:
        logging.getLogger(__name__).warning(
            "bpe_train: vocabulary bounded to top %d of %d distinct words",
            max_words, n_words)
        wf = wf.sort(["cnt", "word"], descending=[True, False]).limit(max_words)
    freqs = {r["word"]: int(r["cnt"])
             for b in wf.iter_batches(batch_format="pandas")
             for r in b.to_dict("records")}
    merges = bpe_learn_from_freqs(freqs, num_merges)
    return {"merges": merges, "n_words": n_words, "truncated": truncated}


class _BpeCounter:
    """Actor-pool counting stage: merge ranks resolved once per actor, plus a
    word -> piece-count memo that persists across batches (Zipf reuse)."""

    def __init__(self, ranks_ref, text_col: str, id_col: str,
                 out_col: str = "n_bpe_tokens", append: bool = False):
        self._ranks: Dict[Tuple[str, str], int] = ray.get(ranks_ref)
        self._memo: Dict[str, int] = {}
        self._text_col = text_col
        self._id_col = id_col
        self._out_col = out_col
        self._append = append

    def __call__(self, batch: pa.Table) -> pa.Table:
        memo, ranks = self._memo, self._ranks
        out = np.zeros(batch.num_rows, np.int64)
        for i, t in enumerate(batch.column(self._text_col).to_pylist()):
            n = 0
            for w in _words(t):
                k = memo.get(w)
                if k is None:
                    k = memo[w] = len(bpe_word_pieces(w, ranks))
                n += k
            out[i] = n
        col = pa.array(out, pa.int64())
        if self._append:
            return batch.append_column(self._out_col, col)
        return pa.table({
            self._id_col: batch.column(self._id_col),
            self._out_col: col,
        })


def bpe_token_counts(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    merges: Sequence[Tuple[str, str]],
    batch_size: int = 256,
    concurrency=(1, 8),
    out_col: str = "n_bpe_tokens",
    append: bool = False,
) -> ray.data.Dataset:
    """Per-doc trained-BPE token counts: ``(id_col, out_col)``; with
    ``append=True`` the count column is appended to the full input batch
    instead (payload columns ride through — the training-prep packing
    path, which needs text + counts in one stream)."""
    ranks_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})
    src = ds if append else ds.select_columns([id_col, text_col])
    # max_restarts=0: constructor args live in the object store (ray#53727,
    # same note as stages/multimodal._pool) — Dataset task retries recover.
    return src.map_batches(
        _BpeCounter, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"ranks_ref": ranks_ref, "text_col": text_col,
                               "id_col": id_col, "out_col": out_col,
                               "append": append},
        max_restarts=0, max_task_retries=0,
    )
