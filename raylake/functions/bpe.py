"""BPE tokenizer-training kernels: greedy merge application + a
single-process reference trainer.

A BPE training iteration is (1) count adjacent-token pairs over the
current tokenization, (2) pick the most frequent pair (ties: lowest
left, then lowest right token), (3) rewrite every non-overlapping
occurrence left-to-right into the concatenated symbol, (4) repeat. The
reference's tokenizer is an external library
(/root/reference/src/model/run_pipeline.py:20 uses a pre-trained
vectorizer); this module implements the training loop itself so the
engine can LEARN a merge table over a distributed corpus — see
queries.q_bpe_train for the Ray plan.

The only sequential subtlety is overlap resolution: in "a a a a" with
merge (a, a), greedy left-to-right keeps candidate positions 0 and 2,
not 1. Consecutive candidate positions can only occur when left ==
right (t[i+1] would have to be both right and left otherwise), so the
vectorized form resolves runs by even-offset parity — exactly the
scan-and-skip semantics of `bpe_train_reference`, fuzz-tested against
it in tests/test_bpe_train.py.
"""

from __future__ import annotations

import numpy as np


def merge_once(toks: np.ndarray, doc_idx: np.ndarray, left: str, right: str):
    """Apply ONE merge rule to a flattened token array (object dtype)
    with per-token doc ids; returns the rewritten (toks, doc_idx). Pairs
    never cross document boundaries. Vectorized: candidate mask, run-
    parity overlap resolution, one np.delete."""
    if len(toks) < 2:
        return toks, doc_idx
    cand = ((toks[:-1] == left) & (toks[1:] == right)
            & (doc_idx[:-1] == doc_idx[1:]))
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return toks, doc_idx
    if left == right:
        # runs of consecutive candidates: greedy keeps even offsets
        run_start = np.ones(len(idx), bool)
        run_start[1:] = idx[1:] != idx[:-1] + 1
        run_id = np.cumsum(run_start) - 1
        run_head = idx[run_start]
        idx = idx[((idx - run_head[run_id]) % 2) == 0]
    toks = toks.copy()
    toks[idx] = left + right
    return np.delete(toks, idx + 1), np.delete(doc_idx, idx + 1)


def apply_merges(toks: np.ndarray, doc_idx: np.ndarray, merges) -> tuple:
    """Apply an ordered merge list (the rules learned so far). Applying
    rules in learned order to the raw tokenization reproduces the
    training-time state without materializing intermediate corpora."""
    for left, right in merges:
        toks, doc_idx = merge_once(toks, doc_idx, left, right)
    return toks, doc_idx


def pair_counts(toks: np.ndarray, doc_idx: np.ndarray) -> dict:
    """{(left, right): count} over adjacent same-doc pairs — the exact
    histogram the distributed partials must sum to."""
    out: dict = {}
    ok = np.flatnonzero(doc_idx[:-1] == doc_idx[1:]) if len(toks) > 1 else []
    for i in ok:
        k = (toks[i], toks[i + 1])
        out[k] = out.get(k, 0) + 1
    return out


def bpe_train_reference(texts, n_merges: int):
    """Single-process reference trainer (the golden): whitespace-split
    each text (NULL/None contributes no tokens, matching
    queries._tokens_and_counts), then n_merges iterations of
    count → argmax (n DESC, left ASC, right ASC) → scan-and-skip greedy
    rewrite. Returns [(rank, left, right, n), ...]; stops early when no
    pair remains."""
    docs = [t.split(" ") for t in texts if t is not None]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for d in docs:
            for i in range(len(d) - 1):
                k = (d[i], d[i + 1])
                counts[k] = counts.get(k, 0) + 1
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, n))
        new_docs = []
        for d in docs:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == left and d[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    return merges
