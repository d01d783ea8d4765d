"""Text-analysis operators for large-scale training-data pipelines.

All kernels are vectorized (pandas str / numpy) or bounded per-batch loops
for crypto hashes, designed to run inside `ds.map_batches`. The stateful
ones (compiled regexes, stopword profiles) are callable CLASSES — actor
pools per the ST1 pattern (ref model-cache analogue: src/serving/api.py:23-72).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Minimal per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic and dependency-free (no fasttext in this sandbox).
STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "für"},
    "es": {"el", "la", "de", "y", "es", "un", "una", "en", "que", "por"},
    "fr": {"le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "就", "不", "人"},
}

_BPE_ISH = re.compile(r"\w+|[^\w\s]")  # word or single punctuation mark
_WORD = re.compile(r"\w+", re.UNICODE)


def token_count_ws(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count, vectorized: #separators + 1 (single-space text)."""
    n = pc.add(pc.count_substring(batch[text_col], " "), 1)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def token_count_bpe(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """BPE-ish token estimate: words + punctuation marks (compiled regex)."""
    batch["n_bpe_tokens"] = (
        batch[text_col].str.findall(_BPE_ISH).str.len().astype("int64")
    )
    return batch


def doc_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic document fingerprint: md5 of lowercased text.
    (Crypto hash has no Arrow kernel; the loop is per batch, not per dataset.)"""
    low = pc.utf8_lower(batch[text_col])
    fps = pa.array(
        [hashlib.md5(s.encode()).hexdigest() for s in low.to_pylist()],
        type=pa.string(),
    )
    return batch.append_column("fingerprint", fps)


def rolling_hash_fingerprint(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Polynomial rolling hash over character windows, combined by min —
    a cheap shift-robust document fingerprint (winnowing-style)."""
    if len(text) < window:
        text = text.ljust(window, "\x00")
    base = 257
    h = 0
    pw = pow(base, window - 1, mod)
    best = mod
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= window - 1:
            best = min(best, h)
            h = (h - ord(text[i - window + 1]) * pw) % mod
    return best


class QualityScorer:
    """Per-document quality features: length, punctuation/upper/digit/stopword
    ratios, mean token length. Actor-pool stage: regexes compiled once."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.punct = re.compile(r"[^\w\s]")
        self.all_stop = set().union(*STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col]
        n_chars = s.str.len()
        toks = s.str.split(" ")
        n_tokens = toks.str.len().clip(lower=1)
        batch["n_chars"] = n_chars.astype("int64")
        batch["n_punct"] = s.str.count(self.punct).astype("int64")
        batch["n_tokens"] = n_tokens.astype("int64")
        stop = self.all_stop
        # integer counts, not ratios: exact under any engine's rounding mode
        # (banker's vs half-away ties on rationals like 4.28125 are real);
        # consumers derive stop_ratio = n_stopwords / n_tokens themselves.
        batch["n_stopwords"] = toks.map(
            lambda ws: sum(w in stop for w in ws)
        ).astype("int64")
        batch["sum_token_len"] = toks.map(
            lambda ws: sum(len(w) for w in ws)
        ).astype("int64")
        batch["stop_ratio"] = batch["n_stopwords"] / n_tokens
        batch["mean_token_len"] = batch["sum_token_len"] / n_tokens
        return batch


def word_ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct lowercase whitespace word n-grams (contamination unit)."""
    ws = text.lower().split(" ")
    if len(ws) < n:
        return set()
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


class ContaminationFlagger:
    """Benchmark-contamination detector (the decontamination pass every
    training-data pipeline runs before a benchmark release): flags documents
    sharing ≥1 word n-gram with a broadcast benchmark n-gram set. Actor-pool
    stage (ST1): the benchmark set is fetched from the object store ONCE per
    actor in __init__, never re-shipped per batch."""

    def __init__(self, bench_ref, n: int = 3, text_col: str = "text"):
        import ray

        self.bench = (ray.get(bench_ref)
                      if not isinstance(bench_ref, (set, frozenset))
                      else bench_ref)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        shared = [
            len(word_ngrams(t, self.n) & self.bench)
            for t in batch[self.text_col]
        ]
        batch["n_shared"] = pd.Series(shared, index=batch.index,
                                      dtype="int64")
        batch["contaminated"] = batch["n_shared"] > 0
        return batch


class LangId:
    """Stopword-profile language ID (n-gram heuristic tier). Deterministic:
    argmax of per-language stopword hits, ties broken by language code order,
    'und' (undetermined) when no profile hits."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = _WORD
        self.profiles = sorted(STOPWORDS.items())  # deterministic order

    def _predict(self, text: str) -> str:
        words = set(self.word.findall(text.lower()))
        best_lang, best_hits = "und", 0
        for lang, stops in self.profiles:
            hits = len(words & stops)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["pred_lang"] = batch[self.text_col].map(self._predict)
        return batch
