"""bpe_train golden: the distributed BPE training loop must learn the
EXACT merge table the single-process reference trainer learns — same
pairs, same order, same counts — on the real documents table, on fuzzed
corpora (including the left==right run-overlap case), and with the
driver-fold cap forced to zero so the distributed groupby election path
is exercised too."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import raylake.pipelines.queries as Q
from raylake.functions.bpe import (apply_merges, bpe_train_reference,
                                   merge_once, pair_counts)

SF_DIR = "/root/testdata/sf0.001"


def _reference_frame(texts, k):
    ref = bpe_train_reference(texts, k)
    return pd.DataFrame(ref, columns=["rank", "left_tok", "right_tok", "n"])


def test_bpe_train_matches_reference_on_documents(ray_session):
    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    want = _reference_frame(texts, Q._BPE_TRAIN_MERGES)
    got = Q.q_bpe_train(SF_DIR)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    assert len(got) == Q._BPE_TRAIN_MERGES  # corpus is rich enough


def test_bpe_train_distributed_election_branch(ray_session, monkeypatch, tmp_path):
    """Cap to 0: every iteration elects the argmax through the Ray
    groupby + sort + limit(1) path instead of the driver fold."""
    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"])["text"].to_pylist()[:100]
    sub = tmp_path / "sub"
    sub.mkdir()
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").slice(0, 100)
    pq.write_table(tbl, sub / "documents.parquet")
    monkeypatch.setattr(Q, "_VERIFY_BCAST_BYTES", 0)
    got = Q.q_bpe_train(str(sub))
    want = _reference_frame(texts, Q._BPE_TRAIN_MERGES)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)


# small alphabet forces repeated tokens, runs, and count ties
_DOC = st.lists(st.sampled_from(["a", "b", "ab", "aa", ""]),
                min_size=0, max_size=12)


@settings(max_examples=30, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8), st.integers(1, 5))
def test_merge_kernels_match_reference_scan(docs, k):
    """The vectorized run-parity rewrite == the scan-and-skip reference,
    iteration by iteration, on adversarial corpora (left==right runs,
    empty tokens from double spaces, empty docs)."""
    texts = [" ".join(d) for d in docs]
    ref = bpe_train_reference(texts, k)

    # replay the reference's learned rules through the numpy kernel and
    # compare the resulting pair histogram at every step
    toks = np.array([t for d in texts for t in d.split(" ")], dtype=object)
    doc_idx = np.repeat(np.arange(len(texts)),
                        [len(d.split(" ")) for d in texts])
    state = [d.split(" ") for d in texts]
    for _, left, right, _n in ref:
        toks, doc_idx = merge_once(toks, doc_idx, left, right)
        new_state = []
        for d in state:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == left and d[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_state.append(out)
        state = new_state
        flat = [t for d in state for t in d]
        assert list(toks) == flat
        want_counts = {}
        for d in state:
            for i in range(len(d) - 1):
                want_counts[(d[i], d[i + 1])] = \
                    want_counts.get((d[i], d[i + 1]), 0) + 1
        assert pair_counts(toks, doc_idx) == want_counts


def test_apply_merges_replays_in_order():
    toks = np.array(["a", "a", "a", "b"], dtype=object)
    doc_idx = np.zeros(4, dtype=np.int64)
    out, _ = apply_merges(toks, doc_idx, [("a", "a"), ("aa", "a")])
    assert list(out) == ["aaa", "b"]
