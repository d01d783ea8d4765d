"""Property test for the exact n-gram Jaccard self-join: the prefix-filter
candidate generation (Bayardo et al. WWW'07 bound, see
raylake/pipelines/queries.py::q_jaccard_neardup) must lose NO qualifying
pair — the query output over a random near-dup-heavy corpus must equal the
brute-force all-pairs Jaccard ≥ 0.5 set exactly, including duplicate and
empty documents."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylake.functions.dedup import jaccard
from raylake.pipelines.queries import QUERIES


def _corpus(seed: int, n_docs: int = 40, vocab: int = 60,
            doc_len: int = 30) -> list[str]:
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i}" for i in range(vocab)])
    base = rng.choice(words, doc_len).tolist()
    docs = []
    for i in range(n_docs):
        mode = i % 4
        if mode == 0:  # unrelated
            docs.append(" ".join(rng.choice(words, doc_len)))
        elif mode == 1:  # near-dup of base: mutate 0-5 positions
            d = list(base)
            k = int(rng.integers(0, 6))
            for j in rng.choice(doc_len, k, replace=False):
                d[j] = words[rng.integers(vocab)]
            docs.append(" ".join(d))
        elif mode == 2:  # exact dup of base
            docs.append(" ".join(base))
        else:  # short doc (gram count < shingle edge)
            docs.append(" ".join(rng.choice(words, int(rng.integers(1, 8)))))
    docs[0] = ""  # empty-doc edge: single hash-of-"" gram
    return docs


@pytest.mark.parametrize("seed", [7, 19])
def test_prefix_filter_matches_bruteforce(tmp_path, ray_session, seed):
    docs = _corpus(seed)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    got = (QUERIES["jaccard_neardup"](str(tmp_path)).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    rows = [(a, b, jaccard(docs[a], docs[b], shingle=3))
            for a in range(len(docs)) for b in range(a + 1, len(docs))
            if jaccard(docs[a], docs[b], shingle=3) >= 0.5]
    want = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    # the corpus must actually exercise near-dup (not just exact-dup) pairs
    assert (want["jaccard"] < 1.0).any() and (want["jaccard"] == 1.0).any()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
