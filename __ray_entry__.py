"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing in
here (or in raylake) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship lakehouse maintenance pipeline at sf0.001:
                      build transcript table → compact → zorder → MERGE late
                      turns → return the post-maintenance scan.
- ``queries()``     — one entry per implemented operator/pipeline
                      (SURVEY.md §2 + training-data additions), each taking
                      ``sf_dir``.
- ``oracle_sql()``  — DuckDB-equivalent SQL for every SQL-expressible query
                      (all but six of the catalog — including the maintenance
                      pipeline itself via ``maintained_scan``/
                      ``mor_delete_scan``, the full-LSH transcriptions of
                      minhash/simhash near-dup, a recursive-CTE oracle for
                      near-dup connected components, the shallow-clone
                      divergence scan ``table_clone``, the change-data-feed
                      reconstruction ``cdc_feed``, and the streaming-dedup
                      replay ``stream_dedup``); rows-only:
                      ``ann_ivf``/``ann_ivf_pq`` (probabilistic probing),
                      ``logreg_train`` (iterative training; exact
                      single-process-equivalence pytest golden),
                      ``model_promote`` (registry state; alias-transition
                      replay golden in tests/test_model_registry.py),
                      ``bpe_train`` (iterative greedy retokenization;
                      exact reference-trainer golden in
                      tests/test_bpe_train.py) and the fixture-input
                      ``transcript_maintenance`` — each carries a pytest
                      golden check instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    import ray.data

    from raylake.pipelines.queries import q_transcript_maintenance

    result = q_transcript_maintenance("/root/testdata/sf0.001")
    return ray.data.from_arrow(result)


def queries() -> dict[str, Callable[[str], Any]]:
    from raylake.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raylake.pipelines.queries import ORACLES

    return dict(ORACLES)
